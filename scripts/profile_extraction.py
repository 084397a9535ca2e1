"""Dev harness: profile the latent→mesh extraction path with a cached fitted
decoder (so repeated runs skip the fit). Not part of the test suite."""

import argparse
import pickle
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/surfd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).parent.parent))

CACHE = Path("/tmp/surfd_fit_cache.pkl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--fit-steps", type=int, default=3000)
    ap.add_argument("--refit", action="store_true")
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    from surfd_tpu.models import CbnDecoder, CoordsEncoder
    from surfd_tpu.pipelines import MeshExtractionConfig, get_mesh_from_udf, make_udf_fn
    from bench import fit_decoder_to_sphere

    L = 32
    decoder = CbnDecoder(latent_dim=L, hidden_dim=512, num_hidden_layers=5)
    ce = CoordsEncoder()
    latent = jnp.full((1, L), 0.1, jnp.float32)

    if CACHE.exists() and not args.refit:
        dvars = pickle.loads(CACHE.read_bytes())
        dvars = jax.tree.map(jnp.asarray, dvars)
        print("loaded cached decoder fit", file=sys.stderr)
    else:
        t = time.perf_counter()
        dvars = fit_decoder_to_sphere(decoder, ce, latent, steps=args.fit_steps)
        print(f"fit: {time.perf_counter()-t:.1f}s", file=sys.stderr)
        CACHE.write_bytes(pickle.dumps(jax.tree.map(np.asarray, dvars)))

    udf_fn = make_udf_fn(decoder, dvars, latent[0])
    cfg = MeshExtractionConfig(resolution=args.resolution)

    # warm
    t = time.perf_counter()
    mesh, stats = get_mesh_from_udf(udf_fn, cfg=cfg, return_stats=True)
    print(f"cold: {time.perf_counter()-t:.2f}s  {stats['times']}", file=sys.stderr)

    t = time.perf_counter()
    mesh, stats = get_mesh_from_udf(udf_fn, cfg=cfg, return_stats=True)
    total = time.perf_counter() - t
    print(
        f"warm: {total:.2f}s  {stats['times']}\n"
        f"raw_faces {stats['raw_faces']} final {stats['final_faces']} "
        f"verts {len(mesh.vertices)} active {stats['active_blocks']}/{stats['total_blocks']} "
        f"fine {stats['fine_points']/1e6:.1f}M",
        file=sys.stderr,
    )

    if args.cprofile:
        import cProfile, pstats

        pr = cProfile.Profile()
        pr.enable()
        get_mesh_from_udf(udf_fn, cfg=cfg)
        pr.disable()
        pstats.Stats(pr, stream=sys.stderr).sort_stats("tottime").print_stats(20)


if __name__ == "__main__":
    main()
