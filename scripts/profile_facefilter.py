"""Dev harness: fine-grained timing of the face-filter + cleanup stages.

Runs grid-fill + marching once (cached sphere-fit decoder), then times each
sub-step of filter_faces_by_udf and the cleanup passes individually.
"""

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
    ap.add_argument("--resolution", type=int, default=512)
    args = ap.parse_args()

    from surfd_tpu.models import CbnDecoder, CoordsEncoder
    from surfd_tpu.pipelines import MeshExtractionConfig, make_udf_fn
    from surfd_tpu.pipelines.generate import filter_faces_by_udf
    from surfd_tpu.geometry import (
        GridFiller, Mesh, eval_in_chunks, marching_tetrahedra_udf,
        merge_duplicate_vertices, remove_unreferenced_vertices, smooth_borders,
        stabilize,
    )
    from surfd_tpu import native
    from bench import fit_decoder_to_sphere

    L = 32
    decoder = CbnDecoder(latent_dim=L, hidden_dim=512, num_hidden_layers=5)
    ce = CoordsEncoder()
    latent = jnp.full((1, L), 0.1, jnp.float32)

    if CACHE.exists():
        dvars = pickle.loads(CACHE.read_bytes())
        dvars = jax.tree.map(jnp.asarray, dvars)
        print("loaded cached decoder fit", file=sys.stderr)
    else:
        t = time.perf_counter()
        dvars = fit_decoder_to_sphere(decoder, ce, latent, steps=3000)
        print(f"fit: {time.perf_counter()-t:.1f}s", file=sys.stderr)
        CACHE.write_bytes(pickle.dumps(jax.tree.map(np.asarray, dvars)))

    udf_fn = make_udf_fn(decoder, dvars, latent[0])
    cfg = MeshExtractionConfig(resolution=args.resolution)

    def log(name, t0):
        dt = time.perf_counter() - t0
        print(f"  {name:28s} {dt:7.3f}s", file=sys.stderr)
        return time.perf_counter()

    # --- grid fill + marching (warm both paths first at low res) ---
    R = args.resolution
    gf = GridFiller(R, max_batch=cfg.max_batch, max_dist=cfg.max_dist)
    t0 = time.perf_counter()
    grid = gf.fill(udf_fn)
    t0 = log("grid_fill(warm?)", t0)
    grad_fn = udf_fn.grad_i8_fn
    grad_at = lambda pts: eval_in_chunks(grad_fn, pts, cfg.max_batch)
    times = {}
    mesh = marching_tetrahedra_udf(grid, grad_at, times=times)
    t0 = log(f"marching {times}", t0)
    print(f"  raw: verts {len(mesh.vertices)} faces {len(mesh.faces)}", file=sys.stderr)

    # --- face filter, sub-timed (mirrors filter_faces_by_udf) ---
    threshold = cfg.face_filter_mult / cfg.resolution
    for trial in range(2):
        print(f"--- face filter trial {trial} ---", file=sys.stderr)
        v, f = mesh.vertices, mesh.faces
        t0 = time.perf_counter()
        ea_all = np.concatenate([f[:, 0], f[:, 1], f[:, 2]])
        eb_all = np.concatenate([f[:, 1], f[:, 2], f[:, 0]])
        lo_ = np.minimum(ea_all, eb_all)
        hi_ = np.maximum(ea_all, eb_all)
        NV = len(v) + 1
        keys = lo_ * NV + hi_
        t0 = log("build keys", t0)
        uniq, inv = native.unique_inverse_i64(keys)
        t0 = log(f"unique ({len(keys)}->{len(uniq)})", t0)
        ea = (uniq // NV).astype(np.int64)
        eb = (uniq % NV).astype(np.int64)
        mids = 0.5 * (v[ea] + v[eb])
        pts = np.concatenate([v, mids], axis=0).astype(np.float32)
        t0 = log(f"midpoints+concat ({len(pts)} pts)", t0)
        ok = eval_in_chunks(udf_fn.below_bound(threshold), pts, cfg.max_batch).astype(bool)
        t0 = log("device eval (below)", t0)
        vert_ok = ok[: len(v)]
        mid_ok = ok[len(v):][inv].reshape(3, -1)
        keep = vert_ok[f].all(axis=1) & mid_ok.all(axis=0)
        fmesh = Mesh(v, f[keep])
        t0 = log(f"gather+mask (keep {keep.sum()})", t0)
        fmesh = remove_unreferenced_vertices(fmesh)
        t0 = log("remove_unreferenced", t0)

    # --- cleanup, sub-timed ---
    print("--- cleanup ---", file=sys.stderr)
    t0 = time.perf_counter()
    m2 = stabilize(fmesh, assume_clean=True)
    t0 = log("stabilize", t0)
    m2 = smooth_borders(m2, iterations=20, lam=0.3)
    t0 = log("smooth_borders", t0)
    m2 = merge_duplicate_vertices(m2)
    t0 = log("merge_duplicate_vertices", t0)
    print(f"final verts {len(m2.vertices)} faces {len(m2.faces)}", file=sys.stderr)


if __name__ == "__main__":
    main()
