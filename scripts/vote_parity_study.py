"""Noise study: crossing-parity sign recovery vs the reference's gradient
vote (VERDICT r2 next #2). Produces the PARITY.md table.

Both schemes feed the SAME MT triangulation (geometry/vote_signs.py), so the
numbers isolate the sign-assignment rule. Gradient noise is a unit-vector
perturbation sigma ~= tan(angular error); a trained CBN decoder's direction
error near the surface is ~5-15 deg (sigma 0.1-0.3). UDF value noise is
relative (decoder UDFs carry ~voxel-scale error).

Usage:
  python scripts/vote_parity_study.py [--res 96] [--decoder PATH.npz]
  python scripts/vote_parity_study.py --ae_dir RUN --data_root CORPUS \
      [--ae_res 64,128] [--ae_items sphere_120,torus_121,sheet_122]

--decoder: bench.py's sphere-fitted CBN decoder cache; when given, the study
also compares both schemes on that REAL decoder field + autodiff gradients
(the bench's production path) vs the analytic sphere.

--ae_dir (VERDICT r3 next #5): a trained cli/train_ae run dir. For each test
item, the point cloud is encoded by the TRAINED DGCNN, the TRAINED CBN
decoder's UDF + autodiff-gradient grids are evaluated at each --ae_res, and
both sign schemes run on those real fields — ground truth is the item's own
stored surface samples (pcd). This replaces the analytic+synthetic-noise
extrapolation with measured trained-field divergence.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from surfd_tpu.geometry.analytic import sheet_fields, sphere_fields, torus_fields
from surfd_tpu.geometry.marching import marching_tetrahedra_udf
from surfd_tpu.geometry.metrics import chamfer_distance
from surfd_tpu.geometry.vote_signs import marching_tetrahedra_vote


def rms(a, b):
    return np.sqrt(chamfer_distance(a, b) / 2.0)


def noisy_unit(grad, sigma, rng):
    g = grad + sigma * rng.standard_normal(grad.shape).astype(np.float32)
    return g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)


def compare(name, udf, grad_away, sample, R, rows, *, tag=""):
    voxel = 2.0 / (R - 1)
    m_p = marching_tetrahedra_udf(udf, grad_away, use_native=False)
    m_v = marching_tetrahedra_vote(udf, -grad_away)
    true_pts = sample(30000, np.random.default_rng(1))
    r_p, r_v = rms(m_p.vertices, true_pts) / voxel, rms(m_v.vertices, true_pts) / voxel
    r_pv = rms(m_p.vertices, m_v.vertices) / voxel
    rows.append((f"{name}{tag}", R, r_p, r_v, r_pv,
                 len(m_p.faces), len(m_v.faces)))
    print(f"{name}{tag:16s} R={R}  parity {r_p:.3f} vox | vote {r_v:.3f} vox | "
          f"p↔v {r_pv:.3f} vox | faces {len(m_p.faces)}/{len(m_v.faces)}",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--decoder", default="")
    ap.add_argument("--ae_dir", default="")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--ae_res", default="64,128")
    ap.add_argument("--ae_items", default="sphere_120,torus_121,sheet_122")
    ap.add_argument("--analytic", action="store_true",
                    help="run the analytic+noise sweep even with --ae_dir")
    ap.add_argument("--udf-noise", type=float, default=0.25,
                    help="relative UDF noise level for the value-noise rows")
    args = ap.parse_args()
    R = args.res
    rng = np.random.default_rng(0)
    rows = []

    for name, make in ([] if (args.ae_dir and not args.analytic) else
                       [("sphere", sphere_fields), ("torus", torus_fields),
                        ("open_sheet", sheet_fields)]):
        _, udf, grad, sample = make(R)
        for sigma in (0.0, 0.1, 0.25, 0.5):
            g = grad if sigma == 0 else noisy_unit(grad, sigma, rng)
            compare(name, udf, g, sample, R, rows, tag=f" σg={sigma}")
        # value noise on top of moderate gradient noise
        voxel = 2.0 / (R - 1)
        u_noisy = np.clip(
            udf * (1 + args.udf_noise * rng.standard_normal(udf.shape).astype(np.float32) * 0.2)
            + 0.2 * voxel * rng.standard_normal(udf.shape).astype(np.float32),
            0.0, None,
        ).astype(np.float32)
        compare(name, u_noisy, noisy_unit(grad, 0.25, rng), sample, R, rows,
                tag=" σg=0.25+udfN")

    if args.decoder:
        import flax
        import jax
        import jax.numpy as jnp

        from surfd_tpu.models import CbnDecoder, CoordsEncoder

        with open(args.decoder, "rb") as fh:
            dvars = flax.serialization.msgpack_restore(fh.read())
        dvars = jax.tree.map(jnp.asarray, dvars)
        L = dvars["params"]["film_blocks_0"]["cbn1"]["latent_proj"]["kernel"].shape[0] \
            if "film_blocks_0" in dvars["params"] else 32
        decoder = CbnDecoder(latent_dim=L, hidden_dim=512, num_hidden_layers=5)
        ce = CoordsEncoder()
        latent = jnp.full((1, L), 0.1, jnp.float32)
        xs = np.linspace(-1, 1, R, dtype=np.float32)
        pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)

        @jax.jit
        def udf_and_grad(q):
            def f(p):
                lg = decoder.apply(dvars, ce.encode(p[None, None]), latent)
                return (1.0 - jax.nn.sigmoid(lg[0, 0])) * 0.1

            return jax.vmap(jax.value_and_grad(f))(q)

        udf_l, grad_l = [], []
        for i in range(0, len(pts), 65536):
            u, g = udf_and_grad(jnp.asarray(pts[i:i + 65536]))
            udf_l.append(np.asarray(u))
            grad_l.append(np.asarray(g))
        udf_d = np.concatenate(udf_l).reshape(R, R, R).astype(np.float32)
        grad_d = np.concatenate(grad_l).reshape(R, R, R, 3)
        grad_d /= np.maximum(np.linalg.norm(grad_d, axis=-1, keepdims=True), 1e-9)
        grad_d = grad_d.astype(np.float32)
        _, _, _, sample = sphere_fields(R)
        compare("bench_decoder_sphere", udf_d, grad_d, sample, R, rows)

    if args.ae_dir:
        import json
        import os

        import jax
        import jax.numpy as jnp

        from surfd_tpu.models import CbnDecoder, CoordsEncoder, Dgcnn
        from surfd_tpu.utils.checkpoint import load_params_npz

        with open(os.path.join(args.ae_dir, "args.json")) as fh:
            targs = json.load(fh)
        L = targs["latent_size"]
        n_pcd = targs.get("num_points_pcd", 10_000)
        max_dist = targs.get("max_dist", 0.1)

        encoder = Dgcnn(size_latent=L)
        enc_vars = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, n_pcd, 3)))
        enc_vars = load_params_npz(os.path.join(args.ae_dir, "ae_encoder.npz"), enc_vars)
        decoder = CbnDecoder(
            latent_dim=L,
            hidden_dim=targs.get("hidden_dim", 512),
            num_hidden_layers=targs.get("num_hidden_layers", 5),
        )
        ce = CoordsEncoder()
        dec_vars = decoder.init(
            jax.random.PRNGKey(1), ce.encode(jnp.zeros((1, 8, 3))), jnp.zeros((1, L))
        )
        dec_vars = load_params_npz(os.path.join(args.ae_dir, "ae_decoder.npz"), dec_vars)
        encode = jax.jit(lambda pcd: encoder.apply(enc_vars, pcd, train=False))

        @jax.jit
        def udf_and_grad(latent, q):
            # production field: f32 decoder.apply + autodiff gradient — the
            # same UDF/∂UDF the extraction pipeline's mt_grads pass consumes
            def f(p):
                lg = decoder.apply(dec_vars, ce.encode(p[None, None]), latent)
                return (1.0 - jax.nn.sigmoid(lg[0, 0])) * max_dist

            return jax.vmap(jax.value_and_grad(f))(q)

        for item in args.ae_items.split(","):
            path = os.path.join(args.data_root, "test", item + ".npz")
            d = np.load(path)
            pcd = d["pcd"]
            sub = pcd[np.random.default_rng(0).choice(len(pcd), n_pcd, replace=False)]
            latent = encode(jnp.asarray(sub[None]))
            sample = lambda n, rng, _p=pcd: _p[rng.choice(len(_p), n, replace=False)]
            for R in [int(r) for r in args.ae_res.split(",")]:
                xs = np.linspace(-1, 1, R, dtype=np.float32)
                pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
                udf_l, grad_l = [], []
                for i in range(0, len(pts), 65536):
                    q = np.zeros((65536, 3), np.float32)
                    chunk = pts[i:i + 65536]
                    q[: len(chunk)] = chunk
                    u, g = udf_and_grad(latent, jnp.asarray(q))
                    udf_l.append(np.asarray(u)[: len(chunk)])
                    grad_l.append(np.asarray(g)[: len(chunk)])
                udf_d = np.concatenate(udf_l).reshape(R, R, R).astype(np.float32)
                grad_d = np.concatenate(grad_l).reshape(R, R, R, 3)
                grad_d /= np.maximum(np.linalg.norm(grad_d, axis=-1, keepdims=True), 1e-9)
                compare(f"trained_{item}", udf_d, grad_d.astype(np.float32),
                        sample, R, rows)

    print("\n| field | R | parity RMS (vox) | vote RMS (vox) | parity↔vote (vox) | faces p/v |")
    print("|---|---|---|---|---|---|")
    for name, r, rp, rv, rpv, fp, fv in rows:
        print(f"| {name} | {r} | {rp:.3f} | {rv:.3f} | {rpv:.3f} | {fp}/{fv} |")


if __name__ == "__main__":
    main()
