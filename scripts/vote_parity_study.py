"""Noise study: crossing-parity sign recovery vs the reference's gradient
vote (VERDICT r2 next #2). Produces the PARITY.md table.

Both schemes feed the SAME MT triangulation (geometry/vote_signs.py), so the
numbers isolate the sign-assignment rule. Gradient noise is a unit-vector
perturbation sigma ~= tan(angular error); a trained CBN decoder's direction
error near the surface is ~5-15 deg (sigma 0.1-0.3). UDF value noise is
relative (decoder UDFs carry ~voxel-scale error).

Usage:
  python scripts/vote_parity_study.py [--res 96] [--decoder PATH.npz]

--decoder: bench.py's sphere-fitted CBN decoder cache; when given, the study
also compares both schemes on that REAL decoder field + autodiff gradients
(the bench's production path) vs the analytic sphere.
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
    ap.add_argument("--udf-noise", type=float, default=0.25,
                    help="relative UDF noise level for the value-noise rows")
    args = ap.parse_args()
    R = args.res
    rng = np.random.default_rng(0)
    rows = []

    for name, make in [("sphere", sphere_fields), ("torus", torus_fields),
                       ("open_sheet", sheet_fields)]:
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

    print("\n| field | R | parity RMS (vox) | vote RMS (vox) | parity↔vote (vox) | faces p/v |")
    print("|---|---|---|---|---|---|")
    for name, r, rp, rv, rpv, fp, fv in rows:
        print(f"| {name} | {r} | {rp:.3f} | {rv:.3f} | {rpv:.3f} | {fp}/{fv} |")


if __name__ == "__main__":
    main()
