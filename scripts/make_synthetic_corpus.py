"""Synthetic garment-scale corpus for end-to-end AE/diffusion training
(VERDICT r2 next #3: no real Surf-D checkpoint or dataset exists in this
environment, so the quality loop is closed on analytic shapes pushed through
the SAME preprocessing the reference uses for deepfashion3d).

~64 meshes: spheres/ellipsoids (closed), tori (genus-1), open sheets with
random curvature (the garment-like case UDFs exist for), at varied pose and
scale, preprocessed at the production config
(/root/reference/AutoEncoder/encdec/preprocess_udfs.py:128-136 counts:
100k pcd, 500k queries at sigma [0.003,0.01,0.1] x [250k,200k,25k] + 25k
uniform, max_dist 0.1).

Usage: python scripts/make_synthetic_corpus.py --out /tmp/surfd_corpus \
          [--n 64] [--res 64] [--fast]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from surfd_tpu.data.preprocess import PreprocessConfig, normalize_mesh, prepare_udf_sample
from surfd_tpu.geometry.analytic import sphere_fields, torus_fields
from surfd_tpu.geometry.marching import Mesh, marching_tetrahedra


def _rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=np.float32)


def make_sphere(rng, R):
    sdf, _, _, _ = sphere_fields(R, radius=float(rng.uniform(0.45, 0.7)))
    m = marching_tetrahedra(sdf)
    scale = rng.uniform(0.6, 1.0, size=3).astype(np.float32)  # ellipsoid
    return Mesh((m.vertices * scale) @ _rot(rng).T, m.faces)


def make_torus(rng, R):
    sdf, _, _, _ = torus_fields(
        R, ring=float(rng.uniform(0.45, 0.6)), tube=float(rng.uniform(0.15, 0.3))
    )
    m = marching_tetrahedra(sdf)
    return Mesh(m.vertices @ _rot(rng).T, m.faces)


def make_sheet(rng, res=48):
    """Open quad-grid sheet with random low-frequency curvature — the
    garment-panel-like case."""
    half = rng.uniform(0.4, 0.65)
    xs = np.linspace(-half, half, res, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    a, b = rng.uniform(0.05, 0.25), rng.uniform(2.0, 5.0)
    c, d = rng.uniform(0.0, 0.15), rng.uniform(2.0, 5.0)
    Z = a * np.sin(b * X) + c * np.cos(d * Y)
    V = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(res * res).reshape(res, res)
    f1 = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:]], axis=-1)
    f2 = np.stack([idx[:-1, :-1], idx[1:, 1:], idx[:-1, 1:]], axis=-1)
    F = np.concatenate([f1.reshape(-1, 3), f2.reshape(-1, 3)]).astype(np.int64)
    return Mesh(V @ _rot(rng).T, F)


MAKERS = [("sphere", make_sphere), ("torus", make_torus), ("sheet", lambda rng, R: make_sheet(rng))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--test-frac", type=float, default=0.125)
    ap.add_argument("--fast", action="store_true",
                    help="1/5 query counts (for smoke tests, NOT the quality run)")
    args = ap.parse_args()

    cfg = PreprocessConfig()
    if args.fast:
        cfg = PreprocessConfig(
            num_points_pcd=20_000, counts=(50_000, 40_000, 5_000), num_uniform=5_000
        )

    rng = np.random.default_rng(7)
    n_test = max(1, int(args.n * args.test_frac))
    by_kind = {name: [] for name, _ in MAKERS}
    for i in range(args.n):
        split = "test" if i >= args.n - n_test else "train"
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        kind, maker = MAKERS[i % len(MAKERS)]
        t0 = time.perf_counter()
        mesh = normalize_mesh(maker(rng, args.res), mode="unit")
        payload = prepare_udf_sample(mesh, cfg)
        fid = f"{kind}_{i:03d}"
        by_kind[kind].append(fid)
        out = os.path.join(args.out, split, f"{fid}.npz")
        np.savez(out, **payload)
        print(f"[{i + 1}/{args.n}] {split}/{fid}: "
              f"{len(mesh.faces)} faces, {len(payload['coords'])} queries, "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    # category-conditioning map, garment_type_list.txt format
    # (data_loaders/dataset.py:129-137: `<class_name> <id> <id> ...` per line)
    with open(os.path.join(args.out, "category_list.txt"), "w") as f:
        for name, ids in by_kind.items():
            f.write(" ".join([name] + ids) + "\n")


if __name__ == "__main__":
    main()
