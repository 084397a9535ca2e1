"""AE reconstruction export CLI (round-trip quality harness).

Parity with /root/reference/AutoEncoder/encdec/export_meshes.py:33-151:
encode each test point cloud, decode through the UDF pipeline, extract the
mesh (open or watertight), write OBJ, and report Chamfer distance against
the ground-truth surface samples — the reconstruction metric the reference
leaves to offline tooling (SURVEY.md §3.5).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="", help="shipped dataset preset "
                    "(deepfashion3d|pix3d|text2shape) or a JSON path")
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--ae_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--num_points_pcd", type=int, default=10_000)
    ap.add_argument("--watertight", action="store_true")
    ap.add_argument("--chamfer_points", type=int, default=4096)
    ap.add_argument("--limit", type=int, default=0)
    # the reference export harness runs no component cleanup, but its sample
    # scripts filter floaters (generate_uncond.py:117-122 mincomponentsize
    # 2500); exposed here because weakly-fitted decoders grow spurious shells
    ap.add_argument("--min_component_faces", type=int, default=0)
    # threshold multiplier for the face filter (th_dist = mult/N,
    # meshudf.py:371) — raise for decoders whose UDF floor sits above a voxel
    ap.add_argument("--face_filter_mult", type=float, default=1.0)
    # surface-bias calibration: "auto" (estimate the decoder's UDF floor from
    # the fill's block minima and subtract it), "none", or a forced float
    ap.add_argument("--surface_bias", default="auto")
    ap.add_argument("--resume", action="store_true",
                    help="skip items whose metrics row is already in "
                         "output_dir/recon_items.jsonl (wedge recovery)")
    ap.add_argument("--stall_exit_s", type=float, default=600.0,
                    help="exit 42 if no item completes for this long (wedged "
                         "device link; pair with scripts/train_with_restarts.sh "
                         "+ --resume). 0 disables")
    from ..utils.config import apply_preset_defaults

    apply_preset_defaults(ap)
    args = ap.parse_args()

    from ..data import UdfDataset
    from ..data.datasets import random_point_sampling
    from ..data.preprocess import sample_points_on_mesh
    from ..geometry import chamfer_distance, write_obj
    from ..models import CbnDecoder, CoordsEncoder, Dgcnn
    from ..pipelines import (
        MeshExtractionConfig,
        get_mesh_from_udf,
        get_watertight_mesh_from_udf,
        make_udf_fn,
    )
    from ..utils.checkpoint import load_params_npz

    rng = np.random.default_rng(0)
    dataset = UdfDataset(args.data_root, args.split)

    encoder = Dgcnn(size_latent=args.latent_size)
    enc_vars = encoder.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.num_points_pcd, 3))
    )
    enc_vars = load_params_npz(os.path.join(args.ae_dir, "ae_encoder.npz"), enc_vars)

    decoder = CbnDecoder(latent_dim=args.latent_size, hidden_dim=512, num_hidden_layers=5)
    ce = CoordsEncoder()
    dec_vars = decoder.init(
        jax.random.PRNGKey(1), ce.encode(jnp.zeros((1, 8, 3))), jnp.zeros((1, args.latent_size))
    )
    dec_vars = load_params_npz(os.path.join(args.ae_dir, "ae_decoder.npz"), dec_vars)

    from ..geometry.metrics import f_score, hausdorff_distance, mesh_surface_metrics

    os.makedirs(args.output_dir, exist_ok=True)
    from ._common import parse_surface_bias

    cfg = MeshExtractionConfig(
        resolution=args.resolution,
        min_component_faces=args.min_component_faces,
        face_filter_mult=args.face_filter_mult,
        surface_bias=parse_surface_bias(args.surface_bias),
    )
    import json

    from ..training import StallWatchdog

    # Incremental per-item rows: each finished item appends to
    # recon_items.jsonl so a wedged device link (the one failure mode a
    # tunneled chip actually exhibits — see StallWatchdog) loses at most one
    # item. --resume skips ids already recorded; the restart wrapper
    # (scripts/train_with_restarts.sh) turns exit 42 into a clean rerun.
    items_path = os.path.join(args.output_dir, "recon_items.jsonl")
    done: dict = {}
    if args.resume and os.path.exists(items_path):
        with open(items_path) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    done[r["id"]] = r
        print(f"resume: {len(done)} items already done", file=sys.stderr)
    elif os.path.exists(items_path):
        os.unlink(items_path)

    rows = []
    items = range(len(dataset)) if not args.limit else range(min(args.limit, len(dataset)))
    wd = StallWatchdog(args.stall_exit_s)
    wd.__enter__()
    for i in items:
        item = dataset[i]
        if item["id"] in done:
            rows.append(done[item["id"]])
            continue
        pcd = random_point_sampling(item["pcd"], args.num_points_pcd, rng)
        latent = encoder.apply(enc_vars, jnp.asarray(pcd)[None])[0]
        udf_fn = make_udf_fn(decoder, dec_vars, latent)
        if args.watertight:
            mesh = get_watertight_mesh_from_udf(udf_fn, cfg)
        else:
            mesh = get_mesh_from_udf(udf_fn, cfg=cfg)
        path = os.path.join(args.output_dir, f"{item['id']}.obj")
        write_obj(path, mesh)
        if len(mesh.faces):
            gt_mesh = dataset.mesh(i)
            if gt_mesh is not None:
                # exact surface-to-surface metrics via the C++ BVH — no
                # target-side sampling noise (metrics.mesh_surface_metrics)
                row = {
                    "id": item["id"],
                    "faces": int(len(mesh.faces)),
                    **mesh_surface_metrics(
                        mesh, gt_mesh, n=args.chamfer_points, rng=rng
                    ),
                }
            else:
                recon = sample_points_on_mesh(mesh, args.chamfer_points, rng)
                gt = random_point_sampling(item["pcd"], args.chamfer_points, rng)
                row = {
                    "id": item["id"],
                    "faces": int(len(mesh.faces)),
                    "chamfer": chamfer_distance(recon, gt),
                    "hausdorff": hausdorff_distance(recon, gt),
                    "f_score@0.01": f_score(recon, gt, threshold=0.01),
                }
            print(
                f"[{i}] {item['id']}: {row['faces']} faces, "
                f"chamfer {row['chamfer']:.6f}, f@0.01 {row['f_score@0.01']:.3f}",
                file=sys.stderr,
            )
        else:
            row = {"id": item["id"], "faces": 0}
            print(f"[{i}] {item['id']}: EMPTY mesh", file=sys.stderr)
        row = {k: (float(v) if isinstance(v, (np.floating, np.integer)) else v)
               for k, v in row.items()}
        rows.append(row)
        with open(items_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        wd.tick()
    wd.__exit__(None, None, None)
    full = [r for r in rows if r["faces"]]
    by_class: dict = {}
    for r in full:
        by_class.setdefault(r["id"].split("_")[0].split("-")[0], []).append(r)
    summary = {
        "n": len(rows),
        "n_empty": len(rows) - len(full),
        "mean_chamfer": float(np.mean([r["chamfer"] for r in full])) if full else None,
        "mean_hausdorff": float(np.mean([r["hausdorff"] for r in full])) if full else None,
        "mean_f_score@0.01": float(np.mean([r["f_score@0.01"] for r in full])) if full else None,
        "per_class": {
            k: {
                "n": len(v),
                "chamfer": float(np.mean([r["chamfer"] for r in v])),
                "f_score@0.01": float(np.mean([r["f_score@0.01"] for r in v])),
            }
            for k, v in by_class.items()
        },
        "per_item": rows,
    }
    with open(os.path.join(args.output_dir, "recon_metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if full:
        print(
            f"mean chamfer: {summary['mean_chamfer']:.6f}  "
            f"mean f@0.01: {summary['mean_f_score@0.01']:.3f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
