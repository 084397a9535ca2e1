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

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = MeshExtractionConfig(resolution=args.resolution)
    chamfers = []
    items = range(len(dataset)) if not args.limit else range(min(args.limit, len(dataset)))
    for i in items:
        item = dataset[i]
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
            recon = sample_points_on_mesh(mesh, args.chamfer_points, rng)
            gt = random_point_sampling(item["pcd"], args.chamfer_points, rng)
            cd = chamfer_distance(recon, gt)
            chamfers.append(cd)
            print(f"[{i}] {item['id']}: {len(mesh.faces)} faces, chamfer {cd:.6f}", file=sys.stderr)
        else:
            print(f"[{i}] {item['id']}: EMPTY mesh", file=sys.stderr)
    if chamfers:
        print(f"mean chamfer: {np.mean(chamfers):.6f}", file=sys.stderr)


if __name__ == "__main__":
    main()
