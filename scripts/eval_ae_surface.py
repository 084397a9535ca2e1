"""Quick AE surface-accuracy probe — no mesh extraction.

Encodes each item's point cloud and evaluates the decoder's predicted UDF at
ground-truth surface points: a well-fitted AE puts the surface inside one
voxel (udf < 1/resolution), so `frac<1/N` directly predicts whether the
extraction pipeline will recover that region (meshudf threshold semantics,
/root/reference/meshudf/meshudf.py:356-379). Orders of magnitude cheaper
than cli/export_meshes — usable as a training monitor on CPU
(JAX_PLATFORMS=cpu) while the chip trains.

  python scripts/eval_ae_surface.py --data_root /tmp/surfd_corpus2 \
      --ae_dir /tmp/surfd_ae --split test [--watch 1200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--ae_dir", required=True)
    ap.add_argument("--latent_size", type=int, default=32)
    ap.add_argument("--num_points_pcd", type=int, default=10_000)
    ap.add_argument("--num_probe", type=int, default=2048)
    ap.add_argument("--resolution", type=int, default=256,
                    help="voxel threshold 1/resolution for frac-in-voxel")
    ap.add_argument("--max_dist", type=float, default=0.1)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--watch", type=int, default=0,
                    help="re-evaluate every N seconds (training monitor)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from surfd_tpu.data import UdfDataset
    from surfd_tpu.data.datasets import random_point_sampling
    from surfd_tpu.models import CbnDecoder, CoordsEncoder, Dgcnn
    from surfd_tpu.utils.checkpoint import load_params_npz

    dataset = UdfDataset(args.data_root, args.split)
    encoder = Dgcnn(size_latent=args.latent_size)
    enc_t = encoder.init(jax.random.PRNGKey(0), jnp.zeros((1, args.num_points_pcd, 3)))
    decoder = CbnDecoder(latent_dim=args.latent_size, hidden_dim=512, num_hidden_layers=5)
    ce = CoordsEncoder()
    dec_t = decoder.init(
        jax.random.PRNGKey(1), ce.encode(jnp.zeros((1, 8, 3))), jnp.zeros((1, args.latent_size))
    )

    @jax.jit
    def probe(enc_vars, dec_vars, pcd, pts):
        lat = encoder.apply(enc_vars, pcd[None])
        logits = decoder.apply(dec_vars, ce.encode(pts[None]), lat)
        return args.max_dist * (1.0 - jax.nn.sigmoid(logits[0]))

    enc_path = os.path.join(args.ae_dir, "ae_encoder.npz")
    dec_path = os.path.join(args.ae_dir, "ae_decoder.npz")
    thr = 1.0 / args.resolution
    n = len(dataset) if not args.limit else min(args.limit, len(dataset))

    while True:
        enc_vars = load_params_npz(enc_path, enc_t)
        dec_vars = load_params_npz(dec_path, dec_t)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(n):
            item = dataset[i]
            pcd = random_point_sampling(item["pcd"], args.num_points_pcd, rng)
            pts = random_point_sampling(item["pcd"], args.num_probe, rng)
            udf = np.asarray(probe(enc_vars, dec_vars, jnp.asarray(pcd), jnp.asarray(pts)))
            rows.append((dataset.item_id(i), float(np.median(udf)),
                         float(np.percentile(udf, 90)), float((udf < thr).mean())))
        stamp = time.strftime("%H:%M:%S")
        mtime = time.strftime("%H:%M:%S", time.localtime(os.path.getmtime(dec_path)))
        print(f"[{stamp}] {args.split} (weights saved {mtime}):", flush=True)
        for fid, med, p90, frac in rows:
            print(f"  {fid:14s} udf med {med:.4f} p90 {p90:.4f} frac<1/{args.resolution} {frac:.2f}",
                  flush=True)
        worst = min(rows, key=lambda r: r[3])
        print(f"  -> worst frac {worst[3]:.2f} ({worst[0]}), "
              f"mean frac {np.mean([r[3] for r in rows]):.2f}", flush=True)
        if not args.watch:
            break
        time.sleep(args.watch)


if __name__ == "__main__":
    main()
