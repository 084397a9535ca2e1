"""Export a trained-decoder open-surface fixture for bench.py (VERDICT r3
next #4: the perf number must also cover the production workload class —
an OPEN sheet, the garment case the reference exists for — not just the
bench's analytic sphere).

Takes a cli/train_ae run dir + one open-sheet test item from the corpus,
encodes its point cloud with the trained DGCNN, and writes a self-contained
npz (fp16 decoder params + batch stats, the latent, max_dist, plus 20k
ground-truth surface samples for a sanity Chamfer) to assets/ so bench.py
can run the sheet fixture in any fresh checkout with no run dir or corpus.

Usage:
  python scripts/export_bench_fixture.py --ae_dir /tmp/runs/ae_r4 \
      --data_root /tmp/surfd_corpus --item sheet_122 \
      --out surfd_tpu/assets/bench_sheet_decoder.npz
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae_dir", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--item", default="sheet_122")
    ap.add_argument("--split", default="test")
    ap.add_argument("--out", default="surfd_tpu/assets/bench_sheet_decoder.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from surfd_tpu.models import CbnDecoder, CoordsEncoder, Dgcnn
    from surfd_tpu.utils.checkpoint import load_params_npz

    with open(os.path.join(args.ae_dir, "args.json")) as fh:
        targs = json.load(fh)
    L = targs["latent_size"]
    n_pcd = targs.get("num_points_pcd", 10_000)

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

    d = np.load(os.path.join(args.data_root, args.split, args.item + ".npz"))
    pcd = d["pcd"]
    sub = pcd[np.random.default_rng(0).choice(len(pcd), n_pcd, replace=False)]
    latent = np.asarray(encoder.apply(enc_vars, jnp.asarray(sub[None])))[0]

    out = {
        "latent": latent.astype(np.float32),
        "max_dist": np.float32(targs.get("max_dist", 0.1)),
        "hidden_dim": np.int32(targs.get("hidden_dim", 512)),
        "num_hidden_layers": np.int32(targs.get("num_hidden_layers", 5)),
        "surface_samples": pcd[
            np.random.default_rng(1).choice(len(pcd), 20_000, replace=False)
        ].astype(np.float16),
        "item": np.str_(f"{args.split}/{args.item}"),
        "ae_step": np.str_(str(targs.get("num_epochs", ""))),
    }
    # fp16 decoder tree under dec/ keys; load_params_npz casts back to the
    # template dtype (f32) on restore — fp16 weight error ~6e-4 relative,
    # far below the decoder's own fit error
    flat, _ = jax.tree_util.tree_flatten_with_path(dec_vars)
    for kp, leaf in flat:
        key = "dec/" + "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        a = np.asarray(leaf)
        out[key] = a.astype(np.float16) if a.dtype == np.float32 else a
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({os.path.getsize(args.out)/1e6:.1f} MB), "
          f"latent |mean| {np.abs(latent).mean():.3f}")


if __name__ == "__main__":
    main()
