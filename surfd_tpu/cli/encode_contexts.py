"""Precompute CLIP conditioning embeddings (`<id>.context.npy`) for
sketch/img diffusion training.

The reference re-runs CLIP image preprocessing + encoding inside DataLoader
workers every epoch (/root/reference/data_loaders/dataset.py:202-227 and
training_loop_single.py:207-208); CLIP is frozen, so the embeddings are
constants — compute them once, next to the npz items:

  sketch:  <image_root>/<id>/sketch_0.png        (generate_sketch.py:74-82)
  img:     <image_root>/<cat>/<id>/<view>.png + <mask_root>/<cat>/<view>.png
           → mask2bbox → composite-on-white → square crop (dataset.py:208-227)

  python -m surfd_tpu.cli.encode_contexts --data_root DATA --split train \
      --image_root IMAGES --mode sketch --clip_npz clip.npz
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np


def _load_image(path: str, rgb: bool = True) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    return np.asarray(img.convert("RGB") if rgb else img.convert("L"))


def _embed_batch(clip_model, clip_vars, imgs: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(clip_model.encode_image(clip_vars, jnp.asarray(imgs)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data_root", required=True, help="npz dataset root")
    ap.add_argument("--split", default="train")
    ap.add_argument("--image_root", required=True)
    ap.add_argument("--mask_root", default="", help="img mode: binary masks dir")
    ap.add_argument("--mode", choices=["sketch", "img"], required=True)
    ap.add_argument("--view", type=int, default=0, help="sketch view index")
    ap.add_argument("--clip_npz", default="", help="converted CLIP weights (npz)")
    ap.add_argument("--random-init", action="store_true", help="random CLIP (smoke)")
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()

    from ..data.conditioning import clip_preprocess, composite_on_white, crop_square, mask2bbox
    from ..models.clip import init_clip, load_clip_params

    if args.clip_npz:
        clip_model, clip_vars = load_clip_params(args.clip_npz)
    else:
        if not args.random_init:
            print("WARNING: no --clip_npz; using random CLIP weights", file=sys.stderr)
        clip_model, clip_vars = init_clip()

    base = Path(args.data_root) / args.split
    items = sorted(base.rglob("*.npz"))
    if not items:
        print(f"no npz items under {base}", file=sys.stderr)
        return

    todo, imgs = [], []

    def flush():
        if not todo:
            return
        emb = _embed_batch(clip_model, clip_vars, np.stack(imgs))
        for out_path, e in zip(todo, emb):
            np.save(out_path, e.astype(np.float32))
            print(f"{out_path}", file=sys.stderr)
        todo.clear()
        imgs.clear()

    for npz_path in items:
        out_path = npz_path.with_suffix(".context.npy")
        if out_path.exists():
            continue
        fid = npz_path.stem
        if args.mode == "sketch":
            # fixed view-0 sketch per item (dataset.py:202-207)
            img_path = os.path.join(args.image_root, fid, f"sketch_{args.view}.png")
            if not os.path.exists(img_path):
                print(f"missing sketch for {fid}: {img_path}", file=sys.stderr)
                continue
            arr = _load_image(img_path)
        else:
            # img mode keeps the <cat>/<id> nesting (dataset.py:208-227);
            # deterministic first view here (training may re-encode per epoch
            # by re-running with --view if desired)
            cat = npz_path.parent.name
            views_dir = os.path.join(args.image_root, cat, fid)
            views = sorted(os.listdir(views_dir)) if os.path.isdir(views_dir) else []
            if not views:
                print(f"missing views for {fid}", file=sys.stderr)
                continue
            view = views[min(args.view, len(views) - 1)]
            arr = _load_image(os.path.join(views_dir, view))
            if args.mask_root:
                mask_path = os.path.join(
                    args.mask_root, cat, os.path.splitext(view)[0] + ".png"
                )
                if os.path.exists(mask_path):
                    mask = _load_image(mask_path, rgb=False) > 127
                    arr = composite_on_white(arr, mask)
                    arr = crop_square(arr.astype(np.uint8), mask2bbox(mask))
        imgs.append(clip_preprocess(arr))
        todo.append(out_path)
        if len(todo) >= args.batch_size:
            flush()
    flush()


if __name__ == "__main__":
    main()
