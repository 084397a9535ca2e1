"""Sketch-conditional generation CLI.

Parity with /root/reference/sample/generate_sketch.py: the sketch PNG is
CLIP-preprocessed and encoded with the image tower (:74-82); embedding feeds
the denoiser as context with optional CFG.
"""

import sys

import jax.numpy as jnp
import numpy as np

from ._common import base_parser, run_generation


def encode_image_clip(image_paths, clip_npz: str):
    from PIL import Image

    from ..data.conditioning import clip_preprocess
    from ..models.clip import load_clip_params

    model, params = load_clip_params(clip_npz)
    imgs = []
    for p in image_paths:
        img = np.asarray(Image.open(p).convert("RGB"))
        imgs.append(clip_preprocess(img))
    batch = jnp.asarray(np.stack(imgs))
    return np.asarray(model.encode_image(params, batch))


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--sketch_path", required=True)
    ap.add_argument("--clip_npz", default="")
    ap.add_argument("--context_npy", default="")
    args = ap.parse_args()

    if args.context_npy:
        ctx = np.load(args.context_npy).reshape(1, -1)
    elif args.clip_npz:
        ctx = encode_image_clip([args.sketch_path], args.clip_npz)
    else:
        print("WARNING: no CLIP weights/context; zero context", file=sys.stderr)
        ctx = np.zeros((1, 512), np.float32)
    context = jnp.asarray(np.repeat(ctx, args.num_samples, axis=0), jnp.float32)
    run_generation(args, cond_mode="sketch", context=context, tag="sketch")


if __name__ == "__main__":
    main()
