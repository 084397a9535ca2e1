"""Image-conditional generation CLI.

Parity with /root/reference/sample/generate_image.py: image + mask →
bbox crop → white composite → CLIP image embedding (:97-111); latent 64
(pix3d AE); --watertight path (:150-171).
"""

import sys

import jax.numpy as jnp
import numpy as np

from ._common import base_parser, run_generation


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--image_path", required=True)
    ap.add_argument("--mask_path", default="")
    ap.add_argument("--clip_npz", default="")
    ap.add_argument("--context_npy", default="")
    ap.set_defaults(latent_size=64)
    args = ap.parse_args()

    if args.context_npy:
        ctx = np.load(args.context_npy).reshape(1, -1)
    elif args.clip_npz:
        from PIL import Image

        from ..data.conditioning import clip_preprocess, composite_on_white, crop_square, mask2bbox
        from ..models.clip import load_clip_params

        img = np.asarray(Image.open(args.image_path).convert("RGB"))
        if args.mask_path:
            mask = np.asarray(Image.open(args.mask_path).convert("L")) > 127
            img = composite_on_white(img, mask)
            img = crop_square(img, mask2bbox(mask))
        model, params = load_clip_params(args.clip_npz)
        ctx = np.asarray(
            model.encode_image(params, jnp.asarray(clip_preprocess(img)[None]))
        )
    else:
        print("WARNING: no CLIP weights/context; zero context", file=sys.stderr)
        ctx = np.zeros((1, 512), np.float32)
    context = jnp.asarray(np.repeat(ctx, args.num_samples, axis=0), jnp.float32)
    run_generation(args, cond_mode="img", context=context, tag="img")


if __name__ == "__main__":
    main()
