"""Category-conditional generation CLI.

Parity with /root/reference/sample/generate_cat.py: 9 garment classes
(:21-29), class label fed to the denoiser's label embedding.
"""

import jax.numpy as jnp

from ._common import base_parser, run_generation

# Garment classes (reference sample/generate_cat.py:21-29).
GARMENT_CLASSES = (
    "dress", "jumpsuit", "long-pants", "long-shirt", "long-skirt",
    "short-pants", "short-shirt", "short-skirt", "tank-top",
)


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--category", type=str, default="dress",
                    help=f"one of {GARMENT_CLASSES} or an integer id")
    args = ap.parse_args()
    if args.category.isdigit():
        cat = int(args.category)
    else:
        cat = GARMENT_CLASSES.index(args.category)
    action = jnp.full((args.num_samples,), cat, jnp.int32)
    run_generation(args, cond_mode="category", action=action, tag=f"cat{cat}")


if __name__ == "__main__":
    main()
