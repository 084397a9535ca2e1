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
    ap.add_argument("--category_list", default="",
                    help="garment_type_list.txt-format class map; overrides "
                    "the built-in garment classes (and --num_actions)")
    args = ap.parse_args()
    classes = GARMENT_CLASSES
    if args.category_list:
        from ..data.manifests import load_garment_categories

        _, cat2name = load_garment_categories(args.category_list)
        classes = tuple(cat2name[i] for i in sorted(cat2name))
        if not args.num_actions:
            args.num_actions = len(classes)
    if args.category.isdigit():
        cat = int(args.category)
    else:
        cat = classes.index(args.category)
    action = jnp.full((args.num_samples,), cat, jnp.int32)
    run_generation(args, cond_mode="category", action=action, tag=f"cat{cat}")


if __name__ == "__main__":
    main()
