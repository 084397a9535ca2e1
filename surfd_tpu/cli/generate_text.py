"""Text-conditional generation CLI.

Parity with /root/reference/sample/generate_text.py: the prompt is encoded
once with CLIP's text tower (512-d) and injected as context; latent 64
(text2shape AE). Supports --watertight (classic MC at iso 0.01 + largest
component, reference :132-158).
"""

import sys

import jax.numpy as jnp
import numpy as np

from ._common import base_parser, run_generation


def encode_text_clip(prompts, clip_npz: str):
    from ..models.clip import load_clip_params, tokenize

    model, params = load_clip_params(clip_npz)
    tokens = tokenize(prompts)
    return np.asarray(model.encode_text(params, jnp.asarray(tokens)))


def main():
    ap = base_parser(__doc__)
    ap.add_argument("--text_prompt", required=True)
    ap.add_argument("--clip_npz", default="", help="converted CLIP weights npz")
    ap.add_argument("--context_npy", default="", help="precomputed 512-d context")
    # watertight text path removes components < 5000 faces (reference :157)
    ap.set_defaults(latent_size=64, min_component_faces=5000)
    args = ap.parse_args()

    if args.context_npy:
        ctx = np.load(args.context_npy).reshape(1, -1)
    elif args.clip_npz:
        ctx = encode_text_clip([args.text_prompt], args.clip_npz)
    else:
        print("WARNING: no CLIP weights/context; zero context", file=sys.stderr)
        ctx = np.zeros((1, 512), np.float32)
    context = jnp.asarray(np.repeat(ctx, args.num_samples, axis=0), jnp.float32)
    run_generation(args, cond_mode="text", context=context, tag="text")


if __name__ == "__main__":
    main()
