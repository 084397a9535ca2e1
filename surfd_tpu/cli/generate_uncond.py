"""Unconditional generation CLI.

Parity with /root/reference/sample/generate_uncond.py (latent 32, decoder
512/5, DDPM 1000 steps, mesh extraction + cleanup):
  python -m surfd_tpu.cli.generate_uncond --ae_dir ... --model_path ... \
      --num_samples 2 --resolution 256
"""

from ._common import base_parser, run_generation


def main():
    args = base_parser(__doc__).parse_args()
    run_generation(args, cond_mode="no_cond", tag="uncond")


if __name__ == "__main__":
    main()
