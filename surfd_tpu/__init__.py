"""surfd_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for Surf-D-style
latent diffusion over Unsigned Distance Fields (UDFs).

Re-designed from scratch for TPU hardware; capability parity target is the
PyTorch reference Yzmblog/SurfD (ECCV 2024, arXiv 2311.17050).

Layers (mirrors SURVEY.md §1, re-architected TPU-first):
  diffusion/  — pure-functional diffusion process (schedules, q/p math,
                scan-based samplers, respacing, schedule samplers)
  models/     — Flax denoiser (1-D UNet + MDM facade), AE (DGCNN encoder,
                CBN decoder, coords encoder), CFG wrapper, CLIP
  ops/        — fused folded-decoder grid evaluation (XLA; Pallas variant retired on measurement)
  geometry/   — grid filler, UDF marching (vectorized), mesh cleanup, OBJ I/O
  data/       — UDF datasets, preprocessing (mesh→UDF), curriculum samplers
  parallel/   — device mesh + sharding helpers (pjit/shard_map over ICI)
  training/   — AE trainer and diffusion trainer (DP via data mesh axis)
  utils/      — config, logging, checkpointing, seeding
"""

__version__ = "0.1.0"
