"""Test config: run everything on a virtual 8-device CPU platform.

This is the JAX analogue of a fake distributed backend (SURVEY.md §4g): the
same pjit/shard_map code paths as real TPUs, with N host devices.
Must run before jax initializes, hence env vars at import time.
"""

import os

# Force-set (not setdefault): the machine env pins JAX_PLATFORMS=axon (the
# real TPU tunnel); tests must run on the virtual CPU mesh unless explicitly
# requested with SURFD_TEST_TPU=1.
if not os.environ.get("SURFD_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
