"""Test config: run everything on a virtual 8-device CPU platform.

This is the JAX analogue of a fake distributed backend (SURVEY.md §4g): the
same pjit/shard_map code paths as real TPUs, with N host devices.
Must run before jax initializes, hence env vars at import time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The machine's sitecustomize imports jax and registers the axon (TPU) PJRT
# plugin before conftest runs, so env vars alone are too late; backends are
# still lazy though, so jax.config can re-pin the platform. Tests run on the
# virtual 8-device CPU mesh unless SURFD_TEST_TPU=1 is set.
if not os.environ.get("SURFD_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: slow-tier tests — CLI subprocess smokes, the e2e workflow, the 64³ vote-BFS sweep (run with SURFD_RUN_SLOW=1)"
    )


def pytest_collection_modifyitems(config, items):
    if os.environ.get("SURFD_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow-tier test; set SURFD_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
