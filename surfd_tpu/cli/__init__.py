"""CLI entry points (python -m surfd_tpu.cli.<name>).

Importing the package configures the persistent XLA compile cache for every
entry point: the big executables (1000-step sampler scan, decoder grid
evals) take minutes to compile through a remote-compile tunnel, and the
cache survives across processes. Override the location with SURFD_JAX_CACHE.
"""

import os

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SURFD_JAX_CACHE", "/tmp/surfd_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
