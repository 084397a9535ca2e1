"""Determinism helpers (reference utils/fixseed.py:6-13 equivalent).

JAX is deterministic by construction given a PRNGKey; the only ambient state
to pin is numpy's host-side RNG (data order, schedule sampling).
"""

from __future__ import annotations

import random

import jax
import numpy as np


def fixseed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root PRNGKey."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
