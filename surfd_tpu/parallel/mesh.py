"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's torch.distributed/NCCL stack
(/root/reference/train_diffcloth.py:110-117, utils/comm.py, utils/dist_util.py
— SURVEY.md §2.10): a single-program pjit over a named mesh. Gradient
all-reduce (DDP backward), parameter broadcast (`sync_params`) and loss
gathers (`LossAwareSampler`) all become XLA-inserted collectives over ICI —
no rendezvous, no pickled object gathers.

Axes:
  data   — batch (DP); gradients psum here
  model  — reserved for tensor sharding of wide layers / the grid-query
           stream at inference (SURVEY.md §2.10: the real long axis is the
           512³ voxel stream, which is embarrassingly data-parallel)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host batch with the leading dim sharded over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
