"""Multi-host (DCN) utilities.

The reference's multi-process story is torchrun env rendezvous + NCCL
(/root/reference/train_diffcloth.py:106-117) with pickled object gathers
(/root/reference/utils/comm.py:104-144). The JAX equivalent needs almost no
code: `jax.distributed.initialize()` joins the fleet, pjit programs are
single-program-multiple-data across all hosts, and per-host input shards are
assembled into global arrays. These helpers wrap the few host-aware pieces.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join a multi-host JAX fleet (no-op on a single host).

    On Cloud TPU pods the arguments are auto-discovered from the metadata
    server; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Rank-0 check (reference utils/comm.py:31-33 `is_main_process`)."""
    return jax.process_index() == 0


def global_batch_from_local(mesh, local_batch):
    """Assemble per-host input shards into a global device array.

    Replaces DistributedSampler + DDP input scatter: each host loads only its
    slice; the returned arrays are globally addressable under pjit.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )


def broadcast_from_main(tree):
    """Broadcast host-side values from process 0 (reference
    dist_util.sync_params, utils/dist_util.py:61-67)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def all_gather_host(values):
    """Gather small host-side python/numpy values from every process
    (reference comm.all_gather's pickle dance, utils/comm.py:104-144)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(values)
