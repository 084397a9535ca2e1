from .mesh import data_sharding, make_mesh, replicate, replicated, shard_batch
from .multihost import (
    all_gather_host,
    broadcast_from_main,
    global_batch_from_local,
    initialize,
    is_main_process,
    process_count,
    process_index,
)
