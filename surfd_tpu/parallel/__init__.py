from .mesh import data_sharding, make_mesh, replicate, replicated, shard_batch
