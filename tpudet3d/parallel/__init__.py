from .sharding import (make_mesh, data_sharding, replicated_sharding,
                       shard_batch, replicate, maybe_init_distributed,
                       local_batch_slice, DATA_AXIS)

__all__ = ['make_mesh', 'data_sharding', 'replicated_sharding', 'shard_batch',
           'replicate', 'maybe_init_distributed', 'local_batch_slice',
           'DATA_AXIS']
