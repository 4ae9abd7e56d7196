from kvzip_tpu.parallel.mesh import (
    cache_sharding, make_mesh, param_sharding, shard_cache, shard_params)
from kvzip_tpu.parallel.ring_prefill import reshard_to_cache, ring_prefill

__all__ = ["make_mesh", "param_sharding", "cache_sharding", "shard_params",
           "shard_cache", "ring_prefill", "reshard_to_cache"]
