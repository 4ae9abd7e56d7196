from kvzip_tpu.parallel.mesh import (
    cache_sharding, make_mesh, param_sharding, shard_cache, shard_params)

__all__ = ["make_mesh", "param_sharding", "cache_sharding", "shard_params",
           "shard_cache"]
