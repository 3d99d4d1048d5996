from .mesh import (get_mesh, replicated, ray_sharded, shard_batch,
                   replicate_params)

__all__ = ["get_mesh", "replicated", "ray_sharded", "shard_batch",
           "replicate_params"]
