"""Device-mesh parallelism utilities."""
from .mesh import (create_mesh, data_parallel_mesh, initialize_multihost,
                   replicate_params,
                   tensor_parallel_params)
from .spatial import pixel_sharded_decode, shard_pixels
from .spmd import make_spmd_train_step

__all__ = ["create_mesh", "data_parallel_mesh", "initialize_multihost",
           "replicate_params",
           "tensor_parallel_params", "pixel_sharded_decode", "shard_pixels", "make_spmd_train_step"]
