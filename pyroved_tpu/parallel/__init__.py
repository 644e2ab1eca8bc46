"""Device-mesh parallelism utilities."""
from .mesh import (create_mesh, data_parallel_mesh, replicate_params,
                   tensor_parallel_params)
from .spatial import pixel_sharded_decode

__all__ = ["create_mesh", "data_parallel_mesh", "replicate_params",
           "tensor_parallel_params", "pixel_sharded_decode"]
