"""Device-mesh parallelism utilities."""
from .mesh import (create_mesh, data_parallel_mesh, replicate_params,
                   tensor_parallel_params)

__all__ = ["create_mesh", "data_parallel_mesh", "replicate_params",
           "tensor_parallel_params"]
