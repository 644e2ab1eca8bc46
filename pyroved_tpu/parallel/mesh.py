"""Device-mesh construction and parameter sharding rules.

The reference has NO distributed layer (single device,
``pyroved/models/base.py:51-52``); this module is the TPU-native additive
component (SURVEY.md section 2.6): scaling happens through a
``jax.sharding.Mesh`` and sharding annotations — XLA GSPMD inserts the
collectives (psum for data-parallel gradient reduction over ICI,
all-gathers for tensor-parallel matmuls).

Axes:
  'data'  — batch-dimension sharding (pure DP; trainers constrain each
            gathered batch to this axis).
  'model' — optional tensor parallelism: Dense kernels are sharded on the
            output-feature axis when divisible, giving Megatron-style
            column-parallel layers (XLA propagates and re-gathers as needed).
"""
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialize JAX's multi-host runtime (DCN scale-out): after this,
    ``jax.devices()`` spans every host's chips and the same mesh/sharding
    code paths drive multi-host training (meshes here never assume a single
    process; GSPMD routes intra-slice collectives over ICI and cross-slice
    over DCN). On TPU pods with standard env configuration all arguments
    auto-detect. Returns the global device count. Single-process setups may
    skip this entirely."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return len(jax.devices())


def create_mesh(axes: Optional[Dict[str, int]] = None, devices=None) -> Mesh:
    """Build a mesh from ``{'axis': size}``. Sizes must multiply to the
    device count; pass ``-1`` for one axis to absorb the remainder."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"data": n}
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    if int(np.prod(sizes)) != n:
        raise ValueError(f"Mesh axes {axes} do not cover {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def data_parallel_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh with a single 'data' axis over all (or the first N) devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return create_mesh({"data": len(devices)}, devices)


def replicate_params(params, mesh: Mesh):
    """Fully replicate a parameter pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(params, sharding)


def tensor_parallel_params(params, mesh: Mesh, axis: str = "model"):
    """Shard Dense/conv kernels on their output-feature (last) axis across
    the ``model`` mesh axis when divisible; everything else replicated.
    XLA GSPMD then partitions the matmuls column-parallel."""
    tp = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def place(leaf):
        if leaf.ndim >= 1 and leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp:
            spec = [None] * leaf.ndim
            spec[-1] = axis
            return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map(place, params)
