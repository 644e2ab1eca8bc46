"""Pixel-axis sharding for very large coordinate grids.

The spatial decoder's "sequence" axis is the H*W pixel grid (65k+ points in
the 256x256 stretch config, SURVEY.md section 5). For grids too large for
one device's memory, the decode can shard the PIXEL axis across the mesh:
each device evaluates the per-pixel MLP on its slice of the grid and XLA
gathers the output — the sequence-parallel analogue for this model family
(no attention, so no ring communication is needed: pixels are independent
given z).
"""
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pixel_sharded_decode(model, z, mesh: Mesh, axis: str = "data"):
    """Decode content latents with the coordinate grid sharded over
    ``axis``. Numerically identical to ``model.decode`` (the grid transform
    is elementwise per pixel); returns ``[B, N]`` gathered on host layout.

    Requires a model with a spatial decoder (``model.coord > 0``).
    """
    if model.coord == 0:
        raise ValueError("pixel_sharded_decode requires a spatial decoder")
    z = jnp.asarray(z, jnp.float32)
    grid = model.grid
    sharding = NamedSharding(mesh, P(axis, None))
    grid = jax.device_put(grid, sharding)  # [N, D] sharded over pixels

    @jax.jit
    def f(params, grid, zz):
        coords = jnp.broadcast_to(grid, (zz.shape[0],) + grid.shape)
        coords = jax.lax.with_sharding_constraint(
            coords, NamedSharding(mesh, P(None, axis, None)))
        return model.decoder_net.apply({"params": params["decoder"]}, coords, zz)

    return f(model.params, grid, z)
