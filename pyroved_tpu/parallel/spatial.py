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


def shard_pixels(model, mesh: Mesh, axis: str = "pixels"):
    """Enable pixel-SHARDED training on ``model``: every training-path
    reconstruction term is computed by a ``shard_map`` over ``mesh``'s
    ``axis`` — each device decodes its shard of the coordinate grid, the
    per-example partial log-probs ``psum`` over the axis, and the decoder
    weight gradients are psum-reduced by the transpose rule. Exact: the
    observation log-density factorizes over pixels (the grid is padded and
    masked when N does not divide the axis size).

    The memory win is the sequence-parallel one: the decoder's
    ``[B, N, H]`` activation working set shrinks to ``[B, N/n_axis, H]``
    per device, so grids whose naive working set exceeds one chip's HBM
    train across the mesh. Composes with the trainers' ``mesh=`` data
    parallelism (distinct axes of the same mesh).

    Pass ``mesh=None`` to disable and return to the full-grid paths.
    In-device alternative: construct the model with ``pixel_chunks=k``
    (a ``lax.scan`` over grid tiles with per-tile remat — same working-set
    bound on ONE chip, trading FLOPs in the backward).
    """
    if mesh is None:
        model._pixel_mesh = None
        model._pixel_axis = None
        return model
    if getattr(model, "coord", 0) == 0:
        raise ValueError(
            "shard_pixels requires a spatial decoder (invariances=...)")
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis {axis!r}: {mesh.axis_names}")
    model._pixel_mesh = mesh
    model._pixel_axis = axis
    return model


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
