"""Coordinate-grid generation and batched affine transforms.

TPU-native rebuild of the reference's coordinate utilities
(``pyroved/utils/coord.py:7-133`` in ziatdinovmax/pyroVED): identical sign
conventions (xx runs -1..1, yy runs 1..-1, 1-D grids run 1..-1, rotation
matrix rows ``[[cos, sin], [-sin, cos]]`` applied as ``coord @ R``), but
expressed as pure jnp functions that batch via broadcasting instead of
``torch.bmm`` loops, so XLA can fuse them into the decoder matmuls.
"""
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def grid2xy(x1: Array, x2: Array) -> Array:
    """Stacks two meshgrid planes into an ``[H*W, 2]`` coordinate list
    (reference: ``utils/coord.py:7-11``)."""
    xy = jnp.stack([x1, x2], axis=0)
    return xy.reshape(2, -1).T


def imcoordgrid(im_dim: Sequence[int]) -> Array:
    """2-D image coordinate grid on [-1, 1] x [1, -1]
    (reference: ``utils/coord.py:14-18``)."""
    xx = jnp.linspace(-1.0, 1.0, im_dim[0])
    yy = jnp.linspace(1.0, -1.0, im_dim[1])
    x0, x1 = jnp.meshgrid(xx, yy, indexing="ij")
    return grid2xy(x0, x1)


def generate_grid(data_dim: Sequence[int]) -> Array:
    """Generates a 1-D or 2-D coordinate grid with shape ``[N, ndim]``
    (reference: ``utils/coord.py:21-44``)."""
    if len(data_dim) not in (1, 2):
        raise NotImplementedError("Currently supports only 1D and 2D data")
    if len(data_dim) == 1:
        return jnp.linspace(1.0, -1.0, data_dim[0])[:, None]
    return imcoordgrid(data_dim)


def rotate_coordinates(coord: Array, phi: Array) -> Array:
    """Batched 2-D rotation, row-vector convention ``coord @ R`` with
    ``R = [[cos, sin], [-sin, cos]]`` (reference: ``utils/coord.py:63-75``).

    Args:
        coord: ``[..., N, 2]`` coordinates.
        phi: ``[...]`` rotation angles (radians), broadcastable to the batch.
    """
    phi = jnp.asarray(phi, coord.dtype)
    # Elementwise on the VPU in full f32 (no 2x2 matmul):
    # coord @ [[c, s], [-s, c]]  ==  (x*c - y*s, x*s + y*c)
    c = jnp.cos(phi)[..., None]
    s = jnp.sin(phi)[..., None]
    x, y = coord[..., 0], coord[..., 1]
    return jnp.stack([x * c - y * s, x * s + y * c], axis=-1)


def scale_coordinates(coord: Array, scale: Array) -> Array:
    """Batched isotropic scaling (reference: ``utils/coord.py:78-88``)."""
    scale = jnp.asarray(scale, coord.dtype)
    return coord * scale[..., None, None]


def transform_coordinates(
    coord: Array,
    phi: Union[Array, float] = 0.0,
    coord_dx: Union[Array, float] = 0.0,
    scale: Union[Array, float] = 1.0,
) -> Array:
    """Rotate, scale, then translate a batch of coordinate grids
    (reference: ``utils/coord.py:47-60``).

    For 1-D grids (last dim == 1) only translation applies. ``coord`` has
    shape ``[..., N, D]``; ``phi``/``scale`` broadcast over the batch dims;
    ``coord_dx`` broadcasts against ``[..., N, D]`` (pass ``[..., 1, D]``
    for a per-sample shift applied to every grid point).
    """
    if coord.shape[-1] == 1:
        return coord + coord_dx
    coord = rotate_coordinates(coord, phi)
    coord = scale_coordinates(coord, scale)
    return coord + coord_dx


def _norm_icdf(q: Array) -> Array:
    """Standard-normal inverse CDF (probit)."""
    return jnp.sqrt(2.0) * jax.scipy.special.erfinv(2.0 * q - 1.0)


def generate_latent_grid(d: Union[int, Sequence[int]], **kwargs) -> Tuple[Array, Tuple[Array, Array]]:
    """d x d grid over the 2-D latent plane (reference: ``utils/coord.py:91-109``).

    Default bounds are the standard-normal quantiles 0.95->0.05 along x
    (descending) and 0.05->0.95 along y; custom bounds via
    ``z_coord=[z1, z2, z3, z4]``.
    """
    if isinstance(d, int):
        d = [d, d]
    z_coord = kwargs.get("z_coord")
    if z_coord:
        z1, z2, z3, z4 = z_coord
        grid_x = jnp.linspace(z2, z1, d[0])
        grid_y = jnp.linspace(z3, z4, d[1])
    else:
        grid_x = _norm_icdf(jnp.linspace(0.95, 0.05, d[0]))
        grid_y = _norm_icdf(jnp.linspace(0.05, 0.95, d[1]))
    xx, yy = jnp.meshgrid(grid_x, grid_y, indexing="ij")
    z = jnp.stack([xx.ravel(), yy.ravel()], axis=-1).astype(jnp.float32)
    return z, (grid_x, grid_y)


def generate_latent_grid_traversal(
    d: int,
    cont_dim: int,
    disc_dim: int,
    cont_idx: int,
    cont_idx_fixed: float,
    num_samples: int,
) -> Tuple[Array, Array]:
    """Continuous traversal along one latent index plus tiled one-hot discrete
    codes (reference: ``utils/coord.py:112-133``)."""
    cont_traversal = _norm_icdf(jnp.linspace(0.95, 0.05, d))
    samples_cont = jnp.full((num_samples, cont_dim), float(cont_idx_fixed), jnp.float32)
    # row i*d + j gets cont_traversal[j] in column cont_idx
    col = jnp.tile(cont_traversal, num_samples // d + 1)[:num_samples]
    samples_cont = samples_cont.at[:, cont_idx].set(col)

    n = np.arange(disc_dim)
    n = np.tile(n, d // disc_dim + 1)[:d]
    blocks = []
    for i in range(d):
        block = np.zeros((d, disc_dim), np.float32)
        block[:, n[i]] = 1.0
        blocks.append(block)
    samples_disc = jnp.asarray(np.concatenate(blocks, axis=0))
    return samples_cont, samples_disc
