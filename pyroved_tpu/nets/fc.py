"""Fully-connected encoder/decoder modules (flax.linen).

TPU-native rebuild of the reference's fc nets (``pyroved/nets/fc.py``):
same architectures and defaults ([128, 128] hidden, tanh activations,
softplus sigma head, sigmoid output) expressed as linen modules. Weight
init matches torch's ``nn.Linear`` default (uniform +-1/sqrt(fan_in)) so the
training dynamics track the reference.

The spatial decoder's per-pixel fusion (``coord_latent``,
``nets/fc.py:202-237``) is reformulated MXU-first: instead of flattening to
``[B*N, .]`` and looping, the whole ``[B, N, hidden]`` block is produced by
two matmuls and a broadcast add, which XLA tiles directly onto the MXU. A
fused Pallas kernel for the full transform+decode chain lives in
``pyroved_tpu.ops``.
"""
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.nn import get_activation

Array = jax.Array


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


class Dense(nn.Module):
    """Linear layer with torch ``nn.Linear``-style default init
    (kaiming-uniform a=sqrt(5) == U(+-1/sqrt(fan_in)) for both kernel and bias)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        kernel = self.param("kernel", _uniform_init(bound), (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            y = y + bias
        return y


class MLP(nn.Module):
    """Stack of Dense+activation layers (reference ``make_fc_layers``,
    ``nets/fc.py:307-324``)."""
    hidden_dim: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = get_activation(self.activation)
        for h in self.hidden_dim:
            x = act(Dense(h)(x))
        return x


def _default_hidden(hidden_dim) -> Tuple[int, ...]:
    return tuple(hidden_dim) if hidden_dim is not None else (128, 128)


class fcEncoderNet(nn.Module):
    """MLP encoder producing (mu, sigma) of q(z|x[,c])
    (reference: ``nets/fc.py:19-61``). Input is flattened and concatenated
    with the optional conditional vector by the caller or here."""
    in_dim: Tuple[int, ...]
    latent_dim: int = 2
    c_dim: int = 0
    hidden_dim: Optional[Sequence[int]] = None
    activation: str = "tanh"
    softplus_out: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Optional[Array] = None) -> Tuple[Array, Array]:
        flat_dim = int(np.prod(self.in_dim))
        if x.shape[-1] != flat_dim:  # trailing dims are the event dims
            x = x.reshape(x.shape[:-len(self.in_dim)] + (flat_dim,))
        if y is not None:
            y = jnp.broadcast_to(y, x.shape[:-1] + (y.shape[-1],))
            x = jnp.concatenate([x, y], axis=-1)
        h = MLP(_default_hidden(self.hidden_dim), self.activation)(x)
        mu = Dense(self.latent_dim, name="fc11")(h)
        sigma = Dense(self.latent_dim, name="fc12")(h)
        if self.softplus_out:
            sigma = jax.nn.softplus(sigma)
        return mu, sigma


class jfcEncoderNet(nn.Module):
    """Joint-VAE encoder producing (mu, sigma, class probs alpha)
    (reference: ``nets/fc.py:64-108``)."""
    in_dim: Tuple[int, ...]
    latent_dim: int = 2
    discrete_dim: int = 0
    hidden_dim: Optional[Sequence[int]] = None
    activation: str = "tanh"
    softplus_out: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        flat_dim = int(np.prod(self.in_dim))
        x = x.reshape(x.shape[0], flat_dim)
        h = MLP(_default_hidden(self.hidden_dim), self.activation)(x)
        mu = Dense(self.latent_dim, name="fc11")(h)
        sigma = Dense(self.latent_dim, name="fc12")(h)
        if self.softplus_out:
            sigma = jax.nn.softplus(sigma)
        alpha = jax.nn.softmax(Dense(self.discrete_dim, name="fc13")(h), axis=-1)
        return mu, sigma, alpha


class fcDecoderNet(nn.Module):
    """MLP decoder latent -> flattened signal (reference: ``nets/fc.py:111-152``).
    Returns ``[..., prod(out_dim)]``; callers reshape as needed."""
    out_dim: Tuple[int, ...]
    hidden_dim: Optional[Sequence[int]] = None
    activation: str = "tanh"
    sigmoid_out: bool = True

    @nn.compact
    def __call__(self, z: Array) -> Array:
        h = MLP(_default_hidden(self.hidden_dim), self.activation)(z)
        x = Dense(int(np.prod(self.out_dim)), name="out")(h)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class coord_latent(nn.Module):
    """Standalone coordinate/latent fusion block (reference
    ``coord_latent``, ``nets/fc.py:202-237``, arXiv:1909.11663):
    h = tanh(coords @ Wc + b + z @ Wz) with a bias-free latent head.
    ``sDecoderNet`` inlines this computation (same parameter names); the
    standalone module is provided for building custom spatial decoders."""
    latent_dim: int
    out_dim: int
    activation_out: bool = True

    @nn.compact
    def __call__(self, x_coord: Array, z: Array) -> Array:
        h_x = Dense(self.out_dim, name="fc_coord")(x_coord)
        h_z = Dense(self.out_dim, use_bias=False, name="fc_latent")(z)
        h = h_x + h_z[..., None, :]
        return jnp.tanh(h) if self.activation_out else h


class sDecoderNet(nn.Module):
    """Spatial decoder: per-pixel MLP over a (transformed) coordinate grid
    (reference ``sDecoderNet`` + ``coord_latent``, ``nets/fc.py:155-237``,
    based on arXiv:1909.11663).

    ``coords`` is ``[..., N, coord_dim]``, ``z`` is ``[..., latent(+c)]``;
    output is ``[..., N]`` for ``channels == 1`` (like the reference) or
    ``[..., N, C]`` for multi-channel data — the generalization the
    reference left as a TODO (``nets/fc.py:186``: single-channel only). The
    coord/latent fusion is h = tanh(coords @ Wc + b + z @ Wz), computed as
    batched matmuls with a broadcast add — no [B*N] flattening loop.
    """
    out_dim: Tuple[int, ...]
    hidden_dim: Optional[Sequence[int]] = None
    activation: str = "tanh"
    sigmoid_out: bool = True
    channels: int = 1

    @nn.compact
    def __call__(self, coords: Array, z: Array) -> Array:
        hidden = _default_hidden(self.hidden_dim)
        h_x = Dense(hidden[0], name="fc_coord")(coords)            # [..., N, H]
        h_z = Dense(hidden[0], use_bias=False, name="fc_latent")(z)  # [..., H]
        h = jnp.tanh(h_x + h_z[..., None, :])
        h = MLP(hidden, self.activation)(h)
        x = Dense(self.channels, name="out")(h)                    # [..., N, C]
        if self.channels == 1:
            x = x[..., 0]                                          # [..., N]
        return jax.nn.sigmoid(x) if self.sigmoid_out else x


class fcClassifierNet(nn.Module):
    """MLP classifier with softmax output (reference: ``nets/fc.py:240-271``)."""
    in_dim: Tuple[int, ...]
    num_classes: int
    hidden_dim: Optional[Sequence[int]] = None
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape(x.shape[0], int(np.prod(self.in_dim)))
        h = MLP(_default_hidden(self.hidden_dim), self.activation)(x)
        return jax.nn.softmax(Dense(self.num_classes, name="out")(h), axis=-1)


class fcRegressorNet(nn.Module):
    """MLP regressor with linear output (reference: ``nets/fc.py:274-304``)."""
    in_dim: Tuple[int, ...]
    c_dim: int
    hidden_dim: Optional[Sequence[int]] = None
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape(x.shape[0], int(np.prod(self.in_dim)))
        h = MLP(_default_hidden(self.hidden_dim), self.activation)(x)
        return Dense(self.c_dim, name="out")(h)
