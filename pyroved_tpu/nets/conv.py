"""Convolutional encoder/decoder modules (flax.linen, channels-last).

TPU-native rebuild of the reference's conv nets (``pyroved/nets/conv.py``):
same block structure (conv stacks with maxpool-between-blocks feature
extractor; conv + x2-upsample mirror) and defaults
([(32,), (64, 64), (128, 128)] filters, lrelu, optional batchnorm), but in
NHWC layout — the native TPU convolution layout — instead of torch's NCHW.
Inputs/outputs carry the channel dim LAST; models accept channel-less
arrays and add a singleton channel.
"""
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.nn import get_activation
from .fc import Dense

Array = jax.Array

_torch_conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")  # == torch kaiming_uniform(a=sqrt(5))


def _conv(ndim: int, features: int, kernel_size=3, strides=1, name=None,
          dtype=jnp.float32):
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size,) * ndim,
        strides=(strides,) * ndim,
        padding="SAME",
        kernel_init=_torch_conv_kernel_init,
        dtype=dtype,
        name=name,
    )


def _resize_method(ndim: int, mode: str) -> str:
    """Reference's auto-downgrade: bilinear only exists for 2-D
    (``/root/reference`` nets/conv.py:121-130); 1-D/3-D fall to nearest."""
    mode = mode if ndim == 2 else "nearest"
    return "linear" if mode == "bilinear" else "nearest"


def _upsample(x: Array, factor: int, method: str) -> Array:
    """x[B, *spatial, C] -> each spatial axis scaled by ``factor``.

    Nearest replication runs as reshape+broadcast (``jnp.repeat``) —
    bitwise-equal to ``jax.image.resize(method='nearest')`` for integer
    factors but WITHOUT the gather that resize lowers to (gathers are
    slow on TPU; verified in the compiled HLO). Linear interpolation
    stays on ``jax.image.resize``."""
    if method == "nearest":
        for ax in range(1, x.ndim - 1):
            x = jnp.repeat(x, factor, axis=ax)
        return x
    spatial = tuple(s * factor for s in x.shape[1:-1])
    return jax.image.resize(x, (x.shape[0],) + spatial + (x.shape[-1],),
                            method=method)


def _max_pool(x: Array, ndim: int) -> Array:
    # Keep the stock reduce_window / select-and-scatter pair: two measured
    # alternatives LOSE on TPU (docs/PERFORMANCE.md kernel-experiments
    # table) — reshape+max (JAX's tie-splitting reduce_max VJP adds
    # count/divide passes, 66.5 -> 52.5 steps/s on the VED stretch config)
    # and a custom compare+where mask backward (the 2x upsample broadcasts
    # materialize as full-tensor copies across tiled-layout reshapes,
    # 66.5 -> 61.7).
    return nn.max_pool(x, window_shape=(2,) * ndim, strides=(2,) * ndim)


def _avg_pool(x: Array, ndim: int) -> Array:
    # Opt-in alternative (pool="avg"): the backward is a broadcast-scale
    # instead of maxpool's select-and-scatter — cheaper on HBM-bound
    # configs, but it CHANGES the model (docs/DEVIATIONS.md round-3 row).
    return nn.avg_pool(x, window_shape=(2,) * ndim, strides=(2,) * ndim)


def _default_enc_filters(f):
    return tuple(tuple(b) for b in f) if f is not None else ((32,), (64, 64), (128, 128))


def _default_dec_filters(f):
    return tuple(tuple(b) for b in f) if f is not None else ((128, 128), (64, 64), (32,))


class UpsampleBlock(nn.Module):
    """x2 interpolation (bilinear for 2-D, nearest for 1-D/3-D, mirroring the
    reference's auto-downgrade at ``nets/conv.py:121-130``) followed by a
    1x1 conv (reference: ``nets/conv.py:105-143``).

    With ``conv_first=True`` the 1x1 conv runs BEFORE the resize. The two
    ops commute exactly — the conv is a per-pixel channel map and the
    resize a per-channel linear pixel map (interpolation weights sum to 1,
    so the bias passes through constants unchanged) — and conv-first
    computes the conv on ``scale_factor**ndim`` fewer pixels. Same
    parameter tree, same output: bitwise for nearest, ~1e-6 f32
    reassociation for bilinear (equivalence pinned by tests). Under
    ``dtype=bfloat16`` with bilinear the two orders differ by ~bf16 eps
    instead — conv-first interpolates the f32 head output where the
    literal order quantizes to bf16 before the head.

    MEASURED NEGATIVE RESULT (v5e, 256x256 stretch config): despite the
    4x-fewer-pixels argument, conv-first times speed-neutral to ~3-7%
    SLOWER end-to-end than the literal order (XLA fuses the resize into
    the adjacent elementwise chain either way, and the low-resolution
    conv tiles the MXU worse) — so the DEFAULT is the literal reference
    order (``conv_first=False``); the rewrite stays available as an
    opt-in. Numbers in docs/PERFORMANCE.md."""
    ndim: int
    output_channels: int
    scale_factor: int = 2
    mode: str = "bilinear"
    dtype: jnp.dtype = jnp.float32
    conv_first: bool = False

    @nn.compact
    def __call__(self, x: Array, skip_resize: bool = False) -> Array:
        if self.mode not in ("bilinear", "nearest"):
            raise NotImplementedError("Use 'bilinear' or 'nearest' for upsampling mode")
        method = _resize_method(self.ndim, self.mode)
        conv = _conv(self.ndim, self.output_channels, kernel_size=1,
                     dtype=self.dtype)
        if skip_resize:
            # caller takes over the resize (to slide MORE commuting 1x1
            # convs under it — see Upsampler); only valid conv-first
            assert self.conv_first, "skip_resize requires conv_first"
            return conv(x)
        if self.conv_first:
            x = conv(x)
        x = _upsample(x, self.scale_factor, method)
        return x if self.conv_first else conv(x)


class FeatureExtractor(nn.Module):
    """Conv tower: blocks of convs with optional batchnorm, maxpool(2)
    between blocks, optional pool after the last block
    (reference: ``nets/conv.py:146-196``)."""
    ndim: int
    conv_filters: Optional[Sequence[Sequence[int]]] = None
    batchnorm: bool = False
    activation: str = "lrelu"
    pool_last: bool = True
    dtype: jnp.dtype = jnp.float32
    # Downsampling mode between blocks. "max" is the reference model
    # (nets/conv.py:170-193). "avg" and "stride" are opt-in MODEL CHANGES
    # (docs/DEVIATIONS.md): "avg" swaps in average pooling (cheap backward);
    # "stride" drops the pool and runs the block's LAST conv at stride 2
    # (one fewer full-resolution activation tensor per block).
    pool: str = "max"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.pool not in ("max", "avg", "stride"):
            raise ValueError(
                f"pool must be 'max', 'avg' or 'stride', got {self.pool!r}")
        act = get_activation(self.activation)
        filters = _default_enc_filters(self.conv_filters)
        n_blocks = len(filters)
        x = x.astype(self.dtype)
        for i, block in enumerate(filters):
            downsample = i + 1 < n_blocks or self.pool_last
            for j, ch in enumerate(block):
                stride = (2 if (self.pool == "stride" and downsample
                                and j == len(block) - 1) else 1)
                x = _conv(self.ndim, ch, strides=stride, dtype=self.dtype)(x)
                if act is not None:
                    x = act(x)
                if self.batchnorm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     dtype=self.dtype)(x)
            if downsample and self.pool != "stride":
                x = (_max_pool if self.pool == "max" else _avg_pool)(
                    x, self.ndim)
        return x


class Upsampler(nn.Module):
    """Mirror of FeatureExtractor: conv blocks each followed by an
    UpsampleBlock, then a final 1x1 conv to ``output_channels``
    (reference: ``nets/conv.py:199-249``)."""
    ndim: int
    conv_filters: Optional[Sequence[Sequence[int]]] = None
    output_channels: int = 1
    batchnorm: bool = False
    activation: str = "lrelu"
    upsampling_mode: str = "bilinear"
    dtype: jnp.dtype = jnp.float32
    # conv_first=True slides the commuting 1x1 convs under the final
    # resize: the last block's conv AND the output head both run at
    # pre-upsample resolution, and the last full-size resize moves only
    # ``output_channels`` (usually 1) instead of the block width. Exact
    # rewrite — same parameter tree, same output up to f32 reassociation
    # (the caller's output nonlinearity stays AFTER the resize, where the
    # reference applies it). Measured speed-neutral-to-slower on v5e
    # (docs/PERFORMANCE.md), so the literal reference order is the
    # default and the rewrite is opt-in.
    conv_first: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        act = get_activation(self.activation)
        filters = _default_dec_filters(self.conv_filters)
        ch = None
        x = x.astype(self.dtype)
        for bi, block in enumerate(filters):
            for ch in block:
                x = _conv(self.ndim, ch, dtype=self.dtype)(x)
                if act is not None:
                    x = act(x)
                if self.batchnorm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     dtype=self.dtype)(x)
            up = UpsampleBlock(self.ndim, ch, mode=self.upsampling_mode,
                               dtype=self.dtype, conv_first=self.conv_first)
            if self.conv_first and bi == len(filters) - 1:
                x = up(x, skip_resize=True)
                # the final output conv is the observation head: keep it f32
                # even under a bf16 compute dtype; at pre-upsample
                # resolution it commutes with the resize below
                x = _conv(self.ndim, self.output_channels, kernel_size=1,
                          dtype=jnp.float32)(x)
                return _upsample(x, up.scale_factor,
                                 _resize_method(self.ndim, self.upsampling_mode))
            x = up(x)
        # literal order (conv_first=False): head after the full-size resize
        return _conv(self.ndim, self.output_channels, kernel_size=1,
                     dtype=jnp.float32)(x)


class convEncoderNet(nn.Module):
    """Conv encoder producing (mu, sigma) (reference: ``nets/conv.py:24-64``).
    Input: ``[B, *input_dim, C]`` channels-last."""
    input_dim: Tuple[int, ...]
    latent_dim: int = 2
    hidden_dim: Optional[Sequence[Sequence[int]]] = None
    batchnorm: bool = False
    activation: str = "lrelu"
    softplus_out: bool = True
    pool_last: bool = False
    dtype: jnp.dtype = jnp.float32
    pool: str = "max"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
        filters = _default_enc_filters(self.hidden_dim)
        x = FeatureExtractor(len(self.input_dim), filters, self.batchnorm,
                             self.activation, self.pool_last,
                             dtype=self.dtype, pool=self.pool)(x, train)
        # latent heads stay f32 regardless of the tower's compute dtype
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        enc = Dense(2 * self.latent_dim, name="features2latent")(x)
        mu, sigma = jnp.split(enc, 2, axis=-1)
        if self.softplus_out:
            sigma = jax.nn.softplus(sigma)
        return mu, sigma


class convDecoderNet(nn.Module):
    """Conv decoder: latent -> features -> upsampler -> sigmoid
    (reference: ``nets/conv.py:67-102``). Output: ``[B, *output_dim, C]``."""
    output_dim: Tuple[int, ...]
    latent_dim: int = 2
    output_channels: int = 1
    hidden_dim: Optional[Sequence[Sequence[int]]] = None
    batchnorm: bool = False
    activation: str = "lrelu"
    sigmoid_out: bool = True
    upsampling_mode: str = "bilinear"
    dtype: jnp.dtype = jnp.float32
    conv_first: bool = False

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        filters = _default_dec_filters(self.hidden_dim)
        in_spatial = tuple(int(d) // 2 ** len(filters) for d in self.output_dim)
        ch0 = filters[0][0]
        x = Dense(int(np.prod(in_spatial)) * ch0, name="latent2features")(z)
        x = x.reshape((z.shape[0],) + in_spatial + (ch0,))
        x = Upsampler(len(self.output_dim), filters, self.output_channels,
                      self.batchnorm, self.activation, self.upsampling_mode,
                      dtype=self.dtype, conv_first=self.conv_first)(x, train)
        # Upsampler's final output conv already runs f32 (the observation
        # head stays full precision under a bf16 compute dtype)
        return jax.nn.sigmoid(x) if self.sigmoid_out else x
