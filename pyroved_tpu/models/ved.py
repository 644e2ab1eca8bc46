"""Variational encoder-decoder (VED): input and output domains differ.

TPU-native rebuild of the reference VED (``pyroved/models/ved.py:22-243``)
for im2spec / spec2im problems: a conv encoder over ``input_dim`` and a conv
decoder to ``output_dim`` with no invariances (``ved.py:107``). Data layout
is channels-LAST (TPU-native); channel-less inputs get a singleton channel
appended. ``predict`` draws 30 posterior samples and decodes them in one
batched call (reference loops decode 30 times, ``ved.py:198-216``).
"""
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..infer.dists import get_sampler
from ..infer.elbo import normal_latent_site, obs_site
from ..nets.conv import convDecoderNet, convEncoderNet
from ..utils.coord import generate_latent_grid
from .base import baseVAE

Array = jax.Array


class VED(baseVAE):
    """im2spec / spec2im variational encoder-decoder
    (reference: ``models/ved.py:91-124``)."""

    def __init__(
        self,
        input_dim: Sequence[int],
        output_dim: Sequence[int],
        input_channels: int = 1,
        output_channels: int = 1,
        latent_dim: int = 2,
        hidden_dim_e: Optional[Sequence[Sequence[int]]] = None,
        hidden_dim_d: Optional[Sequence[Sequence[int]]] = None,
        activation: str = "lrelu",
        batchnorm: bool = False,
        sampler_d: str = "bernoulli",
        sigmoid_d: bool = True,
        seed: int = 1,
        **kwargs,
    ) -> None:
        super().__init__(output_dim, None, **kwargs)
        self._seed(seed)
        self.input_dim = tuple(int(d) for d in input_dim)
        self.output_dim = tuple(int(d) for d in output_dim)
        self.input_channels = int(input_channels)
        self.output_channels = int(output_channels)
        self.z_dim = int(latent_dim)
        self.batchnorm = bool(batchnorm)
        self.kl_mode = kwargs.get("kl", "mc")
        self.num_particles = int(kwargs.get("num_particles", 1))
        # Opt-in mixed precision for the conv towers: params and the
        # latent/observation heads stay f32; conv activations run in
        # bfloat16, halving the HBM traffic that bounds large spatial
        # configs (the 256x256 step is elementwise-bandwidth-bound, not
        # conv-FLOP-bound — docs/PERFORMANCE.md).
        cd = kwargs.get("compute_dtype", "float32")
        if cd not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be float32 or bfloat16, got {cd!r}")
        self.compute_dtype = cd
        dtype = jnp.bfloat16 if cd == "bfloat16" else jnp.float32
        # Opt-in encoder downsampling mode: "max" (reference), "avg",
        # "stride" — the latter two CHANGE the model (docs/DEVIATIONS.md)
        # and exist as measured speed levers for HBM-bound configs.
        pool = kwargs.get("pool", "max")
        if pool not in ("max", "avg", "stride"):
            raise ValueError(f"pool must be max, avg or stride, got {pool!r}")
        self.pool = pool

        self.encoder_net = convEncoderNet(
            self.input_dim, latent_dim, hidden_dim_e, batchnorm, activation,
            softplus_out=True, dtype=dtype, pool=pool)
        # conv_first=True opts into the commuted upsampler rewrite (1x1
        # convs before each resize — exact, same parameter tree). Measured
        # speed-neutral-to-slower on v5e (docs/PERFORMANCE.md), so the
        # literal reference order is the default.
        self.decoder_net = convDecoderNet(
            self.output_dim, latent_dim, output_channels, hidden_dim_d,
            batchnorm, activation, sigmoid_out=sigmoid_d, dtype=dtype,
            conv_first=bool(kwargs.get("conv_first", False)))
        self.sampler_d = get_sampler(sampler_d, **kwargs)

        self._init_params()
        self._encode_jit = None
        self._decode_jit = None
        self._predict_jit = {}

    def _init_params(self) -> None:
        x0 = jnp.zeros((1,) + self.input_dim + (self.input_channels,), jnp.float32)
        z0 = jnp.zeros((1, self.z_dim), jnp.float32)
        enc_vars = self.encoder_net.init(self.next_rng(), x0)
        dec_vars = self.decoder_net.init(self.next_rng(), z0)
        self.params = {"encoder_z": enc_vars["params"], "decoder": dec_vars["params"]}
        self.state = {}
        # False = stateless batchnorm (batch statistics at train AND eval);
        # torch-weight import flips this to normalize with the imported
        # running averages at inference (interop.load_torch_weights).
        self.use_running_stats = False
        for name, v in (("encoder_z", enc_vars), ("decoder", dec_vars)):
            if "batch_stats" in v:
                self.state[name] = v["batch_stats"]

    def _with_channels(self, x: Array, spatial: Tuple[int, ...]) -> Array:
        """Append a singleton channel to channel-less inputs."""
        if x.ndim == len(spatial) + 1:
            return x[..., None]
        return x

    def _apply_bn_net(self, net, top, variables, x, train):
        """Batchnorm dispatch. Default is stateless batchnorm: normalize
        with the current batch's statistics (train=True) and discard the
        running-average update — no mutable state threads through the
        jitted epoch scan (docs/DEVIATIONS.md). When running statistics
        were installed (torch-weight import sets ``use_running_stats``),
        inference normalizes with them instead, matching the reference's
        ``eval()`` forward."""
        variables["batch_stats"] = self.state[top]
        if not train and getattr(self, "use_running_stats", False):
            return net.apply(variables, x, False)
        out, _ = net.apply(variables, x, True, mutable=["batch_stats"])
        return out

    def _apply_encoder(self, params, x, train=False):
        variables = {"params": params["encoder_z"]}
        if self.batchnorm:
            return self._apply_bn_net(self.encoder_net, "encoder_z",
                                      variables, x, train)
        return self.encoder_net.apply(variables, x, train)

    def _apply_decoder(self, params, z, train=False):
        variables = {"params": params["decoder"]}
        if self.batchnorm:
            return self._apply_bn_net(self.decoder_net, "decoder",
                                      variables, z, train)
        return self.decoder_net.apply(variables, z, train)

    # ------------------------------------------------------------------
    def loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                beta: Array) -> Array:
        """Per-example negative ELBO on (x, y) pairs: q(z|x), p(y|z)
        (reference model/guide: ``ved.py:126-167``)."""
        x, y = batch[0], batch[1]
        x = self._with_channels(x, self.input_dim)
        y = self._with_channels(y, self.output_dim)
        B = x.shape[0]
        mu, sig = self._apply_encoder(params, x)
        P = self.num_particles
        if P > 1:
            mu = jnp.broadcast_to(mu, (P,) + mu.shape)
            sig = jnp.broadcast_to(sig, (P,) + sig.shape)
        z, latent_term = normal_latent_site(rng, mu, sig, beta, self.kl_mode)
        loc = self._apply_decoder(params, z.reshape(-1, z.shape[-1]))
        recon = obs_site(self.sampler_d, y.reshape(B, -1),
                         loc.reshape(z.shape[:-1] + (-1,)))
        per_example = -(recon + latent_term)
        return per_example.mean(0) if P > 1 else per_example

    # ------------------------------------------------------------------
    def encode(self, x_new, **kwargs) -> Tuple[Array, Array]:
        """(z_loc, z_scale) of q(z|x) (reference: ``ved.py:169-186``)."""
        x = self._with_channels(self._as_f32(x_new), self.input_dim)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(lambda p, xx: self._apply_encoder(p, xx))
        bs = kwargs.get("batch_size")
        if bs and x.shape[0] > bs:
            return self._chunked(self._encode_jit, x, batch_size=bs)
        return self._encode_jit(self.params, x)

    def decode(self, z, **kwargs) -> Array:
        """Decode latents into the target space (reference: ``ved.py:188-196``).
        Squeezes the singleton channel for single-channel models."""
        z = self._as_f32(z)
        if self._decode_jit is None:
            self._decode_jit = jax.jit(lambda p, zz: self._apply_decoder(p, zz))
        bs = kwargs.get("batch_size")
        if bs and z.shape[0] > bs:
            loc = self._chunked(self._decode_jit, z, batch_size=bs)
        else:
            loc = self._decode_jit(self.params, z)
        return loc[..., 0] if self.output_channels == 1 else loc

    def predict(self, x_new, num_samples: int = 30, **kwargs) -> Tuple[Array, Array]:
        """Encode -> draw ``num_samples`` posterior z samples -> decode all in
        one batched call -> (mean, std) over samples
        (reference: ``ved.py:198-216`` with its 30-sample loop)."""
        x = self._with_channels(self._as_f32(x_new), self.input_dim)
        if num_samples not in self._predict_jit:  # cache keyed per sample count
            def _predict(params, xx, rng, S=num_samples):
                mu, sig = self._apply_encoder(params, xx)
                eps = jax.random.normal(rng, (S,) + mu.shape, mu.dtype)
                zs = mu[None] + sig[None] * eps                   # [S,B,Z]
                flat = zs.reshape(-1, zs.shape[-1])               # one [S*B] decode
                ys = self._apply_decoder(params, flat)
                ys = ys.reshape((S,) + (xx.shape[0],) + ys.shape[1:])
                return ys.mean(0), ys.std(0)
            self._predict_jit[num_samples] = jax.jit(_predict)
        mean, std = self._predict_jit[num_samples](self.params, x, self.next_rng())
        if self.output_channels == 1:
            mean, std = mean[..., 0], std[..., 0]
        return mean, std

    def manifold2d(self, d: int, plot: bool = True, **kwargs) -> Array:
        """Decoded manifold over the 2-D latent plane
        (reference: ``ved.py:218-243``). ``which_dims``/``z_fixed``
        select the swept plane when ``latent_dim > 2``."""
        which, zfix = kwargs.pop("which_dims", None), kwargs.pop("z_fixed", None)
        z, (grid_x, grid_y) = generate_latent_grid(d, **kwargs)
        z = self._embed_latent_plane(z, self.z_dim, which, zfix)
        loc = self.decode(z)
        if plot:
            from ..utils import viz
            if self.ndim == 2:
                viz.plot_img_grid(
                    loc, d,
                    extent=[float(grid_x.min()), float(grid_x.max()),
                            float(grid_y.min()), float(grid_y.max())], **kwargs)
            elif self.ndim == 1:
                viz.plot_spect_grid(loc, d, **kwargs)
        return loc
