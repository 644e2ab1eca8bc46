"""Invariant variational autoencoder (iVAE).

TPU-native rebuild of the reference iVAE (``pyroved/models/ivae.py:27-364``):
a VAE with optional rotational / translational / scale invariances and
optional conditioning on a class/continuous vector (``c_dim``). The Pyro
model/guide pair (``ivae.py:165-221``) becomes one explicit jit-compiled
per-example ELBO in :meth:`loss_fn`; the generative and inference paths are
otherwise identical:

  guide:  q(z|x[,y]) = N(encoder(x[,y]))           (ivae.py:204-221)
  model:  z ~ N(0,I) with beta-scaled KL; split z into (phi, dx, sc, content);
          warp the coordinate grid; decode; score obs   (ivae.py:165-202)
"""
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.dists import get_sampler
from ..infer.elbo import normal_latent_site, obs_site
from ..nets.fc import fcDecoderNet, fcEncoderNet, sDecoderNet
from ..ops.spatial_decoder import KERNEL_ACTS_WITH_APPROX
from ..utils.coord import generate_latent_grid
from .base import baseVAE

Array = jax.Array


class iVAE(baseVAE):
    """Variational autoencoder enforcing rotational, translational, and
    scale invariances, optionally class-conditioned.

    Args mirror the reference (``models/ivae.py:122-163``): ``data_dim``,
    ``latent_dim``, ``invariances`` (subset of ['r','t','s']), ``c_dim``,
    ``hidden_dim_e``/``hidden_dim_d`` (default [128,128]), ``activation``
    ('tanh'), ``sampler_d`` ('bernoulli'), ``sigmoid_d``, ``seed``.

    Keyword args: ``dx_prior``/``dy_prior``/``sc_prior``, ``decoder_sig``,
    plus ``kl`` ('mc' matches Pyro's Trace_ELBO estimator; 'analytic' uses
    the closed-form Normal KL).
    """

    def __init__(
        self,
        data_dim: Sequence[int],
        latent_dim: int = 2,
        invariances: Optional[List[str]] = None,
        c_dim: int = 0,
        hidden_dim_e: Optional[Sequence[int]] = None,
        hidden_dim_d: Optional[Sequence[int]] = None,
        activation: str = "tanh",
        sampler_d: str = "bernoulli",
        sigmoid_d: bool = True,
        seed: int = 1,
        **kwargs,
    ) -> None:
        super().__init__(data_dim, invariances, **kwargs)
        self._seed(seed)

        self.latent_dim = int(latent_dim)
        self.z_dim = self.latent_dim + self.coord
        self.c_dim = int(c_dim)
        self.kl_mode = kwargs.get("kl", "mc")
        # Pyro Trace_ELBO(num_particles=P) analog: average P reparameterized
        # ELBO estimates per example (all particles decode in one batched call)
        self.num_particles = int(kwargs.get("num_particles", 1))
        self.one_pass_train = bool(kwargs.get("one_pass_train", False))

        self.encoder_net = fcEncoderNet(
            self.out_shape, self.z_dim, c_dim, hidden_dim_e, activation,
            softplus_out=True)
        # Spatial decoder whenever there are invariance coordinates
        # (reference picks sDecoderNet for 0 < coord < 5, ivae.py:150-154)
        if 0 < self.coord < 5:
            self.decoder_net = sDecoderNet(
                self.data_dim, hidden_dim_d, activation, sigmoid_out=sigmoid_d,
                channels=self.channels)
        else:
            self.decoder_net = fcDecoderNet(
                self.out_shape, hidden_dim_d, activation, sigmoid_out=sigmoid_d)
        self.sampler_d = get_sampler(sampler_d, **kwargs)

        self._setup_fusion(hidden_dim_d, activation, sigmoid_d, kwargs)

        self._init_params()
        self._encode_jit = None
        self._decode_jit = None

    # ------------------------------------------------------------------
    def _init_params(self) -> None:
        flat = int(np.prod(self.out_shape))
        x0 = jnp.zeros((1, flat), jnp.float32)
        y0 = jnp.zeros((1, self.c_dim), jnp.float32) if self.c_dim else None
        enc_vars = self.encoder_net.init(self.next_rng(), x0, y0)
        zc0 = jnp.zeros((1, self.latent_dim + self.c_dim), jnp.float32)
        if self.coord > 0:
            coords0 = self.grid[None]
            dec_vars = self.decoder_net.init(self.next_rng(), coords0, zc0)
        else:
            dec_vars = self.decoder_net.init(self.next_rng(), zc0)
        self.params = {"encoder_z": enc_vars["params"], "decoder": dec_vars["params"]}

    # ------------------------------------------------------------------
    # ELBO
    # ------------------------------------------------------------------
    def loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                beta: Array) -> Array:
        """Per-example negative ELBO for a batch ``(x,)`` or ``(x, y)``.

        Matches Pyro's Trace_ELBO on the reference program: unscaled
        reconstruction term plus beta-scaled latent term
        (``ivae.py:175-202``). Returns shape ``[B]``.
        """
        x = batch[0]
        y = batch[1] if len(batch) > 1 else None
        B = x.shape[0]
        xf = x.reshape(B, -1)
        mu, sig = self.encoder_net.apply({"params": params["encoder_z"]}, xf, y)
        P = self.num_particles
        if P > 1:  # leading particle axis; decodes stay one batched call
            mu = jnp.broadcast_to(mu, (P,) + mu.shape)
            sig = jnp.broadcast_to(sig, (P,) + sig.shape)
            if y is not None:
                y = jnp.broadcast_to(y, (P,) + y.shape)
        z, latent_term = normal_latent_site(rng, mu, sig, beta, self.kl_mode)
        if self.coord > 0 and self._pixel_mode():
            phi, dx, sc, zc = self.split_latent_full(z)
            if y is not None:
                zc = jnp.concatenate([zc, y], axis=-1)
            recon = self._recon_pixel_parallel(params, phi, dx, sc, zc, xf)
        elif self.coord > 0 and self._fused_for_batch(np.prod(z.shape[:-1])):
            from ..ops.spatial_decoder import apply_fused_sdecoder
            phi, dx, sc, zc = self.split_latent_full(z)
            if y is not None:
                zc = jnp.concatenate([zc, y], axis=-1)
            loc = apply_fused_sdecoder(params["decoder"], self.grid, phi, dx,
                                       sc, zc, self._dec_act, self._dec_sig)
            recon = obs_site(self.sampler_d, xf,
                             loc.reshape(z.shape[:-1] + (-1,)))
        else:
            coords, zc = self.transformed_grid(z)
            if y is not None:
                zc = jnp.concatenate([zc, y], axis=-1)
            if coords is not None:
                loc = self.decoder_net.apply({"params": params["decoder"]}, coords, zc)
            else:
                loc = self.decoder_net.apply({"params": params["decoder"]}, zc)
            recon = obs_site(self.sampler_d, xf,
                             loc.reshape(z.shape[:-1] + (-1,)))
        per_example = -(recon + latent_term)
        return per_example.mean(0) if P > 1 else per_example

    def trace(self, rng: Array, batch: Tuple[Array, ...], beta=1.0,
              params=None) -> dict:
        """Site-introspection dict for the ELBO program — the TPU analogue of
        Pyro's poutine traces used by the reference's structure tests
        (``tests/test_models.py:21-38``): every intermediate value of one
        guide+model execution, keyed by site.

        Keys: ``latent.loc / latent.scale / latent.value`` (q(z|x)),
        ``transform.phi / .dx / .sc`` (split special latents),
        ``coords`` (warped grid, None for vanilla), ``obs.loc`` (decoder
        output), ``recon_logp`` and ``latent_term`` (per-example ELBO parts).
        """
        params = self.params if params is None else params
        beta = jnp.asarray(beta, jnp.float32)
        x = jnp.asarray(batch[0], jnp.float32)
        y = jnp.asarray(batch[1], jnp.float32) if len(batch) > 1 else None
        xf = x.reshape(x.shape[0], -1)
        mu, sig = self.encoder_net.apply({"params": params["encoder_z"]}, xf, y)
        z, latent_term = normal_latent_site(rng, mu, sig, beta, self.kl_mode)
        phi = dx = sc = coords = None
        if self.coord > 0:
            phi, dx, sc, zc = self.split_latent_full(z)
            coords, _ = self.transformed_grid(z)
        else:
            zc = z
        if y is not None:
            zc = jnp.concatenate([zc, y], axis=-1)
        if coords is not None:
            loc = self.decoder_net.apply({"params": params["decoder"]}, coords, zc)
        else:
            loc = self.decoder_net.apply({"params": params["decoder"]}, zc)
        recon = obs_site(self.sampler_d, xf, loc.reshape(x.shape[0], -1))
        return {
            "latent": {"loc": mu, "scale": sig, "value": z},
            "transform": {"phi": phi, "dx": dx, "sc": sc},
            "coords": coords,
            "obs": {"loc": loc},
            "recon_logp": recon,
            "latent_term": latent_term,
        }

    def weighted_loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                         weights: Array, beta: Array) -> Array:
        """Scalar weighted-sum training loss. With ``one_pass_train=True``
        (opt-in; measured ~10% SLOWER than the default two-kernel pipeline on
        v5e because the split kernels overlap better with the surrounding
        XLA ops, but it halves peak kernel-working-set), the reconstruction
        term and ALL its gradients come from the single-pass train-gradient
        kernel; otherwise this weights ``loss_fn``."""
        fast = (getattr(self, "one_pass_train", False)
                and self.coord > 0 and self.num_particles == 1
                and self._pixel_mode() is None
                and self._fused_for_batch(batch[0].shape[0])
                and self.channels == 1  # one-pass kernel head is 1-channel
                and self.sampler_d.name == "bernoulli" and self._dec_sig
                and self._dec_act in KERNEL_ACTS_WITH_APPROX)
        if not fast:
            return jnp.sum(self.loss_fn(params, rng, batch, beta) * weights)
        from ..ops.spatial_decoder import apply_fused_recon_loss
        x = batch[0]
        y = batch[1] if len(batch) > 1 else None
        B = x.shape[0]
        xf = x.reshape(B, -1)
        mu, sig = self.encoder_net.apply({"params": params["encoder_z"]}, xf, y)
        z, latent_term = normal_latent_site(rng, mu, sig, beta, self.kl_mode)
        phi, dx, sc, zc = self.split_latent_full(z)
        if y is not None:
            zc = jnp.concatenate([zc, y], axis=-1)
        recon_neg = apply_fused_recon_loss(
            params["decoder"], self.grid, phi, dx, sc, zc, xf, weights,
            self._dec_act)
        return recon_neg - jnp.sum(weights * latent_term)

    # ------------------------------------------------------------------
    # Inference / generation APIs (reference ivae.py:230-310)
    # ------------------------------------------------------------------
    def encode(self, x_new, y=None, **kwargs) -> Tuple[Array, Array]:
        """Returns (z_loc, z_scale) of q(z|x[,y]); the first ``coord``
        latent dims are the special (rotation, dx[, dy], scale) ones
        (reference: ``ivae.py:230-256``)."""
        x = self._as_f32(x_new).reshape(len(x_new), -1)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda p, xx, yy=None: self.encoder_net.apply(
                    {"params": p["encoder_z"]}, xx, yy))
        bs = kwargs.get("batch_size")
        args = (x,) if y is None else (x, self._as_f32(y).reshape(x.shape[0], -1))
        if bs and x.shape[0] > bs:
            return self._chunked(self._encode_jit, *args, batch_size=bs)
        return self._encode_jit(self.params, *args)

    def decode(self, z, y=None, **kwargs) -> Array:
        """Decode content latents (plus optional conditional vector) into the
        signal space under an optionally fixed angle/shift/scale
        (reference: ``ivae.py:258-275``)."""
        z = self._as_f32(z)
        if y is not None:
            z = jnp.concatenate([z, self._as_f32(y).reshape(z.shape[0], -1)], -1)
        coords = self.fixed_transform_grid(**kwargs)
        loc = self._decode_loc(z, coords, **kwargs)
        return loc.reshape((z.shape[0],) + self.out_shape)

    def reconstruct(self, x_new, y=None, **kwargs) -> Array:
        """Encode then decode: the model's reconstruction of the inputs at
        the posterior mean (special latents pass through the learned
        transform, so reconstructions are in the canonical pose unless
        ``angle``/``shift``/``scale`` kwargs re-pose them)."""
        z_loc, _ = self.encode(x_new, y, **kwargs)
        zc = z_loc[:, self.coord:]  # content latents only
        return self.decode(zc, y, **kwargs)

    def manifold2d(self, d: int, y=None, plot: bool = True, **kwargs) -> Array:
        """Decode a d x d grid over the 2-D latent plane
        (reference: ``ivae.py:277-310``). For ``latent_dim > 2`` pass
        ``which_dims=(i, j)`` (and optionally ``z_fixed``) to pick the
        swept plane — an extension; the reference crashes there."""
        which, zfix = kwargs.pop("which_dims", None), kwargs.pop("z_fixed", None)
        z, (grid_x, grid_y) = generate_latent_grid(d, **kwargs)
        z = self._embed_latent_plane(z, self.latent_dim, which, zfix)
        if self.c_dim > 0:
            if y is None:
                raise ValueError("To generate a manifold pass a conditional vector y")
            y = self._as_f32(y)
            y = y[None] if y.ndim < 2 else y
            y = jnp.broadcast_to(y, (z.shape[0],) + y.shape[1:])
        loc = self.decode(z, y, **kwargs)
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

    def predict_on_latent(self, train_data, gp_labels, gp_iterations: int = 1,
                          d: int = 12, plot: bool = False):
        """GP-surrogate predictions over the latent grid
        (reference: ``ivae.py:312-364``). Returns ((z, z_decoded), predictions)."""
        from ..utils.gp import gp_model
        X = self._as_f32(train_data)
        yl = self._as_f32(gp_labels)
        encoded = self.encode(X)[0]
        gpr = gp_model(input_dim=encoded.shape[1], encoded_X=encoded, y=yl,
                       gp_iterations=gp_iterations)
        z, _ = generate_latent_grid(d)
        predictions, _ = gpr.predict(z)
        z_decoded = self.manifold2d(d, plot=False)
        if plot:
            from ..utils import viz
            viz.plot_img_grid(z_decoded, d, cmap="viridis")  # reuse the decode
            viz.plot_latent_predictions(predictions, d)
        return (z, z_decoded), predictions
