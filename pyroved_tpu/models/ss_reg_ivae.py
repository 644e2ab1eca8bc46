"""Semi-supervised regression VAE (ss_reg_iVAE).

TPU-native rebuild of the reference ss_reg_iVAE
(``pyroved/models/ss_reg_ivae.py:24-346``): the continuous-label analogue of
ssiVAE. The y-prior is N(0, regressor_sig) (default 0.5,
``ss_reg_ivae.py:147``, ``:185-187``); the guide samples
y ~ N(encoder_y(x), regressor_sig) for unlabeled data
(``ss_reg_ivae.py:205-207``) — a single reparameterized draw, matching
Pyro's Trace_ELBO (no enumeration for continuous labels,
``trainers/auxsvi.py:73-75``).
"""
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.dists import (get_sampler, normal_kl, normal_log_prob,
                           normal_sample, std_normal_log_prob)
from ..infer.elbo import obs_site
from ..nets.fc import fcDecoderNet, fcEncoderNet, fcRegressorNet, sDecoderNet
from ..utils.coord import generate_latent_grid
from .base import baseVAE

Array = jax.Array


class ss_reg_iVAE(baseVAE):
    """Semi-supervised invariant VAE for regression
    (reference: ``models/ss_reg_ivae.py:106-154``)."""

    def __init__(
        self,
        data_dim: Sequence[int],
        latent_dim: int,
        reg_dim: int,
        invariances: Optional[List[str]] = None,
        hidden_dim_e: Optional[Sequence[int]] = None,
        hidden_dim_d: Optional[Sequence[int]] = None,
        hidden_dim_reg: Optional[Sequence[int]] = None,
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
        self.reg_dim = int(reg_dim)
        self.reg_sig = float(kwargs.get("regressor_sig", 0.5))
        self.kl_mode = kwargs.get("kl", "mc")
        self.num_particles = int(kwargs.get("num_particles", 1))
        self.task = "regression"

        self.encoder_net = fcEncoderNet(
            self.out_shape, self.z_dim, reg_dim, hidden_dim_e, activation,
            softplus_out=True)
        self.encoder_y_net = fcRegressorNet(
            self.out_shape, reg_dim, hidden_dim_reg, activation)
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
        self._reg_jit = None
        self._encode_jit = None
        self._decode_jit = None

    def _init_params(self) -> None:
        flat = int(np.prod(self.out_shape))
        x0 = jnp.zeros((1, flat), jnp.float32)
        y0 = jnp.zeros((1, self.reg_dim), jnp.float32)
        enc_vars = self.encoder_net.init(self.next_rng(), x0, y0)
        reg_vars = self.encoder_y_net.init(self.next_rng(), x0)
        zc0 = jnp.zeros((1, self.latent_dim + self.reg_dim), jnp.float32)
        if self.coord > 0:
            dec_vars = self.decoder_net.init(self.next_rng(), self.grid[None], zc0)
        else:
            dec_vars = self.decoder_net.init(self.next_rng(), zc0)
        self.params = {
            "encoder_z": enc_vars["params"],
            "encoder_y": reg_vars["params"],
            "decoder": dec_vars["params"],
        }

    # ------------------------------------------------------------------
    def loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                beta: Array) -> Array:
        """Per-example negative ELBO (reference model/guide:
        ``ss_reg_ivae.py:156-212``). Labeled (x, y): y observed under the
        N(0, reg_sig) prior. Unlabeled (x,): y ~ q(y|x) sampled and scored
        against prior and guide. Averaged over ``num_particles`` estimates."""
        return self._particle_loss(self._loss_single, params, rng, batch, beta)

    def _loss_single(self, params, rng: Array, batch: Tuple[Array, ...],
                     beta: Array) -> Array:
        x = batch[0]
        B = x.shape[0]
        xf = x.reshape(B, -1)
        ys = batch[1] if len(batch) > 1 else None
        if ys is not None and ys.ndim == 1:  # scalar targets given as [B]
            ys = ys[:, None]
        rng_y, rng_z = jax.random.split(rng)
        y_term = 0.0
        sig_y = jnp.asarray(self.reg_sig, xf.dtype)
        if ys is None:
            c = self.encoder_y_net.apply({"params": params["encoder_y"]}, xf)
            ys = normal_sample(rng_y, c, jnp.broadcast_to(sig_y, c.shape))
            # + log p(y) - log q(y|x), both width reg_sig
            y_term = jnp.sum(
                normal_log_prob(ys, jnp.zeros_like(ys), sig_y)
                - normal_log_prob(ys, c, sig_y), axis=-1)
        else:
            y_term = jnp.sum(normal_log_prob(ys, jnp.zeros_like(ys), sig_y), -1)

        mu, sig = self.encoder_net.apply({"params": params["encoder_z"]}, xf, ys)
        z = normal_sample(rng_z, mu, sig)
        if self.kl_mode == "analytic":
            lat = -jnp.sum(normal_kl(mu, sig), axis=-1)
        else:
            lat = jnp.sum(std_normal_log_prob(z) - normal_log_prob(z, mu, sig), -1)
        if self.coord > 0 and self._pixel_mode():
            phi, dx, sc, zc = self.split_latent_full(z)
            zy = jnp.concatenate([zc, ys], axis=-1)
            recon = self._recon_pixel_parallel(params, phi, dx, sc, zy, xf)
            return -(recon + beta * lat + y_term)
        if self.coord > 0 and self._fused_for_batch(x.shape[0]):
            from ..ops.spatial_decoder import apply_fused_sdecoder
            phi, dx, sc, zc = self.split_latent_full(z)
            zy = jnp.concatenate([zc, ys], axis=-1)
            loc = apply_fused_sdecoder(params["decoder"], self.grid, phi, dx,
                                       sc, zy, self._dec_act, self._dec_sig)
        else:
            coords, zc = self.transformed_grid(z)
            zy = jnp.concatenate([zc, ys], axis=-1)
            if coords is not None:
                loc = self.decoder_net.apply({"params": params["decoder"]}, coords, zy)
            else:
                loc = self.decoder_net.apply({"params": params["decoder"]}, zy)
        recon = obs_site(self.sampler_d, xf, loc.reshape(B, -1))
        return -(recon + beta * lat + y_term)

    def aux_loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                    aux_loss_multiplier: Array) -> Array:
        """Auxiliary supervised objective:
        -mult * log N(y; encoder_y(x), reg_sig) on labeled data
        (reference: ``ss_reg_ivae.py:226-240``)."""
        if len(batch) < 2:
            return jnp.zeros(batch[0].shape[0])
        x, ys = batch[0], batch[1]
        if ys.ndim == 1:
            ys = ys[:, None]
        xf = x.reshape(x.shape[0], -1)
        c = self.encoder_y_net.apply({"params": params["encoder_y"]}, xf)
        lp = jnp.sum(normal_log_prob(ys, c, jnp.asarray(self.reg_sig, xf.dtype)), -1)
        return -aux_loss_multiplier * lp

    # ------------------------------------------------------------------
    def fit(self, X_unsup, labeled, val=None, epochs: int = 100,
            batch_size: int = 100, lr: float = 5e-4, verbose: bool = False,
            trainer=None, data_scale=None, **kwargs):
        """Semi-supervised regression training convenience (see ssiVAE.fit;
        ``data_scale=`` as in ``baseVAE.fit``)."""
        from ..trainers.auxsvi import auxSVItrainer
        from ..utils.data import init_ssvae_dataloaders
        Xl, yl = labeled
        self._check_data_scale(X_unsup, data_scale)
        self._check_data_scale(Xl, data_scale)
        Xv, yv = val if val is not None else (Xl, yl)
        yl = np.asarray(yl, np.float32).reshape(len(yl), -1)
        yv = np.asarray(yv, np.float32).reshape(len(yv), -1)
        loaders = init_ssvae_dataloaders(X_unsup, (Xl, yl), (Xv, yv),
                                         batch_size=batch_size,
                                         scale=data_scale)
        # Trainer-level kwargs reach the internal auxSVItrainer (see
        # ssiVAE.fit); step kwargs pass through to each epoch.
        tkw = {k: kwargs.pop(k) for k in
               ("mesh", "checkpoint_path", "checkpoint_every", "log_file",
                "optimizer", "seed", "task") if k in kwargs}
        if trainer is not None and tkw:
            raise ValueError(
                "fit() got both an explicit trainer= and trainer-level "
                f"kwargs {sorted(tkw)}; configure them on the trainer you "
                "pass, or drop trainer= to have fit() build one.")
        trainer = trainer or auxSVItrainer(self, lr=lr, **tkw)
        # Fused multi-epoch path with the val MSE evaluated inside the
        # dispatch (auxSVItrainer.run(loader_val=)) — see ssiVAE.fit.
        fused = not verbose and isinstance(trainer, auxSVItrainer)
        if fused:
            trainer.run(loaders[0], loaders[1], int(epochs),
                        loader_val=loaders[2], **kwargs)
            return trainer
        from .base import _aux_fit_step_loop
        return _aux_fit_step_loop(trainer, loaders, epochs, verbose, kwargs)

    def set_regressor(self, reg_net) -> None:
        """Injects a user-defined regressor (reference:
        ``ss_reg_ivae.py:248-252``)."""
        self.encoder_y_net = reg_net
        flat = int(np.prod(self.out_shape))
        reg_vars = reg_net.init(self.next_rng(), jnp.zeros((1, flat), jnp.float32))
        self.params["encoder_y"] = reg_vars["params"]
        self._reg_jit = None

    def regressor(self, x_new, **kwargs) -> Array:
        """Predicted continuous labels (reference: ``ss_reg_ivae.py:254-278``)."""
        x = self._as_f32(x_new).reshape(len(x_new), -1)
        if self._reg_jit is None:
            self._reg_jit = jax.jit(
                lambda p, xx: self.encoder_y_net.apply({"params": p["encoder_y"]}, xx))
        bs = kwargs.get("batch_size")
        if bs and x.shape[0] > bs:
            return self._chunked(self._reg_jit, x, batch_size=bs)
        return self._reg_jit(self.params, x)

    def encode(self, x_new, y=None, **kwargs):
        """(z_loc, z_scale, y); y predicted by the regressor when missing
        (reference: ``ss_reg_ivae.py:280-304``)."""
        x = self._as_f32(x_new).reshape(len(x_new), -1)
        if y is None:
            y = self.regressor(x_new, **kwargs)
        else:
            y = self._as_f32(y).reshape(x.shape[0], -1)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda p, xx, yy: self.encoder_net.apply({"params": p["encoder_z"]}, xx, yy))
        z_loc, z_scale = self._encode_jit(self.params, x, y)
        return z_loc, z_scale, y

    def decode(self, z, y, **kwargs) -> Array:
        """Decode (content latents, continuous labels)
        (reference: ``ss_reg_ivae.py:306-317``)."""
        z = jnp.concatenate([self._as_f32(z), self._as_f32(y)], axis=-1)
        coords = self.fixed_transform_grid(**kwargs)
        loc = self._decode_loc(z, coords, **kwargs)
        return loc.reshape((-1,) + self.out_shape)

    def manifold2d(self, d: int, y, plot: bool = True, **kwargs) -> Array:
        """Latent manifold conditioned on a continuous vector y
        (reference: ``ss_reg_ivae.py:319-346``). ``which_dims``/``z_fixed``
        select the swept plane when ``latent_dim > 2``."""
        which, zfix = kwargs.pop("which_dims", None), kwargs.pop("z_fixed", None)
        z, (grid_x, grid_y) = generate_latent_grid(d, **kwargs)
        z = self._embed_latent_plane(z, self.latent_dim, which, zfix)
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
