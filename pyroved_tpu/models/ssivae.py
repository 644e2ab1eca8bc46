"""Semi-supervised classification VAE (ssiVAE, Kingma M2-style).

TPU-native rebuild of the reference ssiVAE
(``pyroved/models/ssivae.py:26-384``). Three networks: q(z|x,y) encoder,
q(y|x) classifier, p(x|z,y) decoder. For unlabeled data the reference
enumerates y with ``TraceEnum_ELBO`` (``trainers/auxsvi.py:69-72``); here the
exact class marginalization is explicit: each of the K enumerated branches
gets its own reparameterized z ~ q(z|x, y_k) (matching Pyro's expanded
sample of shape [K, B, z_dim]) and the branch ELBOs are averaged under
q(y|x). The auxiliary supervised objective (``ssivae.py:229-248``) is
``aux_loss_multiplier * log q(y|x)`` on labeled batches.
"""
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.dists import get_sampler, normal_log_prob, normal_sample, std_normal_log_prob
from ..infer.elbo import obs_site
from ..nets.fc import fcClassifierNet, fcDecoderNet, fcEncoderNet, sDecoderNet
from ..utils.coord import generate_latent_grid, generate_latent_grid_traversal
from ..utils.nn import to_onehot
from .base import baseVAE

Array = jax.Array


class ssiVAE(baseVAE):
    """Semi-supervised invariant VAE for classification
    (reference: ``models/ssivae.py:106-151``)."""

    def __init__(
        self,
        data_dim: Sequence[int],
        latent_dim: int,
        num_classes: int,
        invariances: Optional[List[str]] = None,
        hidden_dim_e: Optional[Sequence[int]] = None,
        hidden_dim_d: Optional[Sequence[int]] = None,
        hidden_dim_cls: Optional[Sequence[int]] = None,
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
        self.num_classes = int(num_classes)
        self.kl_mode = kwargs.get("kl", "mc")
        self.num_particles = int(kwargs.get("num_particles", 1))
        # Opt-in truncated enumeration (MODEL CHANGE, docs/DEVIATIONS.md):
        # unlabeled batches run only the enum_topk highest-probability
        # class branches under q(y|x), renormalized. enum_topk ==
        # num_classes keeps the exact expectation (branches reordered by
        # probability; each branch's reparameterization noise follows its
        # position, so trajectories differ from the untruncated path at
        # sampling level while the estimator stays exact); 0 disables.
        self.enum_topk = int(kwargs.get("enum_topk", 0) or 0)
        if self.enum_topk and not 1 <= self.enum_topk <= self.num_classes:
            raise ValueError(
                f"enum_topk must be in [1, num_classes={self.num_classes}]"
                f", got {self.enum_topk}")
        self.task = "classification"

        self.encoder_net = fcEncoderNet(
            self.out_shape, self.z_dim, num_classes, hidden_dim_e, activation,
            softplus_out=True)
        self.encoder_y_net = fcClassifierNet(
            self.out_shape, num_classes, hidden_dim_cls, activation)
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
        self._cls_jit = None
        self._encode_jit = None
        self._decode_jit = None

    def _init_params(self) -> None:
        flat = int(np.prod(self.out_shape))
        x0 = jnp.zeros((1, flat), jnp.float32)
        y0 = jnp.zeros((1, self.num_classes), jnp.float32)
        enc_vars = self.encoder_net.init(self.next_rng(), x0, y0)
        cls_vars = self.encoder_y_net.init(self.next_rng(), x0)
        zc0 = jnp.zeros((1, self.latent_dim + self.num_classes), jnp.float32)
        if self.coord > 0:
            dec_vars = self.decoder_net.init(self.next_rng(), self.grid[None], zc0)
        else:
            dec_vars = self.decoder_net.init(self.next_rng(), zc0)
        self.params = {
            "encoder_z": enc_vars["params"],
            "encoder_y": cls_vars["params"],
            "decoder": dec_vars["params"],
        }

    # ------------------------------------------------------------------
    def _branch_elbo(self, params, rng, xf, ys, beta):
        """ELBO pieces shared by both the supervised and enumerated paths:
        z ~ q(z|x,y); recon + beta * (log p(z) - log q(z|x,y)).
        Shapes: xf [..., D], ys [..., K] -> per-example [...]."""
        mu, sig = self.encoder_net.apply({"params": params["encoder_z"]}, xf, ys)
        z = normal_sample(rng, mu, sig)
        if self.kl_mode == "analytic":
            from ..infer.dists import normal_kl
            lat = -jnp.sum(normal_kl(mu, sig), axis=-1)
        else:
            lat = jnp.sum(std_normal_log_prob(z) - normal_log_prob(z, mu, sig), -1)
        if self.coord > 0 and self._pixel_mode():
            phi, dx, sc, zc = self.split_latent_full(z)
            zy = jnp.concatenate([zc, ys], axis=-1)
            recon = self._recon_pixel_parallel(params, phi, dx, sc, zy, xf)
            return recon + beta * lat
        if self.coord > 0 and self._fused_for_batch(np.prod(xf.shape[:-1])):
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
        recon = obs_site(self.sampler_d, xf, loc.reshape(xf.shape))
        return recon + beta * lat

    def loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                beta: Array) -> Array:
        """Per-example negative ELBO. Labeled batches (x, y): y observed in
        the model (``ssivae.py:190``). Unlabeled batches (x,): exact
        enumeration over classes (reference guide ``ssivae.py:198-215`` under
        ``config_enumerate``). Averaged over ``num_particles`` estimates."""
        return self._particle_loss(self._loss_single, params, rng, batch, beta)

    def _loss_single(self, params, rng: Array, batch: Tuple[Array, ...],
                     beta: Array) -> Array:
        x = batch[0]
        B = x.shape[0]
        K = self.num_classes
        xf = x.reshape(B, -1)
        ys = batch[1] if len(batch) > 1 else None
        log_prior_y = -math.log(K)
        if ys is not None:
            elbo = self._branch_elbo(params, rng, xf, ys, beta) + log_prior_y
            return -elbo
        alpha = self.encoder_y_net.apply({"params": params["encoder_y"]}, xf)  # [B,K]
        eye = jnp.eye(K, dtype=xf.dtype)
        if self.enum_topk:
            # truncated enumeration: only the top-k branches under q(y|x),
            # with renormalized weights; - log q(y|x) still scores the TRUE
            # (untruncated) guide probabilities
            kk = self.enum_topk
            a_top, idx = jax.lax.top_k(alpha, kk)             # [B, kk]
            w_top = a_top / jnp.sum(a_top, axis=-1, keepdims=True)
            ys_k = jnp.transpose(eye[idx], (1, 0, 2))          # [kk, B, K]
            xf_k = jnp.broadcast_to(xf, (kk, B, xf.shape[-1]))
            elbo_k = self._branch_elbo(params, rng, xf_k, ys_k, beta)
            log_a_top = jnp.log(jnp.clip(a_top, 1e-12))
            branch = elbo_k + log_prior_y - log_a_top.T
            return -jnp.sum(w_top.T * branch, axis=0)
        ys_k = jnp.broadcast_to(eye[:, None, :], (K, B, K))
        xf_k = jnp.broadcast_to(xf, (K, B, xf.shape[-1]))
        elbo_k = self._branch_elbo(params, rng, xf_k, ys_k, beta)  # [K,B]
        log_alpha = jnp.log(jnp.clip(alpha, 1e-12))
        branch = elbo_k + log_prior_y - log_alpha.T  # + log p(y) - log q(y|x)
        elbo = jnp.sum(alpha.T * branch, axis=0)
        return -elbo

    def trace(self, rng: Array, batch: Tuple[Array, ...], beta=1.0,
              params=None) -> dict:
        """Enumerated-site introspection for unlabeled batches — the analogue
        of the reference's ``get_enum_traces`` tests
        (``tests/test_models.py:193-208``): the class site has shape [B, K]
        and each enumerated branch's z site is expanded to [K, B, z_dim],
        exactly like Pyro's parallel enumeration."""
        params = self.params if params is None else params
        x = jnp.asarray(batch[0], jnp.float32)
        B, K = x.shape[0], self.num_classes
        xf = x.reshape(B, -1)
        alpha = self.encoder_y_net.apply({"params": params["encoder_y"]}, xf)
        eye = jnp.eye(K, dtype=xf.dtype)
        ys_k = jnp.broadcast_to(eye[:, None, :], (K, B, K))
        xf_k = jnp.broadcast_to(xf, (K, B, xf.shape[-1]))
        mu, sig = self.encoder_net.apply({"params": params["encoder_z"]},
                                         xf_k, ys_k)
        from ..infer.dists import normal_sample
        z = normal_sample(rng, mu, sig)
        elbo_k = self._branch_elbo(params, rng, xf_k, ys_k,
                                   jnp.asarray(beta, jnp.float32))
        return {
            "y": {"probs": alpha, "enumerated": ys_k},
            "z": {"loc": mu, "scale": sig, "value": z},
            "branch_elbo": elbo_k,
        }

    def aux_loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                    aux_loss_multiplier: Array) -> Array:
        """Auxiliary supervised objective: -mult * log q(y|x) on labeled
        data; zero otherwise (reference: ``ssivae.py:229-248``)."""
        if len(batch) < 2:
            return jnp.zeros(batch[0].shape[0])
        x, ys = batch[0], batch[1]
        xf = x.reshape(x.shape[0], -1)
        alpha = self.encoder_y_net.apply({"params": params["encoder_y"]}, xf)
        log_q = jnp.sum(ys * jnp.log(jnp.clip(alpha, 1e-12)), axis=-1)
        return -aux_loss_multiplier * log_q

    # ------------------------------------------------------------------
    def fit(self, X_unsup, labeled, val=None, epochs: int = 100,
            batch_size: int = 100, lr: float = 5e-4, verbose: bool = False,
            trainer=None, data_scale=None, **kwargs):
        """Semi-supervised training convenience: ``labeled`` is ``(X, y)``
        (y one-hot or class indices), ``val`` an optional ``(X, y)`` pair.
        Returns the auxSVItrainer (``history`` has loss and accuracy/MSE).
        ``data_scale=s`` trains on raw integer images directly (kept
        narrow on device, normalized by ``s`` inside the scans) — see
        ``baseVAE.fit``."""
        from ..trainers.auxsvi import auxSVItrainer
        from ..utils.data import init_ssvae_dataloaders
        Xl, yl = labeled
        self._check_data_scale(X_unsup, data_scale)
        self._check_data_scale(Xl, data_scale)
        yl = jnp.asarray(self._as_f32(yl))
        if yl.ndim < 2 and self.task == "classification":
            yl = to_onehot(yl, self.num_classes)
        val = val if val is not None else (Xl, yl)
        Xv, yv = val
        yv = jnp.asarray(self._as_f32(yv))
        if yv.ndim < 2 and self.task == "classification":
            yv = to_onehot(yv, self.num_classes)
        loaders = init_ssvae_dataloaders(X_unsup, (Xl, yl), (Xv, yv),
                                         batch_size=batch_size,
                                         scale=data_scale)
        # Trainer-level kwargs (mesh DP, auto-checkpoint, JSONL logging, …)
        # reach the internal auxSVItrainer; the rest (scale_factor,
        # aux_loss_multiplier, sup_period) go to each step.
        tkw = {k: kwargs.pop(k) for k in
               ("mesh", "checkpoint_path", "checkpoint_every", "log_file",
                "optimizer", "seed", "task") if k in kwargs}
        if trainer is not None and tkw:
            raise ValueError(
                "fit() got both an explicit trainer= and trainer-level "
                f"kwargs {sorted(tkw)}; configure them on the trainer you "
                "pass, or drop trainer= to have fit() build one.")
        trainer = trainer or auxSVItrainer(self, lr=lr, **tkw)
        # Fused multi-epoch path with the val metric evaluated inside the
        # dispatch (auxSVItrainer.run(loader_val=)); JSONL logging and
        # auto-checkpointing run between fused segments (run() splits
        # itself) — same routing rule as baseVAE.fit.
        fused = not verbose and isinstance(trainer, auxSVItrainer)
        if fused:
            trainer.run(loaders[0], loaders[1], int(epochs),
                        loader_val=loaders[2], **kwargs)
            return trainer
        from .base import _aux_fit_step_loop
        return _aux_fit_step_loop(trainer, loaders, epochs, verbose, kwargs)

    def set_classifier(self, cls_net) -> None:
        """Injects a user-defined classifier module; parameters re-initialized
        (reference: ``ssivae.py:250-254``)."""
        self.encoder_y_net = cls_net
        flat = int(np.prod(self.out_shape))
        cls_vars = cls_net.init(self.next_rng(), jnp.zeros((1, flat), jnp.float32))
        self.params["encoder_y"] = cls_vars["params"]
        # drop BOTH classifier-forward traces: a same-structured
        # replacement net would otherwise replay the old module's cached
        # computation (jit keys on arg structure, not on the module)
        self._cls_jit = None
        self._guide_probs_jit = None

    def classifier(self, x_new, **kwargs) -> Array:
        """Predicted class indices (reference: ``ssivae.py:256-280``)."""
        x = self._as_f32(x_new).reshape(len(x_new), -1)
        if self._cls_jit is None:
            self._cls_jit = jax.jit(
                lambda p, xx: jnp.argmax(
                    self.encoder_y_net.apply({"params": p["encoder_y"]}, xx), -1))
        bs = kwargs.get("batch_size")
        if bs and x.shape[0] > bs:
            return self._chunked(self._cls_jit, x, batch_size=bs)
        return self._cls_jit(self.params, x)

    def guide_probs(self, x) -> Array:
        """q(y|x) class probabilities from the classifier guide (softmax
        output, reference ``ssivae.py:155-167``). Used by
        ``run(enum_schedule="auto")`` to detect when the guide has
        concentrated enough for top-k truncation to be near-exact."""
        if getattr(self, "_guide_probs_jit", None) is None:
            self._guide_probs_jit = jax.jit(
                lambda p, xx: self.encoder_y_net.apply(
                    {"params": p["encoder_y"]}, xx))
        return self._guide_probs_jit(
            self.params, self._as_f32(x).reshape(len(x), -1))

    def encode(self, x_new, y=None, **kwargs):
        """(z_loc, z_scale, predicted classes); classes from the classifier
        when labels are missing (reference: ``ssivae.py:282-307``)."""
        x = self._as_f32(x_new).reshape(len(x_new), -1)
        if y is None:
            y_idx = self.classifier(x_new, **kwargs)
            y1h = jax.nn.one_hot(y_idx, self.num_classes, dtype=jnp.float32)
        else:
            y = self._as_f32(y)
            y1h = to_onehot(y, self.num_classes) if y.ndim < 2 else y
            y_idx = jnp.argmax(y1h, axis=1)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda p, xx, yy: self.encoder_net.apply({"params": p["encoder_z"]}, xx, yy))
        z_loc, z_scale = self._encode_jit(self.params, x, y1h)
        return z_loc, z_scale, y_idx

    def decode(self, z, y, **kwargs) -> Array:
        """Decode (content latents, one-hot classes)
        (reference: ``ssivae.py:309-320``)."""
        z = jnp.concatenate([self._as_f32(z), self._as_f32(y)], axis=-1)
        coords = self.fixed_transform_grid(**kwargs)
        loc = self._decode_loc(z, coords, **kwargs)
        return loc.reshape((-1,) + self.out_shape)

    def manifold2d(self, d: int, plot: bool = True, **kwargs) -> Array:
        """Latent manifold for a class picked via ``label`` kwarg
        (reference: ``ssivae.py:322-350``). ``which_dims``/``z_fixed``
        select the swept plane when ``latent_dim > 2``."""
        which, zfix = kwargs.pop("which_dims", None), kwargs.pop("z_fixed", None)
        z, (grid_x, grid_y) = generate_latent_grid(d, **kwargs)
        z = self._embed_latent_plane(z, self.latent_dim, which, zfix)
        cls = jnp.asarray(kwargs.get("label", 0))
        if cls.ndim < 2:
            cls = to_onehot(cls.reshape(1), self.num_classes)
        cls = jnp.broadcast_to(cls, (z.shape[0], self.num_classes))
        loc = self.decode(z, cls, **kwargs)
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

    def manifold_traversal(self, d: int, cont_idx: int, cont_idx_fixed: int = 0,
                           plot: bool = True, **kwargs) -> Array:
        """Joint traversal over classes and one continuous latent
        (reference: ``ssivae.py:352-384``)."""
        num_samples = d ** 2
        cont_dim = self.z_dim - self.coord
        samples_cont, samples_disc = generate_latent_grid_traversal(
            d, cont_dim, self.num_classes, cont_idx, cont_idx_fixed, num_samples)
        decoded = self.decode(samples_cont, samples_disc, **kwargs)
        if plot:
            from ..utils import viz
            viz.plot_grid_traversal(decoded, d, self.data_dim, self.num_classes,
                                    **kwargs)
        return decoded
