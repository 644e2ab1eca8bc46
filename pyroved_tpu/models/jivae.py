"""Joint discrete-continuous invariant VAE (jiVAE).

TPU-native rebuild of the reference jiVAE (``pyroved/models/jivae.py:27-329``).
The reference relies on Pyro's ``TraceEnum_ELBO`` parallel enumeration of the
``OneHotCategorical`` latent (``trainers/svi.py:84-90``); here the exact
K-way marginalization is written out explicitly:

  ELBO = sum_k alpha_k * log p(x | z, k)                  (reconstruction)
       + beta_c * (log p(z) - log q(z|x))                 (continuous term)
       + beta_d * sum_k alpha_k * (log(1/K) - log alpha_k)  (discrete term)

with a single reparameterized z shared across the K enumerated branches —
exactly what ``z.repeat(discrete_dim, 1)`` does at ``jivae.py:182``. The
K-way decode is one batched tensor op (leading class axis), so the MXU sees
a single [K*B, ...] matmul stream instead of K separate calls.
"""
import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..infer.dists import get_sampler
from ..infer.elbo import normal_latent_site, obs_site
from ..nets.fc import fcDecoderNet, jfcEncoderNet, sDecoderNet
from ..ops.spatial_decoder import KERNEL_ACTS_WITH_APPROX
from ..utils.coord import generate_latent_grid, generate_latent_grid_traversal
from ..utils.nn import to_onehot
from .base import baseVAE

Array = jax.Array


class jiVAE(baseVAE):
    """VAE with joint continuous and discrete latents plus optional
    rotational/translational/scale invariances (reference:
    ``models/jivae.py:109-150``). ``scale_factor`` may be a scalar or a
    ``[beta_continuous, beta_discrete]`` pair, as in the reference
    (``jivae.py:161-165``)."""

    def __init__(
        self,
        data_dim: Sequence[int],
        latent_dim: int,
        discrete_dim: int,
        invariances: Optional[List[str]] = None,
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
        self.discrete_dim = int(discrete_dim)
        self.kl_mode = kwargs.get("kl", "mc")
        self.num_particles = int(kwargs.get("num_particles", 1))
        # Opt-in truncated enumeration (MODEL CHANGE, docs/DEVIATIONS.md):
        # decode only the enum_topk highest-probability classes per example
        # and renormalize their weights; the discrete KL term stays exact
        # (it needs no decodes). enum_topk == discrete_dim is the exact
        # expectation (branches merely reordered); 0 disables truncation.
        self.enum_topk = int(kwargs.get("enum_topk", 0) or 0)
        if self.enum_topk and not 1 <= self.enum_topk <= self.discrete_dim:
            raise ValueError(
                f"enum_topk must be in [1, discrete_dim={self.discrete_dim}]"
                f", got {self.enum_topk}")

        self.encoder_net = jfcEncoderNet(
            self.out_shape, self.z_dim, self.discrete_dim, hidden_dim_e,
            activation, softplus_out=True)
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

    def _init_params(self) -> None:
        flat = int(np.prod(self.out_shape))
        x0 = jnp.zeros((1, flat), jnp.float32)
        enc_vars = self.encoder_net.init(self.next_rng(), x0)
        zc0 = jnp.zeros((1, self.latent_dim + self.discrete_dim), jnp.float32)
        if self.coord > 0:
            dec_vars = self.decoder_net.init(self.next_rng(), self.grid[None], zc0)
        else:
            dec_vars = self.decoder_net.init(self.next_rng(), zc0)
        self.params = {"encoder_z": enc_vars["params"], "decoder": dec_vars["params"]}

    def prep_beta(self, scale_factor) -> Array:
        """Normalize scale_factor to a [beta_cont, beta_disc] pair
        (reference: ``jivae.py:161-165``)."""
        beta = jnp.asarray(scale_factor, jnp.float32)
        if beta.ndim == 0:
            beta = jnp.stack([beta, beta])
        return beta

    # ------------------------------------------------------------------
    def loss_fn(self, params, rng: Array, batch: Tuple[Array, ...],
                beta: Array) -> Array:
        """Per-example negative ELBO with exact K-way discrete enumeration
        (replaces TraceEnum_ELBO on the reference program,
        ``jivae.py:152-220``); averaged over ``num_particles`` estimates.
        ``beta`` is ``[beta_cont, beta_disc]``."""
        return self._particle_loss(self._loss_single, params, rng, batch, beta)

    def _enum_decode(self, params, z: Array, fused: bool, onehots=None):
        """Shared K-enumeration decode for the loss and the trace: split the
        transform latents, broadcast the content latents over the K one-hot
        codes, and decode all branches in one batched call. Returns
        ``((phi, dx, sc), coords, loc[K, B, N])`` — transform parts and
        coords are None for invariance-free models (and coords is None on
        the fused path, which never materializes the warped grid).

        ``onehots`` overrides the enumerated codes with per-example one-hot
        rows of shape ``[K_eff, B, discrete_dim]`` (the ``enum_topk``
        truncation path); default is the full K-way identity broadcast."""
        B = z.shape[0]
        if onehots is None:
            eye = jnp.eye(self.discrete_dim, dtype=z.dtype)
            onehots = jnp.broadcast_to(
                eye[:, None, :], (self.discrete_dim, B, self.discrete_dim))
        K = onehots.shape[0]
        phi = dx = sc = coords = None
        if self.coord > 0:
            phi, dx, sc, zc = self.split_latent_full(z)
        else:
            zc = z
        zc_k = jnp.concatenate([
            jnp.broadcast_to(zc, (K,) + zc.shape),
            onehots,
        ], axis=-1)  # [K, B, latent+discrete_dim]
        if self.coord > 0 and fused:
            from ..ops.spatial_decoder import apply_fused_sdecoder
            loc = apply_fused_sdecoder(
                params["decoder"], self.grid,
                jnp.broadcast_to(phi, (K, B)),
                jnp.broadcast_to(dx, (K,) + dx.shape),
                jnp.broadcast_to(sc, (K, B)), zc_k,
                self._dec_act, self._dec_sig)
        elif self.coord > 0:
            coords, _ = self.transformed_grid(z)  # [B, N, D]
            loc = self._enum_decode_xla_shared(params, coords, zc_k)
        else:
            loc = self.decoder_net.apply({"params": params["decoder"]}, zc_k)
        return (phi, dx, sc), coords, loc

    def _enum_decode_xla_shared(self, params, coords: Array, zc_k: Array):
        """XLA-path K-branch decode with the coordinate term shared.

        The warped grid is IDENTICAL across the K enumerated branches (the
        transform latents come from the tiled continuous z), so the
        coordinate head ``coords @ Wc + bc`` is computed once for [B, N]
        and broadcast against the per-branch latent head — instead of
        materializing [K, B, N, D] coordinates and redoing the head K
        times. Numerically equivalent per branch (same inputs; op order
        may differ at f32 last-ulp level). Falls back to the module apply for injected custom
        decoders, for activations the shared-head helpers don't cover
        (ops.spatial_decoder._act implements the full reference menu —
        tanh/relu/lrelu/softplus/gelu — so only injected custom activations
        fall back), AND for hidden widths
        that ``_padded_sdecoder_weights`` would zero-pad: the shared
        coordinate head saves only ~2% (measured), so any padded MACs in
        the [K, B, N, Hmax] matmuls immediately outweigh it — unpadded
        stacks (equal, lane-aligned widths) are the only win region."""
        from ..ops.spatial_decoder import sdecoder_needs_padding
        if (not isinstance(self.decoder_net, sDecoderNet)
                or self._dec_act not in KERNEL_ACTS_WITH_APPROX
                or sdecoder_needs_padding(params["decoder"])):
            coords_k = jnp.broadcast_to(coords, (zc_k.shape[0],) + coords.shape)
            return self.decoder_net.apply({"params": params["decoder"]},
                                          coords_k, zc_k)
        from ..ops.spatial_decoder import (_act, _h0_act,
                                           _padded_sdecoder_weights)
        Wc, bc, Wz, hw, hb, wout, bout = _padded_sdecoder_weights(
            params["decoder"])
        hc = coords @ Wc + bc                       # [B, N, H] — once
        hz = zc_k @ Wz                              # [K, B, H]
        h = _h0_act(self._dec_act, hc[None] + hz[:, :, None, :])
        for i in range(hw.shape[0]):
            h = _act(self._dec_act, h @ hw[i] + hb[i])
        out = h @ wout + bout
        if wout.shape[1] == 1:
            out = out[..., 0]
        return jax.nn.sigmoid(out) if self._dec_sig else out

    def _enum_recon_pp(self, params, z: Array, onehots: Array,
                       xf: Array) -> Array:
        """Per-branch reconstruction term ``[K_eff, B]`` with the pixel axis
        partitioned (see ``baseVAE._pixel_mode``): the enumerated branches
        ride as a leading batch dim, so neither the ``[K, B, N, H]``
        activations nor the ``[K, B, N]`` branch locs ever materialize in
        full."""
        K = onehots.shape[0]
        phi, dx, sc, zc = self.split_latent_full(z)
        zc_k = jnp.concatenate(
            [jnp.broadcast_to(zc, (K,) + zc.shape), onehots], axis=-1)
        return self._recon_pixel_parallel(
            params,
            jnp.broadcast_to(phi, (K,) + phi.shape),
            jnp.broadcast_to(dx, (K,) + dx.shape),
            jnp.broadcast_to(sc, (K,) + sc.shape),
            zc_k, xf[None])

    def _loss_single(self, params, rng: Array, batch: Tuple[Array, ...],
                     beta: Array) -> Array:
        x = batch[0]
        B = x.shape[0]
        K = self.discrete_dim
        xf = x.reshape(B, -1)
        mu, sig, alpha = self.encoder_net.apply({"params": params["encoder_z"]}, xf)
        z, latent_term = normal_latent_site(rng, mu, sig, beta[0], self.kl_mode)

        # Discrete term: exact expectation over the enumerated classes
        # (no decodes needed — stays exact even under enum_topk).
        log_alpha = jnp.log(jnp.clip(alpha, 1e-12))
        disc_term = beta[1] * jnp.sum(alpha * (-math.log(K) - log_alpha), axis=-1)

        if self.enum_topk:
            # truncated enumeration: decode only the top-k classes under
            # q(k|x) and renormalize their weights (enum_topk == K is the
            # exact expectation with branches sorted by probability)
            kk = self.enum_topk
            a_top, idx = jax.lax.top_k(alpha, kk)             # [B, kk]
            w_top = a_top / jnp.sum(a_top, axis=-1, keepdims=True)
            eye = jnp.eye(K, dtype=xf.dtype)
            onehots = jnp.transpose(eye[idx], (1, 0, 2))       # [kk, B, K]
            if self.coord > 0 and self._pixel_mode():
                recon_k = self._enum_recon_pp(params, z, onehots, xf)
            else:
                _, _, loc = self._enum_decode(
                    params, z, self._fused_for_batch(kk * z.shape[0]),
                    onehots=onehots)
                recon_k = obs_site(self.sampler_d, xf[None],
                                   loc.reshape(kk, B, -1))
            recon = jnp.sum(w_top.T * recon_k, axis=0)
        else:
            if self.coord > 0 and self._pixel_mode():
                eye = jnp.eye(K, dtype=xf.dtype)
                onehots = jnp.broadcast_to(eye[:, None, :], (K, B, K))
                recon_k = self._enum_recon_pp(params, z, onehots, xf)
            else:
                _, _, loc = self._enum_decode(
                    params, z, self._fused_for_batch(K * z.shape[0]))
                recon_k = obs_site(self.sampler_d, xf[None],
                                   loc.reshape(K, B, -1))  # [K,B]
            recon = jnp.sum(alpha.T * recon_k, axis=0)  # E_q(k|x)[log p(x|z,k)]
        return -(recon + latent_term + disc_term)

    def trace(self, rng: Array, batch: Tuple[Array, ...], beta=1.0,
              params=None) -> dict:
        """Site introspection for the joint model — full ELBO-program depth,
        matching :meth:`iVAE.trace`: continuous site (loc/scale/value), the
        discrete site's class probabilities plus the K enumerated one-hot
        values (mirroring the reference's enumeration trace tests on
        ``latent_cont``/``latent_disc``, ``tests/test_models.py:241-257``),
        the split transform parameters, the warped grid, the K-branch decoder
        output, and the per-branch / expected reconstruction terms."""
        params = self.params if params is None else params
        x = jnp.asarray(batch[0], jnp.float32)
        B, K = x.shape[0], self.discrete_dim
        xf = x.reshape(B, -1)
        betas = self.prep_beta(beta)
        mu, sig, alpha = self.encoder_net.apply(
            {"params": params["encoder_z"]}, xf)
        z, latent_term = normal_latent_site(rng, mu, sig, betas[0],
                                            self.kl_mode)
        log_alpha = jnp.log(jnp.clip(alpha, 1e-12))
        disc_term = betas[1] * jnp.sum(
            alpha * (-math.log(K) - log_alpha), axis=-1)
        eye = jnp.eye(K, dtype=xf.dtype)
        enumerated = jnp.broadcast_to(eye[:, None, :], (K, B, K))
        (phi, dx, sc), coords, loc = self._enum_decode(params, z, False)
        recon_k = obs_site(self.sampler_d, xf[None], loc.reshape(K, B, -1))
        return {
            "latent_cont": {"loc": mu, "scale": sig, "value": z},
            "latent_disc": {"probs": alpha, "enumerated": enumerated},
            "transform": {"phi": phi, "dx": dx, "sc": sc},
            "coords": coords,
            "obs": {"loc": loc},
            "recon_logp_k": recon_k,
            "recon_logp": jnp.sum(alpha.T * recon_k, axis=0),
            "latent_term": latent_term,
            "disc_term": disc_term,
        }

    # ------------------------------------------------------------------
    def encode(self, x_new, logits: bool = False, **kwargs):
        """Returns (z_loc, z_scale, classes); classes are argmax indices or
        raw probabilities when ``logits=True`` (reference:
        ``jivae.py:229-254``)."""
        x = self._as_f32(x_new).reshape(len(x_new), -1)
        if self._encode_jit is None:
            self._encode_jit = jax.jit(
                lambda p, xx: self.encoder_net.apply({"params": p["encoder_z"]}, xx))
        bs = kwargs.get("batch_size")
        if bs and x.shape[0] > bs:
            z_loc, z_scale, alpha = self._chunked(self._encode_jit, x, batch_size=bs)
        else:
            z_loc, z_scale, alpha = self._encode_jit(self.params, x)
        classes = alpha if logits else jnp.argmax(alpha, axis=1)
        return z_loc, z_scale, classes

    def guide_probs(self, x) -> Array:
        """q(y|x) class probabilities from the guide — the alphas the
        enumeration weights by (reference guide site ``jivae.py:199-220``).
        Used by ``run(enum_schedule="auto")`` to detect when the guide has
        concentrated enough for top-k truncation to be near-exact."""
        if self._encode_jit is None:
            self.encode(self._as_f32(x)[:1])  # builds _encode_jit
        _, _, alpha = self._encode_jit(
            self.params, self._as_f32(x).reshape(len(x), -1))
        return alpha

    def decode(self, z, y, **kwargs) -> Array:
        """Decode (content latents, one-hot classes)
        (reference: ``jivae.py:256-266``)."""
        z = jnp.concatenate([self._as_f32(z), self._as_f32(y)], axis=-1)
        coords = self.fixed_transform_grid(**kwargs)
        loc = self._decode_loc(z, coords, **kwargs)
        return loc.reshape((-1,) + self.out_shape)

    def manifold2d(self, d: int, disc_idx: int = 0, plot: bool = True, **kwargs) -> Array:
        """Continuous-latent manifold for one discrete class
        (reference: ``jivae.py:268-294``). ``which_dims``/``z_fixed``
        select the swept plane when ``latent_dim > 2``."""
        which, zfix = kwargs.pop("which_dims", None), kwargs.pop("z_fixed", None)
        z, (grid_x, grid_y) = generate_latent_grid(d, **kwargs)
        z = self._embed_latent_plane(z, self.latent_dim, which, zfix)
        z_disc = to_onehot(jnp.asarray([disc_idx]), self.discrete_dim)
        z_disc = jnp.broadcast_to(z_disc, (z.shape[0], self.discrete_dim))
        loc = self.decode(z, z_disc, **kwargs)
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
        """Joint continuous/discrete latent traversal
        (reference: ``jivae.py:296-329``)."""
        num_samples = d ** 2
        cont_dim = self.z_dim - self.coord
        samples_cont, samples_disc = generate_latent_grid_traversal(
            d, cont_dim, self.discrete_dim, cont_idx, cont_idx_fixed, num_samples)
        decoded = self.decode(samples_cont, samples_disc, **kwargs)
        if plot:
            from ..utils import viz
            viz.plot_grid_traversal(decoded, d, self.data_dim, self.discrete_dim,
                                    **kwargs)
        return decoded
