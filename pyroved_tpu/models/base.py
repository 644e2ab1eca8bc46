"""Base class for variational encoder-decoder models.

TPU-native rebuild of the reference's ``baseVAE``
(``pyroved/models/base.py:21-192``): same invariance bookkeeping (1-D allows
only ``['t']``; in 2-D ``'t'`` consumes two latent slots), same coordinate
grid and prior conventions, same latent split ordering (rotation, then
dx/dy, then scale, then content — ``base.py:97-119``). Differences are
deliberate and TPU-first:

* Parameters live in an explicit pytree (``self.params``); all compute is
  functional and jit-compiled. There is no device attribute — JAX places
  arrays on the default backend, and trainers may shard over a mesh.
* Randomness is a threaded PRNG key (``self.rng``), not global torch seeds.
* ``encode``/``decode`` run as chunked jitted applies instead of
  ``DataLoader`` loops with per-batch H2D/D2H copies (``base.py:121-171``).
"""
import pickle
from typing import List, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ..utils.coord import generate_grid, transform_coordinates
from ..utils.nn import as_numpy, set_deterministic_mode

Array = jax.Array


def _aux_fit_step_loop(trainer, loaders, epochs, verbose, kwargs):
    """Per-epoch fallback loop shared by the semi-supervised ``fit``s
    (verbose mode / custom trainers): ``step()`` calls with host-side
    ``on_segment`` records and early stopping on ``history["test"]``
    (accuracy: higher is better; val MSE: lower is better)."""
    patience = kwargs.pop("patience", None)
    min_delta = float(kwargs.pop("min_delta", 0.0))
    on_segment = kwargs.pop("on_segment", None)
    if kwargs.pop("enum_schedule", None) is not None:
        raise ValueError(
            "enum_schedule= rides the fused run path; it is not supported "
            "with verbose=True — call trainer.run(..., enum_schedule=E).")
    if hasattr(trainer, "stopped_early"):
        trainer.stopped_early = False  # same reset contract as run()
    sign = -1.0 if getattr(trainer, "task", "") == "classification" else 1.0
    best, best_epoch = float("inf"), trainer.current_epoch
    for _ in range(int(epochs)):
        trainer.step(*loaders, **kwargs)
        if verbose:
            trainer.print_statistics()
        if on_segment is not None:
            on_segment([{"epoch": trainer.current_epoch,
                         "training_loss":
                             trainer.history["training_loss"][-1],
                         "test": trainer.history["test"][-1]}])
        if patience is not None:
            v = sign * trainer.history["test"][-1]
            if v < best - min_delta:
                best, best_epoch = v, trainer.current_epoch
            trainer.best_epoch = best_epoch
            trainer.best_metric = sign * best
            if trainer.current_epoch - best_epoch >= int(patience):
                trainer.stopped_early = True
                break
    return trainer


class baseVAE:
    """Common machinery for (invariant) variational encoder-decoder models."""

    def __init__(self, data_dim: Sequence[int], invariances: Optional[List[str]],
                 **kwargs):
        self.data_dim = tuple(int(d) for d in data_dim)
        self.ndim = len(self.data_dim)
        if invariances is None:
            coord = 0
        else:
            coord = len(invariances)
            if self.ndim == 1:
                if coord > 1 or invariances[0] != "t":
                    raise ValueError(
                        "For 1D data, the only invariance to enforce "
                        "is translation ('t')")
            if "t" in invariances and self.ndim == 2:
                coord = coord + 1
        self.coord = coord
        self.invariances = invariances
        # Multi-channel spatial data (channels= kwarg): data_dim stays the
        # SPATIAL shape (the coordinate grid runs over it); channels ride
        # as a trailing axis ([B, *data_dim, C]). The reference's spatial
        # decoder is single-channel only (its TODO at nets/fc.py:186);
        # channels > 1 is an extension. VED manages its own channel args.
        self.channels = int(kwargs.get("channels", 1))
        if self.channels < 1:
            raise ValueError(f"channels must be >= 1, got {self.channels}")
        self.out_shape = self.data_dim + (
            (self.channels,) if self.channels > 1 else ())

        self.grid = generate_grid(self.data_dim) if self.coord > 0 else None

        if self.coord > 0 and "t" in invariances:
            dx_pri = float(kwargs.get("dx_prior", 0.1))
            dy_pri = float(kwargs.get("dy_prior", dx_pri))
            self.t_prior = (jnp.asarray([dx_pri, dy_pri], jnp.float32)
                            if self.ndim == 2 else jnp.asarray(dx_pri, jnp.float32))
        else:
            self.t_prior = None
        if self.coord > 0 and "s" in (invariances or []):
            self.sc_prior = jnp.asarray(float(kwargs.get("sc_prior", 0.1)), jnp.float32)
        else:
            self.sc_prior = None

        # Pixel-axis partitioned TRAINING (SURVEY.md section 5: the
        # sequence-parallel analogue for this family is the H*W pixel grid).
        # pixel_chunks=k: the reconstruction term is computed by an
        # in-device lax.scan over k grid tiles with per-tile remat, bounding
        # the decoder's [B, N, H] activation working set to [B, N/k, H] —
        # large grids (512x512 = 262k pixels) train where the naive path
        # would exceed HBM. parallel.spatial.shard_pixels() instead shards
        # the pixel axis over a mesh axis (shard_map + psum).
        self.pixel_chunks = int(kwargs.get("pixel_chunks", 0) or 0)
        if self.pixel_chunks and self.coord == 0:
            raise ValueError(
                "pixel_chunks requires a spatial decoder (invariances=...); "
                "models without a coordinate grid have no pixel axis to "
                "partition")
        self._pixel_mesh = None
        self._pixel_axis = None

        # Populated by subclasses
        self.encoder_net = None
        self.decoder_net = None
        self.params = None
        self.rng = None
        self.z_dim = None

    # ------------------------------------------------------------------
    # RNG
    # ------------------------------------------------------------------
    def _seed(self, seed: int) -> None:
        self.rng = set_deterministic_mode(seed)

    def next_rng(self) -> Array:
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ------------------------------------------------------------------
    # Latent bookkeeping
    # ------------------------------------------------------------------
    def split_latent(self, z: Array) -> Tuple[Optional[Array], Array, Optional[Array], Array]:
        """Split ``z[..., z_dim]`` into (phi, dx, sc, content), in the
        reference's ordering: rotation first, then translation, then scale
        (``models/base.py:97-119``). Missing parts come back as identity
        values (phi=0, dx=0, sc=1) broadcastable over the batch."""
        batch_shape = z.shape[:-1]
        if self.ndim == 1:
            dx = z[..., 0:1]
            return None, dx, None, z[..., 1:]
        phi = jnp.zeros(batch_shape, z.dtype)
        dx = jnp.zeros(batch_shape + (2,), z.dtype)
        sc = jnp.ones(batch_shape, z.dtype)
        inv = self.invariances or []
        if "r" in inv:
            phi = z[..., 0]
            z = z[..., 1:]
        if "t" in inv:
            dx = z[..., :2]
            z = z[..., 2:]
        if "s" in inv:
            sc = sc + self.sc_prior * z[..., 0]
            z = z[..., 1:]
        return phi, dx, sc, z

    def split_latent_full(self, z: Array) -> Tuple[Array, Array, Array, Array]:
        """Like :meth:`split_latent` but with concrete identity defaults
        (phi=0, sc=1) and the translation prior already applied — the exact
        per-sample transform parameters consumed by the decoder kernels.
        Returns (phi [..], dx [.., D], sc [..], z_content)."""
        phi, dx, sc, z = self.split_latent(z)
        batch_shape = z.shape[:-1]
        if self.ndim == 2 and "t" in (self.invariances or []):
            dx = dx * self.t_prior
        if self.ndim == 1:
            dx = dx * self.t_prior
        if phi is None:
            phi = jnp.zeros(batch_shape, z.dtype)
        if sc is None:
            sc = jnp.ones(batch_shape, z.dtype)
        return phi, dx, sc, z

    def _embed_latent_plane(self, z: Array, latent_dim: int,
                            which_dims=None, z_fixed=None) -> Array:
        """Embed 2-D latent-grid points ``z [n, 2]`` into the model's
        ``latent_dim``-D content space for ``manifold2d``.

        The reference only supports ``latent_dim == 2`` (``manifold2d``
        crashes otherwise, ``ivae.py:277-310``); this extension sweeps the
        plane over ``which_dims`` (default the first two) with the
        remaining dimensions pinned to ``z_fixed`` (default zeros)."""
        if latent_dim == 2 and which_dims is None and z_fixed is None:
            return z
        wd = tuple(int(w) for w in (which_dims if which_dims is not None
                                    else (0, 1)))
        if (len(wd) != 2 or wd[0] == wd[1]
                or not all(0 <= w < latent_dim for w in wd)):
            raise ValueError(
                f"which_dims must be two distinct indices < {latent_dim}, "
                f"got {wd}")
        if z_fixed is None:
            base = jnp.zeros((latent_dim,), jnp.float32)
        else:
            base = self._as_f32(z_fixed).reshape(-1)
            if base.shape[0] != latent_dim:
                raise ValueError(
                    f"z_fixed must have length {latent_dim}, got {base.shape[0]}")
        full = jnp.broadcast_to(base, (z.shape[0], latent_dim))
        return full.at[:, wd[0]].set(z[:, 0]).at[:, wd[1]].set(z[:, 1])

    def transformed_grid(self, z: Array) -> Tuple[Optional[Array], Array]:
        """Apply the latent-derived affine transform to the coordinate grid.

        Returns ``(coords, z_content)`` where coords is
        ``[..., N, grid_dim]`` (None when the model has no invariances).
        Mirrors the model-side hot path at ``models/ivae.py:184-192``.
        """
        if self.coord == 0:
            return None, z
        phi, dx, sc, z = self.split_latent_full(z)
        dx = dx[..., None, :]  # add the grid-point axis: [..., 1, D]
        grid = jnp.broadcast_to(self.grid, z.shape[:-1] + self.grid.shape)
        coords = transform_coordinates(grid, phi, dx, sc)
        return coords, z

    def fixed_transform_grid(self, **kwargs) -> Optional[Array]:
        """Grid under a user-fixed angle/shift/scale (generation path,
        reference ``base.py:157-165``)."""
        if self.coord == 0:
            return None
        a = jnp.asarray(kwargs.get("angle", 0.0), jnp.float32)
        t = jnp.asarray(kwargs.get("shift", 0.0), jnp.float32)
        s = jnp.asarray(kwargs.get("scale", 1.0), jnp.float32)
        coords = transform_coordinates(self.grid[None], a[None], t, s[None])
        return coords[0]

    # ------------------------------------------------------------------
    # Pixel-axis partitioned reconstruction (training path)
    # ------------------------------------------------------------------
    def _pixel_mode(self) -> Optional[str]:
        """Active pixel-partitioning mode for the training-path recon:
        'shard' (mesh axis via :func:`parallel.spatial.shard_pixels`),
        'chunk' (in-device ``lax.scan`` over grid tiles, ``pixel_chunks=k``),
        or None (the default full-grid paths)."""
        if getattr(self, "_pixel_mesh", None) is not None:
            return "shard"
        if int(getattr(self, "pixel_chunks", 0) or 0) > 1:
            return "chunk"
        return None

    def _pixel_gate_key(self):
        """Hashable key for the trainers' rebuild gate: the pixel mode is a
        Python attribute the jit cache cannot see, so flipping it after a
        trainer compiled (``shard_pixels(model, mesh)`` / ``(model, None)``
        / ``model.pixel_chunks = k``) must retrace the step functions —
        the same staleness rule as an ``enum_topk`` estimator flip."""
        mesh = getattr(self, "_pixel_mesh", None)
        return (self._pixel_mode(),
                getattr(self, "_pixel_axis", None),
                None if mesh is None else id(mesh),
                int(getattr(self, "pixel_chunks", 0) or 0))

    def _tile_loc_dec(self, dec_params, grid_t: Array, phi, dx, sc,
                      zc: Array) -> Array:
        """Training-path spatial decode against an arbitrary grid slice
        ``grid_t [n, D]``, routed fused/XLA with the same shape-aware gate
        as the full-grid loss path (per-tile ``n`` feeds the gate).
        Takes the decoder param SUBTREE so it can run inside ``shard_map``
        bodies as well as the chunked scan."""
        rows = int(np.prod(zc.shape[:-1]))
        if getattr(self, "_fused", False):
            from ..ops.spatial_decoder import (apply_fused_sdecoder,
                                               fused_profitable)
            if fused_profitable(rows, int(grid_t.shape[0]), self._dec_hmax):
                return apply_fused_sdecoder(
                    dec_params, grid_t, phi, dx, sc, zc,
                    self._dec_act, self._dec_sig)
        coords = transform_coordinates(
            jnp.broadcast_to(grid_t, zc.shape[:-1] + grid_t.shape),
            phi, dx[..., None, :], sc)
        return self.decoder_net.apply({"params": dec_params}, coords, zc)

    def _tile_loc(self, params, grid_t: Array, phi, dx, sc, zc: Array) -> Array:
        return self._tile_loc_dec(params["decoder"], grid_t, phi, dx, sc, zc)

    def _padded_pixel_arrays(self, xp: Array, multiple: int):
        """Zero-pad the grid, a pixel mask, and the per-pixel observations
        so the pixel count divides ``multiple``. ``xp`` is
        ``[batch..., N]`` (C == 1) or ``[batch..., N, C]``."""
        N, D = self.grid.shape
        pad = (-N) % multiple
        grid = self.grid
        mask = jnp.ones((N,), jnp.float32)
        if pad:
            grid = jnp.concatenate([grid, jnp.zeros((pad, D), grid.dtype)])
            mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
            pix_ax = -1 if self.channels == 1 else -2
            widths = [(0, 0)] * xp.ndim
            widths[pix_ax] = (0, pad)
            xp = jnp.pad(xp, widths)
        return grid, mask, xp

    def _recon_pixel_parallel(self, params, phi, dx, sc, zc: Array,
                              xf: Array) -> Array:
        """Reconstruction term ``log p(x | decode(z))`` summed over pixels,
        with the PIXEL axis partitioned (see :meth:`_pixel_mode`). Exact:
        the observation log-density factorizes over pixels, so partial
        per-tile/per-shard sums reproduce the full-grid term.

        ``xf`` is ``[..., N*C]`` observations broadcastable to ``zc``'s
        batch dims (particle/enumeration axes included); returns
        ``[batch...]``."""
        C = self.channels
        N = self.grid.shape[0]
        batch = zc.shape[:-1]
        xf = jnp.broadcast_to(xf, batch + xf.shape[-1:])
        xp = xf.reshape(batch + ((N, C) if C > 1 else (N,)))
        if self._pixel_mode() == "shard":
            return self._recon_pixel_sharded(params, phi, dx, sc, zc, xp)
        return self._recon_pixel_chunked(params, phi, dx, sc, zc, xp)

    def _recon_pixel_chunked(self, params, phi, dx, sc, zc, xp) -> Array:
        """In-device pixel chunking: ``lax.scan`` over ``pixel_chunks`` grid
        tiles with the tile body rematerialized (``jax.checkpoint``), so the
        backward pass holds ONE tile's ``[B, N/k, H]`` activations at a time
        instead of the full ``[B, N, H]`` working set."""
        k = int(self.pixel_chunks)
        C = self.channels
        grid, mask, xp = self._padded_pixel_arrays(xp, k)
        D = grid.shape[1]
        tile = grid.shape[0] // k
        grids = grid.reshape(k, tile, D)
        masks = mask.reshape(k, tile)
        batch = zc.shape[:-1]
        # chunk axis to the front for the scan: [k, batch..., tile(, C)]
        if C == 1:
            xt = jnp.moveaxis(xp.reshape(batch + (k, tile)), -2, 0)
        else:
            xt = jnp.moveaxis(xp.reshape(batch + (k, tile, C)), -3, 0)

        def tile_recon(grid_t, x_t, m_t):
            loc = self._tile_loc(params, grid_t, phi, dx, sc, zc)
            lp = self.sampler_d.log_prob(x_t, loc)
            if C > 1:
                lp = jnp.sum(lp, axis=-1)
            return jnp.sum(lp * m_t, axis=-1)

        tile_recon = jax.checkpoint(tile_recon)

        def body(acc, inp):
            g, x, m = inp
            return acc + tile_recon(g, x, m), None

        init = jnp.zeros(batch, xp.dtype if jnp.issubdtype(xp.dtype, jnp.floating)
                         else jnp.float32)
        recon, _ = jax.lax.scan(body, init, (grids, xt, masks))
        return recon

    def _recon_pixel_sharded(self, params, phi, dx, sc, zc, xp) -> Array:
        """Pixel-SHARDED recon: ``shard_map`` over the mesh axis set by
        :func:`parallel.spatial.shard_pixels`. Each device decodes its grid
        shard (pixels are independent given z — no ring communication), the
        per-example partial log-probs ``psum`` over the axis, and the
        transpose rule psums the replicated decoder-weight grads — the
        sequence-parallel training step for this model family."""
        from jax.sharding import PartitionSpec as P
        mesh, axis = self._pixel_mesh, self._pixel_axis
        C = self.channels
        grid, mask, xp = self._padded_pixel_arrays(xp, int(mesh.shape[axis]))
        batch = zc.shape[:-1]
        nb = len(batch)
        x_spec = P(*([None] * nb), axis, *([None] if C > 1 else []))
        rep = P()

        def local(grid_s, m_s, x_s, phi, dx, sc, zc, dec):
            # per-shard decode routes through the SAME fused/XLA gate as
            # every other training path (Pallas inside shard_map runs
            # per-device on TPU; the per-shard pixel count feeds the gate)
            loc = self._tile_loc_dec(dec, grid_s, phi, dx, sc, zc)
            lp = self.sampler_d.log_prob(x_s, loc)
            if C > 1:
                lp = jnp.sum(lp, axis=-1)
            return jax.lax.psum(jnp.sum(lp * m_s, axis=-1), axis)

        # check_vma=False: the per-shard decode may route to the Pallas
        # kernel, whose pallas_call out_shapes don't carry the varying-
        # mesh-axes annotation JAX's rep checker wants; the psum above
        # makes the output genuinely replicated either way.
        f = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None), P(axis), x_spec, rep, rep, rep, rep, rep),
            out_specs=rep, check_vma=False)
        return f(grid, mask, xp, phi, dx, sc, zc, params["decoder"])

    # ------------------------------------------------------------------
    # Multi-sample ELBO (Pyro Trace_ELBO num_particles analog)
    # ------------------------------------------------------------------
    def _particle_loss(self, single_fn, params, rng: Array, batch, beta) -> Array:
        """Average ``num_particles`` independent single-sample ELBO estimates
        per example by tiling the batch P-fold (fresh latent noise per tile;
        one batched decode, no Python loop). Returns per-example [B]."""
        P = int(getattr(self, "num_particles", 1))
        if P <= 1:
            return single_fn(params, rng, batch, beta)
        B = batch[0].shape[0]
        tiled = tuple(
            jnp.broadcast_to(a, (P,) + a.shape).reshape((P * B,) + a.shape[1:])
            for a in batch)
        per = single_fn(params, rng, tiled, beta)
        return per.reshape(P, B).mean(0)

    # ------------------------------------------------------------------
    # Shared decoder machinery
    # ------------------------------------------------------------------
    def _setup_fusion(self, hidden_dim_d, activation: str, sigmoid_d: bool,
                      kwargs) -> None:
        """Decide whether the fused Pallas transform+decode kernel applies
        (TPU + supported sDecoderNet config; ``fused=False`` opts out)."""
        from ..ops.spatial_decoder import sdecoder_supports_fusion
        self._fused = (bool(kwargs.get("fused", True))
                       and sdecoder_supports_fusion(
                           hidden_dim_d, activation, sigmoid_d, self.coord,
                           getattr(self, "channels", 1)))
        from ..ops.spatial_decoder import _round_up
        hidden = (tuple(hidden_dim_d) if hidden_dim_d is not None
                  else (128, 128))  # sDecoderNet default (nets/fc.py)
        self._dec_hmax = _round_up(max(hidden), 128)
        self._dec_act = activation
        self._dec_sig = bool(sigmoid_d)
        # Opt-in speed lever for the tanh-throughput-bound step: evaluate the
        # kernel's tanh as a 7/6 Pade approximant (max abs err < 2e-4)
        # instead of the microcoded transcendental. Training quality is
        # unaffected within that tolerance; off by default for strict parity.
        if kwargs.get("approx_tanh") and activation == "tanh" and self._fused:
            self._dec_act = "tanh_approx"

    def _fused_for_batch(self, rows: int) -> bool:
        """Shape-aware fusion decision for a train-path decode of ``rows``
        latent rows (batch, incl. particle/enumeration axes): the fused
        Pallas train path only pays off once the [rows*N, H] activation
        working set crosses XLA's fusion cliff (``FUSED_MIN_BNH``,
        measured — below it XLA's own fused autodiff is faster)."""
        if not getattr(self, "_fused", False):
            return False
        from ..ops.spatial_decoder import fused_profitable
        n = self.grid.shape[0] if self.grid is not None else 0
        return fused_profitable(int(rows), int(n), self._dec_hmax)

    def sync_fusion_gate(self, params=None) -> bool:
        """Re-check the fused-kernel gate against CONCRETE parameters.

        The fused Pallas kernel loads the full decoder weight stack into
        VMEM, so it requires fully-replicated decoder params; under tensor
        parallelism (kernels sharded over a 'model' axis) it must fall back
        to the XLA path. Trainers call this right before compiling — no
        manual ``fused=False`` needed. Returns the (possibly updated) gate.
        """
        if not getattr(self, "_fused", False):
            return False
        params = self.params if params is None else params
        dec = params.get("decoder") if hasattr(params, "get") else None
        if dec is not None:
            for leaf in jax.tree_util.tree_leaves(dec):
                sharding = getattr(leaf, "sharding", None)
                if sharding is not None and not sharding.is_fully_replicated:
                    import warnings
                    warnings.warn(
                        "decoder parameters are sharded across the mesh; "
                        "disabling the fused spatial-decoder kernel (it needs "
                        "replicated decoder weights). Training continues on "
                        "the XLA path.", stacklevel=2)
                    self._fused = False
                    break
        return self._fused

    def _build_decode_jit(self):
        """Jitted generation-path decoder apply: spatial decoders take
        (coords, z) with the grid broadcast over the batch; plain decoders
        take (z,) and ignore the coords argument."""
        if self.coord > 0:
            return jax.jit(
                lambda p, coords, zz: self.decoder_net.apply(
                    {"params": p["decoder"]},
                    jnp.broadcast_to(coords, (zz.shape[0],) + coords.shape), zz))
        return jax.jit(
            lambda p, coords, zz: self.decoder_net.apply(
                {"params": p["decoder"]}, zz))

    def _decode_loc(self, z: Array, coords, **kwargs) -> Array:
        """Run the jitted generation decoder, chunking over ``batch_size``
        when given (bounds device memory for very large latent batches,
        mirroring the reference's loader-batched ``_decode``,
        ``base.py:145-171``)."""
        if self._decode_jit is None:
            self._decode_jit = self._build_decode_jit()
        bs = kwargs.get("batch_size")
        if bs and z.shape[0] > bs:
            return self._chunked(lambda p, zz: self._decode_jit(p, coords, zz),
                                 z, batch_size=bs)
        return self._decode_jit(self.params, coords, z)

    # ------------------------------------------------------------------
    # Batched inference / generation
    # ------------------------------------------------------------------
    def _chunked(self, fn, *arrays, batch_size: int = 100):
        """Apply a jitted function over fixed-size chunks and concatenate
        host-side results. EVERY chunk (including a lone short input) is
        zero-padded to exactly ``batch_size``, so ``fn`` compiles once per
        (fn, batch_size) pair regardless of the input length."""
        n = arrays[0].shape[0]
        outs = []
        for start in range(0, n, batch_size):
            chunk = [a[start:start + batch_size] for a in arrays]
            pad = batch_size - chunk[0].shape[0]
            if pad:
                chunk = [jnp.concatenate([c, jnp.zeros((pad,) + c.shape[1:], c.dtype)])
                         for c in chunk]
            res = fn(self.params, *chunk)
            if pad:
                res = jax.tree_util.tree_map(lambda r: r[: batch_size - pad], res)
            outs.append(res)
        if len(outs) == 1:
            return outs[0]
        return jax.tree_util.tree_map(lambda *rs: jnp.concatenate(rs), *outs)

    # ------------------------------------------------------------------
    # One-call training convenience (north-star API; the reference leaves
    # the epoch loop to the user, models/ivae.py:96-102)
    # ------------------------------------------------------------------
    @staticmethod
    def _check_data_scale(X, data_scale):
        """Reject raw integer signal data unless ``data_scale`` says how to
        normalize it — training a bernoulli/continuous-bernoulli sampler on
        0..255 values silently diverges, so make the fix discoverable."""
        import numpy as _np
        if data_scale is not None:
            return  # scaled explicitly: nothing to guard (and no asarray
            # materialization of list inputs on the fit hot path)
        dt = getattr(X, "dtype", None)
        if dt is None:
            # dtype-less inputs (Python lists of ints, nested sequences)
            # materialize exactly as the DataLoader will see them, so raw
            # integers cannot sneak past the guard in list form
            try:
                dt = _np.asarray(X).dtype
            except Exception:
                return
        if _np.issubdtype(_np.dtype(dt), _np.integer):
            raise ValueError(
                f"fit() got integer data (dtype {dt}) without data_scale=. "
                "The decoder samplers expect normalized floats; pass e.g. "
                "data_scale=1/255. to train on raw uint8 directly (kept "
                "uint8 on device, normalized inside the training scan), or "
                "pre-convert X yourself.")

    def fit(self, X, y=None, epochs: int = 100, batch_size: int = 100,
            lr: float = 1e-3, scale_factor=1.0, test_data=None,
            verbose: bool = False, trainer=None, patience=None,
            min_delta: float = 0.0, on_segment=None, data_scale=None,
            **kwargs):
        """Train this model for ``epochs`` epochs and return the trainer
        (its ``loss_history`` holds the per-epoch losses).

        ``X`` may be an array or an existing DataLoader; ``y`` adds labels /
        targets (conditional iVAE, VED pairs). Semi-supervised models
        override this with the (unlabeled, labeled, validation) signature.
        ``patience=P`` (requires ``test_data=``) stops training once the
        held-out loss has not improved by more than ``min_delta`` for ``P``
        epochs (``trainer.stopped_early`` records whether it fired).
        ``data_scale=s`` keeps narrow-dtype ``X`` (e.g. raw uint8 images)
        in its compact dtype on device and normalizes each batch by ``s``
        inside the training scan — ``data_scale=1/255.`` trains on raw
        uint8 identically to pre-divided float input at 1/4 the HBM
        footprint. A scalar scales ``X`` only; pass a tuple to also scale
        ``y``. Integer ``X`` without ``data_scale`` is rejected (the
        samplers expect normalized floats).
        """
        from ..trainers.svi import SVItrainer
        from ..utils.data import DataLoader, init_dataloader
        # enum_schedule=E (discrete-latent models with enum_topk): exact
        # enumeration for the first E epochs, then the configured top-k
        # truncation — most of truncation's speedup without its
        # early-training bias (trainers/_segmented.py _run_enum_schedule).
        enum_schedule = kwargs.pop("enum_schedule", None)
        if isinstance(X, DataLoader):
            loader = X
        else:
            self._check_data_scale(X, data_scale)
            arrays = (X,) if y is None else (X, y)
            loader = init_dataloader(*arrays, batch_size=batch_size,
                                     scale=data_scale)
        test_loader = None
        if test_data is not None:
            if isinstance(test_data, DataLoader):
                test_loader = test_data
            else:
                tarrs = (test_data if isinstance(test_data, tuple)
                         else (test_data,))
                # held-out data gets the same raw-integer guard as X: a
                # uint8 test set with data_scale=None would silently score
                # the held-out loss on 0..255 values and skew early stopping
                self._check_data_scale(tarrs[0], data_scale)
                test_loader = init_dataloader(*tarrs, batch_size=batch_size,
                                              scale=data_scale)
        if trainer is not None and kwargs:
            raise ValueError(
                "fit() got both an explicit trainer= and trainer-level "
                f"kwargs {sorted(kwargs)}; configure them on the trainer "
                "you pass, or drop trainer= to have fit() build one.")
        trainer = trainer or SVItrainer(self, lr=lr, **kwargs)
        # Fused multi-epoch path (one device dispatch for the whole run)
        # whenever per-epoch host work isn't required. For SVItrainer that
        # now includes test sets (run(test_loader=) evaluates inside the
        # dispatch), JSONL logging, and auto-checkpointing (run() splits
        # into fused segments); custom trainers keep the conservative
        # gating — only verbose needs the step() loop here.
        fused_run = (not verbose and hasattr(trainer, "run")
                     and (isinstance(trainer, SVItrainer)
                          or (test_loader is None
                              and getattr(trainer, "log_file", None) is None
                              and getattr(trainer, "checkpoint_path", None)
                              is None)))
        if patience is not None and test_loader is None:
            raise ValueError("fit(patience=) needs test_data= to monitor")
        if fused_run:
            run_kwargs = {} if test_loader is None else {"test_loader": test_loader}
            if patience is not None:
                run_kwargs.update(patience=patience, min_delta=min_delta)
            if on_segment is not None:
                run_kwargs.update(on_segment=on_segment)
            if enum_schedule is not None:
                run_kwargs.update(enum_schedule=enum_schedule)
            trainer.run(loader, int(epochs), scale_factor=scale_factor,
                        **run_kwargs)
            return trainer
        if enum_schedule is not None:
            raise ValueError(
                "enum_schedule= rides the fused run path; it is not "
                "supported with verbose=True or custom trainers lacking "
                "run() — call trainer.run(..., enum_schedule=E) directly.")
        if hasattr(trainer, "stopped_early"):
            trainer.stopped_early = False  # same reset contract as run()
        best, best_epoch = float("inf"), trainer.current_epoch
        for _ in range(int(epochs)):
            trainer.step(loader, test_loader, scale_factor=scale_factor)
            if verbose:
                trainer.print_statistics()
            if on_segment is not None:
                rec = {"epoch": trainer.current_epoch,
                       "training_loss":
                           trainer.loss_history["training_loss"][-1]}
                if test_loader is not None:
                    rec["test_loss"] = trainer.loss_history["test_loss"][-1]
                on_segment([rec])
            if patience is not None:
                v = trainer.loss_history["test_loss"][-1]
                if v < best - min_delta:
                    best, best_epoch = v, trainer.current_epoch
                trainer.best_epoch, trainer.best_metric = best_epoch, best
                if trainer.current_epoch - best_epoch >= int(patience):
                    trainer.stopped_early = True
                    break
        return trainer

    # ------------------------------------------------------------------
    # Custom network injection (reference base.py:173-181)
    # ------------------------------------------------------------------
    def set_encoder(self, encoder_net) -> None:
        """Replace the inference network with a user-defined linen module;
        its parameters are freshly initialized with the model's PRNG."""
        self.encoder_net = encoder_net
        flat = int(np.prod(self.out_shape))
        x0 = jnp.zeros((1, flat), jnp.float32)
        try:
            variables = encoder_net.init(self.next_rng(), x0)
        except TypeError:  # conditional encoders take (x, y)
            c = getattr(self, "c_dim", 0) or getattr(self, "num_classes", 0) \
                or getattr(self, "reg_dim", 0)
            variables = encoder_net.init(
                self.next_rng(), x0, jnp.zeros((1, c), jnp.float32))
        self.params["encoder_z"] = variables["params"]
        self._encode_jit = None

    def set_decoder(self, decoder_net) -> None:
        """Replace the generator network with a user-defined linen module;
        disables the fused-kernel path (its layout is sDecoderNet-specific)."""
        self.decoder_net = decoder_net
        zc0 = jnp.zeros(
            (1, self.z_dim - self.coord + getattr(self, "c_dim", 0)
             + getattr(self, "num_classes", 0) + getattr(self, "reg_dim", 0)
             + getattr(self, "discrete_dim", 0)), jnp.float32)
        try:  # spatial decoders take (coords, z); plain decoders take (z,)
            variables = decoder_net.init(self.next_rng(), self.grid[None], zc0)
        except TypeError:
            variables = decoder_net.init(self.next_rng(), zc0)
        self.params["decoder"] = variables["params"]
        self._fused = False
        self._decode_jit = None

    # ------------------------------------------------------------------
    # Weight persistence (params + rng), reference base.py:183-192
    # ------------------------------------------------------------------
    def save_weights(self, filepath: str) -> None:
        """Serializes the model parameter pytree to ``filepath + '.pvt'``.

        The payload is a ``np.savez`` archive of a flax msgpack byte-string
        plus the PRNG key — no pickling, so loading an untrusted file cannot
        execute code (unlike ``torch.load`` pre-``weights_only``)."""
        arrays = {"params": np.frombuffer(
            flax.serialization.to_bytes(jax.device_get(self.params)), np.uint8)}
        if self.rng is not None:
            arrays["rng"] = np.asarray(jax.device_get(self.rng))
        with open(filepath + ".pvt", "wb") as f:
            np.savez(f, **arrays)

    def load_weights(self, filepath: str) -> None:
        """Loads parameters saved by :meth:`save_weights` (pickle-free)."""
        if not filepath.endswith(".pvt"):
            filepath = filepath + ".pvt"
        with np.load(filepath, allow_pickle=False) as payload:
            self.params = flax.serialization.from_bytes(
                self.params, payload["params"].tobytes())
            if "rng" in payload:
                self.rng = jnp.asarray(payload["rng"])

    def load_torch_weights(self, source, strict: bool = True):
        """Loads weights trained with the reference pyroVED (a ``.pt`` file
        from its ``save_weights``, or a torch ``state_dict``), converting
        torch layouts to this framework's (see :mod:`pyroved_tpu.interop`)."""
        from ..interop import load_torch_weights
        return load_torch_weights(self, source, strict=strict)

    # Convenience used by several public APIs
    @staticmethod
    def _as_f32(x) -> Array:
        return jnp.asarray(as_numpy(x), jnp.float32)
