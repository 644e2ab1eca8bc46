"""Stochastic variational inference trainer.

TPU-native rebuild of the reference ``SVItrainer``
(``pyroved/trainers/svi.py:11-175``) with the same public surface
(``train`` / ``evaluate`` / ``step`` / ``print_statistics`` /
``loss_history``; losses normalized by dataset size, ``svi.py:115``) and a
very different execution model:

* The reference dispatches one ``svi.step`` per mini-batch from Python with
  a H2D copy each time (``svi.py:104-111``). Here the WHOLE EPOCH is a single
  jit-compiled ``lax.scan`` over batch indices against the device-resident
  dataset: one host->device dispatch per epoch, zero per-batch copies, and
  XLA pipelines the gather + forward + backward + Adam update.
* Optimization is ``optax.adam(lr=1e-3)`` (reference default, ``svi.py:80``)
  acting on the model's parameter pytree.
* Discrete-latent models carry their own exact enumeration inside
  ``loss_fn`` (replacing ``TraceEnum_ELBO``), so ``enumerate_parallel`` is
  accepted for API parity but changes nothing.
* ``evaluate`` computes the loss WITHOUT touching parameters — fixing the
  reference quirk where eval re-used ``svi.step`` under ``no_grad``
  (``svi.py:117-137``).

Pass ``mesh=jax.sharding.Mesh(...)`` to shard each batch over the mesh's
``'data'`` axis: XLA then partitions the step and inserts the gradient
all-reduce over ICI automatically.
"""
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils.data import DataLoader, apply_batch_scale
from ._segmented import PIPELINE_SEGMENT, SegmentedRunsMixin  # noqa: F401 — PIPELINE_SEGMENT re-exported for back-compat

Array = jax.Array


class _PendingLoss:
    """A queued epoch loss from ``step(sync=False)``: holds the 0-d device
    total (still materializing asynchronously) plus the host normalizer.
    ``float()`` blocks on the device value and performs the SAME float64
    host division as the sync path, so materialized values are bitwise
    identical to ``sync=True`` ones (an on-device f32 division can differ
    in the last ulp whenever the normalizer is not a power of two)."""
    __slots__ = ("total", "norm")

    def __init__(self, total, norm):
        self.total, self.norm = total, norm

    def __float__(self):
        return float(self.total) / self.norm

    def __repr__(self):
        return f"_PendingLoss(norm={self.norm})"


def _prep_beta(model, scale_factor) -> Array:
    prep = getattr(model, "prep_beta", None)
    if prep is not None:
        return prep(scale_factor)
    return jnp.asarray(scale_factor, jnp.float32)


class SVItrainer(SegmentedRunsMixin):
    """Epoch-level SVI trainer for one-encoder/one-decoder models.

    Args:
        model: initialized pyroved_tpu model exposing ``params`` and
            ``loss_fn(params, rng, batch, beta) -> [B]`` per-example -ELBO.
        optimizer: optax gradient transformation (default ``adam(lr)``).
        enumerate_parallel: accepted for reference API parity; enumeration
            is built into the discrete models' loss functions here.
        seed: PRNG seed for latent sampling during training.
        lr: learning rate for the default optimizer (default 1e-3).
        mesh: optional ``jax.sharding.Mesh`` with a ``'data'`` axis for
            data-parallel training.
        grad_accum: accumulate (average) gradients over this many
            consecutive batches and apply ONE optimizer update
            (``optax.MultiSteps``) — an effective batch of
            ``grad_accum * batch_size`` examples without their activations
            ever being resident at once. Composes with the scan epochs, the
            fused multi-epoch ``run()``, mesh DP, and checkpointing (the
            accumulator lives inside ``opt_state``). Accumulation carries
            across epoch boundaries when ``num_batches`` is not a multiple
            of ``grad_accum``.
    """

    def __init__(self, model, optimizer: Optional[optax.GradientTransformation] = None,
                 loss=None, enumerate_parallel: bool = False, seed: int = 1,
                 **kwargs):
        del enumerate_parallel  # parity-only: enumeration lives in loss_fn
        if loss is not None:  # infer.TraceELBO(num_particles=, kl=)
            loss.configure(model)
        self.model = model
        lr = kwargs.get("lr", 1e-3)
        base_opt = optimizer if optimizer is not None else optax.adam(lr)
        self.grad_accum = int(kwargs.get("grad_accum", 1))
        if self.grad_accum > 1:
            base_opt = optax.MultiSteps(base_opt,
                                        every_k_schedule=self.grad_accum)
        self.optimizer = base_opt
        self.opt_state = self.optimizer.init(model.params)
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = kwargs.get("mesh")
        # Crash recovery: checkpoint the FULL training state every
        # checkpoint_every epochs (reference training loses everything on a
        # crash — user-owned loops, SURVEY.md section 5).
        self.checkpoint_path = kwargs.get("checkpoint_path")
        self.checkpoint_every = int(kwargs.get("checkpoint_every", 10))
        # Observability: append one JSONL record per epoch when set.
        self.log_file = kwargs.get("log_file")
        # remat=True rematerializes the loss forward pass in the backward
        # (jax.checkpoint): trades FLOPs for activation memory — for large
        # grids / batches that would otherwise exceed HBM.
        self.remat = bool(kwargs.get("remat", False))
        self.loss_history = {"training_loss": [], "test_loss": []}
        self.epoch_times = []
        self.current_epoch = 0
        # step(sync=False) support: JSONL records deferred until the losses
        # they reference have been materialized by sync_history().
        self._deferred_records = []
        self.stopped_early = False
        self.best_epoch = None   # set by patience= runs
        self.best_metric = None
        self._train_epoch_jit = None
        self._eval_epoch_jit = None
        self._run_epochs_eval_jit = None

    # ------------------------------------------------------------------
    def _constrain(self, tree):
        if self.mesh is None:
            return tree
        sharding = NamedSharding(self.mesh, P("data"))
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, sharding), tree)

    def _compiled_attrs(self):
        """Everything :meth:`_build_epoch_fns` produces — the swap unit for
        ``_swap_compiled_variant`` (estimator-flip caching)."""
        return ("_train_epoch_jit", "_run_epochs_eval_jit", "_run_epochs_jit",
                "_eval_epoch_jit", "_train_step_jit", "_eval_step_jit",
                "_built_gate")

    def _invalidate_compiled(self):
        """Force a rebuild of the jitted epoch/step functions (the model's
        loss routing changed under us — e.g. an ``enum_schedule`` estimator
        flip, which is a Python attribute the jit cache cannot see)."""
        self._train_epoch_jit = None

    def _ensure_built(self):
        """(Re)compile the jitted epoch functions when needed.

        Re-checks the fused-kernel gate on EVERY ``train``/``run``/
        ``evaluate`` entry (not only first compile): if the model's decoder
        params were re-sharded after the last build (e.g. TP over a 'model'
        axis), the gate flips and everything is retraced against the new
        routing instead of replaying a stale fused step."""
        gate = getattr(self.model, "sync_fusion_gate", None)
        pkey = getattr(self.model, "_pixel_gate_key", None)
        g = (gate() if gate is not None else None,
             pkey() if pkey is not None else None)
        if self._train_epoch_jit is None or g != getattr(self, "_built_gate", None):
            self._build_epoch_fns()
            self._built_gate = g

    def _build_epoch_fns(self):
        # Re-check the fused-kernel gate against the CONCRETE params about to
        # be compiled: TP-sharded decoder weights auto-fall-back to XLA.
        gate = getattr(self.model, "sync_fusion_gate", None)
        if gate is not None:
            gate()
        loss_fn = self.model.loss_fn
        weighted = getattr(self.model, "weighted_loss_fn", None)
        if self.remat:
            loss_fn = jax.checkpoint(loss_fn, static_argnums=())
            weighted = None  # remat composes with the generic path only
        optimizer = self.optimizer

        if weighted is not None:
            batch_loss = weighted  # (params, rng, batch, weights, beta)
        else:
            def batch_loss(params, rng, batch, weights, beta):
                return jnp.sum(loss_fn(params, rng, batch, beta) * weights)

        def train_epoch(params, opt_state, rng, arrays, idx, w, beta,
                        scales=None):
            def body(carry, inp):
                params, opt_state = carry
                bidx, bw, step = inp
                batch = tuple(jnp.take(a, bidx, axis=0) for a in arrays)
                batch = apply_batch_scale(batch, scales)
                batch = self._constrain(batch)
                bw = self._constrain(bw)
                step_rng = jax.random.fold_in(rng, step)
                loss, grads = jax.value_and_grad(batch_loss)(
                    params, step_rng, batch, bw, beta)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            steps = jnp.arange(idx.shape[0])
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx, w, steps))
            return params, opt_state, jnp.sum(losses)

        def eval_epoch(params, rng, arrays, idx, w, beta, scales=None):
            def body(_, inp):
                bidx, bw, step = inp
                batch = tuple(jnp.take(a, bidx, axis=0) for a in arrays)
                batch = apply_batch_scale(batch, scales)
                batch = self._constrain(batch)
                step_rng = jax.random.fold_in(rng, step)
                return None, batch_loss(params, step_rng, batch, self._constrain(bw), beta)

            steps = jnp.arange(idx.shape[0])
            _, losses = jax.lax.scan(body, None, (idx, w, steps))
            return jnp.sum(losses)

        def train_step(params, opt_state, rng, batch, weights, beta):
            loss, grads = jax.value_and_grad(batch_loss)(
                params, rng, self._constrain(batch), self._constrain(weights), beta)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def run_epochs(params, opt_state, arrays, idx, w, keys, within, betas,
                       scales=None):
            # Multi-epoch fused path: ONE lax.scan over every step of every
            # epoch — a single device dispatch and a single host sync for
            # the whole run. Profiling shows the per-epoch dispatch + sync
            # costs ~45% of wall time on this epoch size (42 ms device vs
            # 75 ms wall), so fusing epochs recovers most of it. `betas` is
            # per-STEP (the per-epoch scale_schedule repeated), so KL
            # annealing runs inside the fused scan too.
            def body(carry, inp):
                params, opt_state = carry
                bidx, bw, key, wstep, beta = inp
                batch = tuple(jnp.take(a, bidx, axis=0) for a in arrays)
                batch = apply_batch_scale(batch, scales)
                batch = self._constrain(batch)
                bw = self._constrain(bw)
                step_rng = jax.random.fold_in(key, wstep)
                loss, grads = jax.value_and_grad(batch_loss)(
                    params, step_rng, batch, bw, beta)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx, w, keys, within, betas))
            return params, opt_state, losses

        def run_epochs_eval(params, opt_state, arrays, idx, w, keys, betas,
                            tarrays, tidx, tw, tkeys, scales=None,
                            tscales=None):
            # run_epochs + a per-epoch held-out evaluation INSIDE the fused
            # dispatch: scan over epochs, inner scans over train steps and
            # test batches. Keeps fit(test_data=...) on the single-dispatch
            # path instead of the ~2x slower per-epoch step()/evaluate()
            # loop. idx/w [E, nb, B]; keys/tkeys [E] PRNG keys (the same
            # split order as sequential step(train, test)); betas [E, ...];
            # tidx/tw [E, tnb, TB] pre-drawn test-epoch indices.
            steps = jnp.arange(idx.shape[1])
            tsteps = jnp.arange(tidx.shape[1])

            def epoch_body(carry, inp):
                params, opt_state = carry
                eidx, ew, key, beta, etidx, etw, tkey = inp

                def body(carry, binp):
                    params, opt_state = carry
                    bidx, bw, step = binp
                    batch = tuple(jnp.take(a, bidx, axis=0) for a in arrays)
                    batch = apply_batch_scale(batch, scales)
                    batch = self._constrain(batch)
                    bw = self._constrain(bw)
                    step_rng = jax.random.fold_in(key, step)
                    loss, grads = jax.value_and_grad(batch_loss)(
                        params, step_rng, batch, bw, beta)
                    updates, opt_state = optimizer.update(
                        grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), (eidx, ew, steps))

                def ebody(_, binp):
                    bidx, bw, step = binp
                    batch = tuple(jnp.take(a, bidx, axis=0) for a in tarrays)
                    batch = apply_batch_scale(batch, tscales)
                    batch = self._constrain(batch)
                    return None, batch_loss(
                        params, jax.random.fold_in(tkey, step), batch,
                        self._constrain(bw), beta)

                _, tlosses = jax.lax.scan(ebody, None, (etidx, etw, tsteps))
                return (params, opt_state), (jnp.sum(losses),
                                             jnp.sum(tlosses))

            (params, opt_state), (tr, te) = jax.lax.scan(
                epoch_body, (params, opt_state),
                (idx, w, keys, betas, tidx, tw, tkeys))
            return params, opt_state, tr, te

        # `scales` / `tscales` are the loaders' scale tuples (hashable),
        # static so narrow-dtype residency recompiles per normalization
        self._train_epoch_jit = jax.jit(train_epoch, donate_argnums=(0, 1),
                                        static_argnames=("scales",))
        self._run_epochs_eval_jit = jax.jit(
            run_epochs_eval, donate_argnums=(0, 1),
            static_argnames=("scales", "tscales"))
        self._run_epochs_jit = jax.jit(run_epochs, donate_argnums=(0, 1),
                                       static_argnames=("scales",))
        self._eval_epoch_jit = jax.jit(eval_epoch,
                                       static_argnames=("scales",))
        self._train_step_jit = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step_jit = jax.jit(batch_loss)

    @staticmethod
    def _pad_batch(batch, batch_size):
        """Pad a short final batch to the full batch size with zero weights."""
        n = batch[0].shape[0]
        weights = jnp.ones(batch_size, jnp.float32)
        if n == batch_size:
            return batch, weights
        weights = weights.at[n:].set(0.0)
        batch = tuple(
            jnp.concatenate([b, jnp.zeros((batch_size - n,) + b.shape[1:], b.dtype)])
            for b in batch)
        return batch, weights

    def _train_chunked_stream(self, loader, beta) -> float:
        """Chunked streaming (``DataLoader(stream_chunks=c)``): upload c
        batches at a time and scan them on device in ONE dispatch (the
        fused-run machinery with global step offsets). Amortizes the
        per-batch dispatch latency that dominates plain streaming on
        remote/tunneled devices while holding only one chunk in device
        memory. Measured on the 4.4 GB-memmap flagship
        (benchmarks/streaming_scale.py, docs/PERFORMANCE.md "Streaming at
        scale"): 47-64 steps/s under this tunnel's H2D
        transfer-degradation pathology — wire-time-bound like every
        streaming variant there; the dispatch amortization pays off on a
        healthy transport where gather + H2D run at GB/s rates. Parameter trajectory
        matches the per-batch streaming and device-resident paths to
        last-ulp f32 tolerance (same shuffle, same
        fold_in(epoch_rng, global_step) chain; separate compiled program).
        Compiles at most twice (full chunk + the short final chunk)."""
        idx, w = loader.epoch_indices()              # [nb, bs] global rows
        nb, bs = idx.shape
        self.rng, epoch_rng = jax.random.split(self.rng)
        params, opt_state = self.model.params, self.opt_state
        cb = min(loader.stream_chunks, nb)
        local = np.arange(cb * bs, dtype=np.int32).reshape(cb, bs)
        losses = []
        try:
            # double-buffer: device_put the NEXT chunk (async, explicit —
            # implicit jit-argument upload serializes with dispatch) while
            # the current chunk's scan runs on device
            def staged(start):
                rows = idx[start:start + cb]
                # put_batch keeps the wire dtype narrow under scale=
                return rows.shape[0], loader.put_batch(
                    loader.gather_chunk(rows.reshape(-1)))

            c, chunk = staged(0)
            for start in range(0, nb, cb):
                nxt = None
                if start + cb < nb:
                    nxt = staged(start + cb)
                keys = jnp.broadcast_to(epoch_rng, (c,) + epoch_rng.shape)
                within = jnp.arange(start, start + c)
                betas = jnp.broadcast_to(beta, (c,) + jnp.shape(beta))
                params, opt_state, chunk_losses = self._run_epochs_jit(
                    params, opt_state, chunk, jnp.asarray(local[:c]),
                    jnp.asarray(w[start:start + c]), keys, within, betas)
                losses.append(jnp.sum(chunk_losses))
                if nxt is not None:
                    c, chunk = nxt
        finally:
            # donated buffers: hand the latest live ones back on any error
            self.model.params = params
            self.opt_state = opt_state
        return float(sum(float(l) for l in losses)) / loader.dataset_size

    def _train_streaming(self, loader, beta) -> float:
        """Per-batch jitted updates for host-resident loaders or generic
        iterables (uploads one batch per step)."""
        self.rng, epoch_rng = jax.random.split(self.rng)
        params, opt_state = self.model.params, self.opt_state
        losses, count, bs = [], 0, None
        try:
            for i, batch in enumerate(loader):
                batch = tuple(jnp.asarray(b) for b in batch)
                bs = bs or batch[0].shape[0]
                if batch[0].shape[0] > bs:
                    raise ValueError(
                        f"Streaming batch {i} has {batch[0].shape[0]} "
                        f"examples, larger than the first batch ({bs}); "
                        "yield batches of a fixed size (a short FINAL batch "
                        "is fine — it is padded).")
                count += batch[0].shape[0]
                batch, weights = self._pad_batch(batch, bs)
                step_rng = jax.random.fold_in(epoch_rng, i)
                params, opt_state, loss = self._train_step_jit(
                    params, opt_state, step_rng, batch, weights, beta)
                losses.append(loss)  # stays on device; sync once per epoch
        finally:
            # the jitted step donates its inputs: always hand the LATEST
            # live buffers back, so a mid-epoch error (bad batch) leaves the
            # model usable instead of pointing at deleted arrays
            self.model.params = params
            self.opt_state = opt_state
        return float(sum(losses)) / max(count, 1)

    # ------------------------------------------------------------------
    def train(self, train_loader: DataLoader, **kwargs) -> float:
        """One training epoch; returns loss / dataset_size
        (reference: ``svi.py:95-115``).

        Keyword Args:
            sync: default True. ``sync=False`` returns the epoch loss as a
                pending loss handle WITHOUT blocking on it — the dispatch is
                queued and the host returns immediately, so consecutive
                epochs pipeline on the device (the per-epoch host sync is
                one tunnel round-trip on remote chips). Values are
                numerically identical; call :meth:`sync_history` (or
                ``float()`` the result) to materialize. Device-resident
                loaders only — streaming paths block per batch regardless.
        """
        beta = _prep_beta(self.model, kwargs.get("scale_factor", 1.0))
        self._ensure_built()
        if not (isinstance(train_loader, DataLoader) and train_loader.device_resident):
            if (isinstance(train_loader, DataLoader)
                    and train_loader.stream_chunks > 1):
                return self._train_chunked_stream(train_loader, beta)
            return self._train_streaming(train_loader, beta)
        idx, w = train_loader.epoch_indices()
        self.rng, epoch_rng = jax.random.split(self.rng)
        params, self.opt_state, total = self._train_epoch_jit(
            self.model.params, self.opt_state, epoch_rng,
            train_loader.device_arrays, jnp.asarray(idx), jnp.asarray(w),
            beta, scales=train_loader.scale)
        self.model.params = params
        if not kwargs.get("sync", True):
            return _PendingLoss(total, train_loader.dataset_size)
        return float(total) / train_loader.dataset_size

    def run(self, train_loader: DataLoader, epochs: int, **kwargs) -> list:
        """Train ``epochs`` epochs in ONE device dispatch.

        Parameter-trajectory BITWISE identical to ``epochs`` sequential
        :meth:`train` calls (same PRNG split chain, same shuffles; reported
        losses match to f32 summation order), but the whole run is a
        single ``lax.scan`` — no per-epoch host sync or dispatch latency,
        which profiling shows costs ~33 ms/epoch on tunneled chips. Appends
        to ``loss_history`` and returns the per-epoch losses. Compiles once
        per (dataset shape, batch size, epoch count). Device-resident
        loaders only; streaming loaders fall back to per-epoch training.

        Keyword Args:
            scale_factor: KL scale beta applied to every epoch.
            scale_schedule: per-epoch beta sequence (length ``epochs``) for
                KL annealing — the fused-run equivalent of calling
                ``step(loader, scale_factor=f(epoch))`` each epoch.
            test_loader: held-out loader evaluated after every epoch INSIDE
                the fused dispatch (losses land in
                ``loss_history["test_loss"]``) — the fused-run equivalent of
                ``step(train_loader, test_loader)``, with the same per-epoch
                PRNG split order. Falls back to per-epoch ``step()`` calls
                when either loader is not device-resident.

        With ``log_file`` or ``checkpoint_path`` configured, the run is
        split into fused SEGMENTS (``checkpoint_every`` epochs, or 10 for
        log-only) with the host work between segments — live JSONL records
        and auto-checkpoints at ~fused speed, parameter trajectory still
        bitwise identical (segmenting does not change the PRNG chain).

        ``patience=P`` (requires ``test_loader=``) adds early stopping on
        the held-out loss, riding the same segment machinery: the run
        stops once the test loss has not improved by more than
        ``min_delta`` (default 0.0) for ``P`` epochs, checked at segment
        ends (segments are capped at ``min(10, P)`` epochs, so the
        overshoot past the ideal stopping epoch is bounded by that cap).
        ``trainer.stopped_early`` records whether the run stopped early.
        """
        # on_segment=fn: invoked at every fused-segment drain with a list
        # of {"epoch", "training_loss", "test_loss"?} records (one per new
        # epoch) — custom host work (metric push, progress bars, external
        # loggers) at fused speed. CONTRACT: the callback receives the
        # records only; in pipelined runs the live trainer/model state is
        # up to MAX_INFLIGHT segments AHEAD of the drained epochs (the
        # device keeps training while the callback runs), so don't read
        # model.params there expecting epoch-exact state — use patience=
        # (blocking segments) or checkpoint_path= if you need snapshots.
        # Similarly, epoch_seconds/epoch_times measure drain-to-drain wall
        # time: exact in aggregate, approximate per epoch under pipelining
        # (the first drain absorbs compile + pipeline fill).
        # enum_schedule=E: exact enumeration for the first E epochs, then
        # the model's enum_topk truncation (see _run_enum_schedule)
        enum_schedule = kwargs.pop("enum_schedule", None)
        if enum_schedule is not None:
            return self._run_enum_schedule((train_loader,), int(epochs),
                                           enum_schedule, kwargs)
        handled, result = self._seg_route((train_loader,), int(epochs),
                                          kwargs)
        if handled:
            return result
        test_loader = kwargs.get("test_loader")
        schedule = kwargs.get("scale_schedule")
        # built only on the non-segmented paths (segment sub-runs build
        # their own slice — don't prep epochs-many device scalars twice)
        if schedule is not None:
            epoch_betas = [_prep_beta(self.model, s) for s in schedule]
        else:
            epoch_betas = [_prep_beta(self.model,
                                      kwargs.get("scale_factor", 1.0))
                           ] * int(epochs)
        if test_loader is not None:
            return self._run_with_eval(train_loader, test_loader,
                                       int(epochs), schedule, epoch_betas,
                                       kwargs)
        if not (isinstance(train_loader, DataLoader)
                and train_loader.device_resident):
            # per-epoch fallback, with the same bookkeeping as the fused path
            per_epoch = []
            for e in range(int(epochs)):
                sf = (schedule[e] if schedule is not None
                      else kwargs.get("scale_factor", 1.0))
                per_epoch.append(self.train(train_loader, scale_factor=sf))
                self.loss_history["training_loss"].append(per_epoch[-1])
                self.current_epoch += 1
            return per_epoch
        self._ensure_built()
        params, opt_state, losses = self._dispatch_plain(
            train_loader, int(epochs), epoch_betas)
        self.model.params, self.opt_state = params, opt_state
        per_epoch = (np.asarray(losses).reshape(int(epochs), -1).sum(1)
                     / train_loader.dataset_size).tolist()
        self.loss_history["training_loss"].extend(per_epoch)
        self.current_epoch += int(epochs)
        return per_epoch

    def _dispatch_plain(self, train_loader, epochs: int, epoch_betas):
        """Dispatch ``epochs`` fused epochs and return the (asynchronous)
        ``(params, opt_state, losses)`` outputs WITHOUT materializing —
        the pipelined segment runner overlaps host work with these.
        Advances ``self.rng`` exactly as the blocking path does."""
        idx_list, w_list, keys = [], [], []
        for _ in range(int(epochs)):
            i, w = train_loader.epoch_indices()
            idx_list.append(i)
            w_list.append(w)
            self.rng, epoch_rng = jax.random.split(self.rng)
            keys.append(epoch_rng)
        nb = idx_list[0].shape[0]
        idx = jnp.asarray(np.concatenate(idx_list))
        w = jnp.asarray(np.concatenate(w_list))
        keys_rep = jnp.repeat(jnp.stack(keys), nb, axis=0)   # [E*nb, key]
        within = jnp.tile(jnp.arange(nb), int(epochs))        # step-in-epoch
        betas = jnp.repeat(jnp.stack(epoch_betas), nb, axis=0)  # per step
        return self._run_epochs_jit(
            self.model.params, self.opt_state, train_loader.device_arrays,
            idx, w, keys_rep, within, betas, scales=train_loader.scale)

    # ------------------------------------------------------------------
    # SegmentedRunsMixin hooks (the shared machinery lives in
    # trainers/_segmented.py; these adapt it to this trainer's state
    # arity, history dict, and dispatch functions)
    # ------------------------------------------------------------------
    def _seg_metric_key(self):
        return "test_loss"

    def _seg_history(self):
        return self.loss_history

    def _seg_has_metric(self, kwargs):
        return kwargs.get("test_loader") is not None

    def _seg_monitor_kwarg(self):
        return "test_loader"

    def _seg_monitor_sign(self):
        return 1.0  # held-out loss: lower is better

    def _seg_sub_run(self, loaders, n, sub):
        return self.run(loaders[0], n, **sub)

    def _seg_resident(self, loaders, kwargs):
        test_loader = kwargs.get("test_loader")
        return (isinstance(loaders[0], DataLoader)
                and loaders[0].device_resident
                and (test_loader is None
                     or (isinstance(test_loader, DataLoader)
                         and test_loader.device_resident)))

    def _seg_prep_beta(self, value):
        return _prep_beta(self.model, value)

    def _seg_dispatch(self, loaders, n, betas, kwargs):
        test_loader = kwargs.get("test_loader")
        if test_loader is None:
            return self._dispatch_plain(loaders[0], n, betas), None
        return self._dispatch_eval(loaders[0], test_loader, n, betas), None

    def _seg_materialize(self, futs, meta, n, loaders, kwargs):
        del meta
        test_loader = kwargs.get("test_loader")
        if test_loader is None:
            per = (np.asarray(futs[2]).reshape(n, -1).sum(1)
                   / loaders[0].dataset_size).tolist()
            return per, None
        per = (np.asarray(futs[2]) / loaders[0].dataset_size).tolist()
        te = (np.asarray(futs[3]) / test_loader.dataset_size).tolist()
        return per, te

    def _seg_state_futs(self, futs):
        return futs[0], futs[1]

    def _seg_live(self):
        return (self.model.params, self.opt_state, self.rng)

    def _seg_set(self, tup):
        self.model.params, self.opt_state, self.rng = tup

    def _run_with_eval(self, train_loader, test_loader, epochs: int,
                       schedule, epoch_betas, kwargs) -> list:
        """``run(..., test_loader=)``: the fused multi-epoch dispatch with a
        held-out evaluation after every epoch, all on-device. PRNG-parity
        with sequential ``step(train_loader, test_loader)`` calls: per epoch
        the split order is train-indices, train-key, test-indices, test-key,
        and per-batch keys are ``fold_in(epoch_key, step)`` — identical to
        :meth:`train` + :meth:`evaluate`."""
        if not all(isinstance(ld, DataLoader) and ld.device_resident
                   for ld in (train_loader, test_loader)):
            per_epoch = []
            for e in range(epochs):
                sf = (schedule[e] if schedule is not None
                      else kwargs.get("scale_factor", 1.0))
                self.step(train_loader, test_loader, scale_factor=sf)
                per_epoch.append(self.loss_history["training_loss"][-1])
            return per_epoch
        self._ensure_built()
        params, self.opt_state, tr, te = self._dispatch_eval(
            train_loader, test_loader, epochs, epoch_betas)
        self.model.params = params
        per_epoch = (np.asarray(tr) / train_loader.dataset_size).tolist()
        test_pe = (np.asarray(te) / test_loader.dataset_size).tolist()
        self.loss_history["training_loss"].extend(per_epoch)
        self.loss_history["test_loss"].extend(test_pe)
        self.current_epoch += epochs
        return per_epoch

    def _dispatch_eval(self, train_loader, test_loader, epochs: int,
                       epoch_betas):
        """Async dispatch of the fused train+eval run: returns
        ``(params, opt_state, train_losses, test_losses)`` futures (see
        :meth:`_dispatch_plain`)."""
        idx_l, w_l, keys, tidx_l, tw_l, tkeys = [], [], [], [], [], []
        for _ in range(epochs):
            i, w = train_loader.epoch_indices()
            idx_l.append(i)
            w_l.append(w)
            self.rng, k = jax.random.split(self.rng)
            keys.append(k)
            ti, tw = test_loader.epoch_indices()
            tidx_l.append(ti)
            tw_l.append(tw)
            self.rng, tk = jax.random.split(self.rng)
            tkeys.append(tk)
        return self._run_epochs_eval_jit(
            self.model.params, self.opt_state, train_loader.device_arrays,
            jnp.asarray(np.stack(idx_l)), jnp.asarray(np.stack(w_l)),
            jnp.stack(keys), jnp.stack(epoch_betas),
            test_loader.device_arrays, jnp.asarray(np.stack(tidx_l)),
            jnp.asarray(np.stack(tw_l)), jnp.stack(tkeys),
            scales=train_loader.scale, tscales=test_loader.scale)

    def evaluate(self, test_loader: DataLoader, **kwargs) -> float:
        """Loss over a held-out set with NO parameter updates
        (reference semantics: ``svi.py:117-137``)."""
        beta = _prep_beta(self.model, kwargs.get("scale_factor", 1.0))
        self._ensure_built()
        if not (isinstance(test_loader, DataLoader) and test_loader.device_resident):
            self.rng, epoch_rng = jax.random.split(self.rng)
            total, count, bs = 0.0, 0, None
            for i, batch in enumerate(test_loader):
                batch = tuple(jnp.asarray(b) for b in batch)
                bs = bs or batch[0].shape[0]
                if batch[0].shape[0] > bs:
                    raise ValueError(
                        f"Streaming batch {i} has {batch[0].shape[0]} "
                        f"examples, larger than the first batch ({bs}).")
                count += batch[0].shape[0]
                batch, weights = self._pad_batch(batch, bs)
                total += float(self._eval_step_jit(
                    self.model.params, jax.random.fold_in(epoch_rng, i),
                    batch, weights, beta))
            return total / max(count, 1)
        idx, w = test_loader.epoch_indices()
        self.rng, epoch_rng = jax.random.split(self.rng)
        total = self._eval_epoch_jit(
            self.model.params, epoch_rng, test_loader.device_arrays,
            jnp.asarray(idx), jnp.asarray(w), beta,
            scales=test_loader.scale)
        if not kwargs.get("sync", True):  # see train(sync=False)
            return _PendingLoss(total, test_loader.dataset_size)
        return float(total) / test_loader.dataset_size

    def step(self, train_loader: DataLoader,
             test_loader: Optional[DataLoader] = None, **kwargs) -> None:
        """One epoch of training (+ optional eval), appended to
        ``loss_history`` (reference: ``svi.py:139-162``).

        Keyword Args:
            scale_factor: KL scale beta (scalar, or [cont, disc] for jiVAE).
            sync: default True. ``sync=False`` queues the epoch WITHOUT
                blocking on its loss: ``loss_history`` temporarily holds 0-d
                device arrays and consecutive ``step()`` calls pipeline on
                the device — recovering most of the fused ``run()`` speed
                while keeping per-epoch host control flow (the use case
                ``run(on_segment=)`` can't cover). Identical numerics and
                PRNG chain to sync steps. :meth:`sync_history` (called
                automatically by :meth:`print_statistics` and before
                auto-checkpoints) materializes the floats and flushes
                deferred JSONL records; ``epoch_times`` then measures
                dispatch time, not device time.
        """
        sync = kwargs.get("sync", True)
        t0 = time.perf_counter()
        self.loss_history["training_loss"].append(self.train(train_loader, **kwargs))
        if test_loader is not None:
            self.loss_history["test_loss"].append(self.evaluate(test_loader, **kwargs))
        self.epoch_times.append(time.perf_counter() - t0)
        self.current_epoch += 1
        if self.log_file:
            ti = len(self.loss_history["training_loss"]) - 1
            si = (len(self.loss_history["test_loss"]) - 1
                  if test_loader is not None else None)
            self._deferred_records.append(
                (self.current_epoch, ti, si, self.epoch_times[-1]))
            if sync:
                self.sync_history()
        if (self.checkpoint_path
                and self.current_epoch % self.checkpoint_every == 0):
            self.sync_history()  # checkpoints persist loss_history as floats
            from ..utils.checkpoint import save_checkpoint
            save_checkpoint(self.checkpoint_path, self.model, self)

    def sync_history(self) -> None:
        """Materialize any pending ``step(sync=False)`` losses (ONE device
        sync for all queued epochs) and flush deferred JSONL records."""
        for key in ("training_loss", "test_loss"):
            hist = self.loss_history[key]
            for i, v in enumerate(hist):
                if not isinstance(v, float):
                    hist[i] = float(v)
        if self._deferred_records:
            records, self._deferred_records = self._deferred_records, []
            if self.log_file:
                import json
                with open(self.log_file, "a") as f:
                    for epoch, ti, si, secs in records:
                        rec = {"epoch": epoch,
                               "training_loss":
                                   self.loss_history["training_loss"][ti],
                               "epoch_seconds": secs}
                        if si is not None:
                            rec["test_loss"] = self.loss_history["test_loss"][si]
                        f.write(json.dumps(rec) + "\n")

    def resume(self, checkpoint_path: Optional[str] = None) -> int:
        """Restore model + optimizer + PRNG + epoch from a checkpoint written
        by this trainer; returns the epoch to continue from."""
        from ..utils.checkpoint import load_checkpoint
        load_checkpoint(checkpoint_path or self.checkpoint_path,
                        self.model, self)
        return self.current_epoch

    def print_statistics(self) -> None:
        """Prints current-epoch losses (reference: ``svi.py:164-175``)."""
        self.sync_history()
        e = self.current_epoch
        if len(self.loss_history["test_loss"]) > 0:
            print("Epoch: {} Training loss: {:.4f}, Test loss: {:.4f}".format(
                e, self.loss_history["training_loss"][-1],
                self.loss_history["test_loss"][-1]))
        else:
            print("Epoch: {} Training loss: {:.4f}".format(
                e, self.loss_history["training_loss"][-1]))
