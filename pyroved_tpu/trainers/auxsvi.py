"""SVI trainer with auxiliary supervised objectives (semi-supervised models).

TPU-native rebuild of the reference ``auxSVItrainer``
(``pyroved/trainers/auxsvi.py:15-225``): interleaves unlabeled and labeled
batches (one labeled step every ``p = (n_sup + n_unsup) // n_sup`` unlabeled
iterations, ``auxsvi.py:110-128``), adds the auxiliary classification /
regression loss on labeled data, evaluates accuracy or MSE
(``auxsvi.py:139-159``), and supports stochastic weight averaging of a chosen
sub-network (``auxsvi.py:191-209``).

Execution model: the basic and auxiliary objectives are fused into ONE
jit-compiled update per batch (the reference takes two separate
``svi.step`` passes; here the two losses share a forward-adjacent gradient
computation and a single Adam update each, compiled together). Both labeled
and unlabeled step functions are compiled once and reused every epoch.
"""
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..utils.data import DataLoader, apply_batch_scale
from ..utils.nn import average_weights
from ._segmented import PIPELINE_SEGMENT, SegmentedRunsMixin  # noqa: F401 — PIPELINE_SEGMENT re-exported for back-compat
from .svi import _PendingLoss

Array = jax.Array


class auxSVItrainer(SegmentedRunsMixin):
    """Trainer for ssiVAE / ss_reg_iVAE (task inferred from the model,
    overridable via ``task=``).

    Keyword Args:
        lr: Adam learning rate (default 5e-4, reference ``auxsvi.py:66``).
        mesh: optional ``jax.sharding.Mesh`` with a ``'data'`` axis —
            batches are sharded over it and XLA inserts the gradient
            all-reduce (same DP model as ``SVItrainer``).
        checkpoint_path / checkpoint_every: auto-checkpoint the full
            training state (params + both opt states + PRNG + epoch) every
            N epochs.
        log_file: append one JSONL record per epoch.
        grad_accum: average the basic objective's gradients over this many
            consecutive basic micro-steps (unlabeled steps AND the basic
            half of labeled steps — they share one optimizer, reference
            ``auxsvi.py:88-100``) and apply ONE update
            (``optax.MultiSteps``). The auxiliary encoder_y Adam keeps its
            per-labeled-step cadence. Composes with the scan epochs, the
            fused ``run()``, mesh DP, and checkpointing (the accumulator
            lives inside ``opt_state``).
    """

    def __init__(self, model, task: Optional[str] = None, optimizer=None,
                 seed: int = 1, **kwargs):
        task = task or getattr(model, "task", "classification")
        if task not in ("classification", "regression"):
            raise ValueError("Choose between 'classification' and 'regression' tasks")
        self.task = task
        self.model = model
        lr = kwargs.get("lr", 5e-4)
        base_opt = optimizer if optimizer is not None else optax.adam(lr)
        # grad_accum=k accumulates (averages) the BASIC objective's
        # gradients over k consecutive basic micro-steps into ONE optimizer
        # update (optax.MultiSteps, same machinery as SVItrainer). Unlabeled
        # steps and the basic half of labeled steps both count toward the
        # window: the reference steps loss_basic for BOTH batch kinds
        # against the same optimizer (auxsvi.py:88-100), so an
        # "unlabeled-only" window would need a second Adam state over the
        # same parameters with interleaved application — corrupting the
        # second-moment estimates. The auxiliary (encoder_y-only) Adam keeps
        # its per-labeled-step cadence, unaccumulated.
        self.grad_accum = int(kwargs.pop("grad_accum", 1) or 1)
        if self.grad_accum > 1:
            base_opt = optax.MultiSteps(base_opt,
                                        every_k_schedule=self.grad_accum)
        self.optimizer = base_opt
        self.opt_state = self.optimizer.init(model.params)
        # Separate Adam state for the aux objective's (encoder_y-only) step,
        # mirroring Pyro's per-parameter optimizers that are only advanced by
        # traces containing those parameters (auxsvi.py:79-81).
        self.aux_optimizer = optax.adam(lr) if optimizer is None else optimizer
        self.aux_opt_state = self.aux_optimizer.init(model.params["encoder_y"])
        self.rng = jax.random.PRNGKey(seed)
        self.mesh = kwargs.get("mesh")
        self.checkpoint_path = kwargs.get("checkpoint_path")
        self.checkpoint_every = int(kwargs.get("checkpoint_every", 10))
        self.log_file = kwargs.get("log_file")
        self.history = {"training_loss": [], "test": []}
        self.epoch_times = []
        self.current_epoch = 0
        # step(sync=False) support (see SVItrainer.sync_history)
        self._deferred_records = []
        self.stopped_early = False
        self.best_epoch = None   # set by patience= runs
        self.best_metric = None
        self.running_weights: Dict[int, dict] = {}
        self._step_unsup = None
        self._step_sup = None

    # ------------------------------------------------------------------
    def _constrain(self, tree):
        if self.mesh is None:
            return tree
        sharding = NamedSharding(self.mesh, P("data"))
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(a, sharding), tree)

    def _compiled_attrs(self):
        """Everything :meth:`_build_steps` produces — the swap unit for
        ``_swap_compiled_variant`` (estimator-flip caching)."""
        return ("_step_unsup", "_step_sup", "_epoch_jit", "_run_jit",
                "_run_val_jit", "_built_gate")

    def _invalidate_compiled(self):
        """Force a rebuild of the jitted step functions (the model's loss
        routing changed — e.g. an ``enum_schedule`` estimator flip)."""
        self._step_unsup = None

    def _ensure_built(self):
        """(Re)compile the jitted steps when needed.

        Re-checks the fused-kernel gate on EVERY entry (not only first
        compile): if the model's parameters were re-sharded after the last
        build — e.g. tensor-parallel decoder weights — the gate flips and the
        step functions are rebuilt against the new routing instead of
        replaying a stale compiled step."""
        gate = getattr(self.model, "sync_fusion_gate", None)
        pkey = getattr(self.model, "_pixel_gate_key", None)
        g = (gate() if gate is not None else None,
             pkey() if pkey is not None else None)
        if self._step_unsup is None or g != getattr(self, "_built_gate", None):
            self._build_steps()
            self._built_gate = g

    def _build_steps(self):
        gate = getattr(self.model, "sync_fusion_gate", None)
        if gate is not None:
            gate()  # TP-sharded decoder weights auto-disable the fused kernel
        loss_fn = self.model.loss_fn
        aux_loss_fn = self.model.aux_loss_fn
        optimizer, aux_optimizer = self.optimizer, self.aux_optimizer

        def basic_update(params, opt_state, rng, batch, weights, beta):
            batch = self._constrain(batch)
            weights = self._constrain(weights)

            def f(p):
                return jnp.sum(loss_fn(p, rng, batch, beta) * weights)
            loss, grads = jax.value_and_grad(f)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        def unsup_step(params, opt_state, rng, x, weights, beta):
            return basic_update(params, opt_state, rng, (x,), weights, beta)

        def sup_step(params, opt_state, aux_opt_state, rng, x, y, weights,
                     beta, aux_mult):
            params, opt_state, loss = basic_update(
                params, opt_state, rng, (x, y), weights, beta)
            x, y = self._constrain((x, y))
            weights = self._constrain(weights)

            def f_aux(p_y):
                p = dict(params)
                p["encoder_y"] = p_y
                return jnp.sum(aux_loss_fn(p, rng, (x, y), aux_mult) * weights)
            aux_loss, aux_grads = jax.value_and_grad(f_aux)(params["encoder_y"])
            aux_updates, aux_opt_state = aux_optimizer.update(
                aux_grads, aux_opt_state, params["encoder_y"])
            params = dict(params)
            params["encoder_y"] = optax.apply_updates(
                params["encoder_y"], aux_updates)
            return params, opt_state, aux_opt_state, loss + aux_loss

        self._step_unsup = jax.jit(unsup_step, donate_argnums=(0, 1))
        self._step_sup = jax.jit(sup_step, donate_argnums=(0, 1, 2))

        # Whole-epoch scan (device-resident loaders): one dispatch per epoch,
        # same execution model as SVItrainer. The interleave cadence is
        # static per epoch, so it is precomputed as a boolean mask and the
        # scan body wraps the supervised update in lax.cond.
        def epoch(params, opt_state, aux_opt_state, rng, xu, sup_arrays,
                  idx_u, w_u, idx_s, w_s, sup_mask, sup_j, beta, aux_mult,
                  uscales=None, sscales=None):
            def body(carry, inp):
                params, opt_state, aux_opt_state = carry
                bidx, bw, sb, sw, do_sup, step = inp
                x = apply_batch_scale((jnp.take(xu, bidx, axis=0),),
                                      uscales)[0]
                rng_u = jax.random.fold_in(rng, 2 * step)
                params, opt_state, loss = unsup_step(
                    params, opt_state, rng_u, x, bw, beta)

                sup_batch = apply_batch_scale(
                    tuple(jnp.take(a, sb, axis=0) for a in sup_arrays),
                    sscales)
                rng_s = jax.random.fold_in(rng, 2 * step + 1)

                def with_sup(args):
                    params, opt_state, aux_opt_state = args
                    params, opt_state, aux_opt_state, _ = sup_step(
                        params, opt_state, aux_opt_state, rng_s,
                        sup_batch[0], sup_batch[1], sw, beta, aux_mult)
                    return params, opt_state, aux_opt_state

                params, opt_state, aux_opt_state = jax.lax.cond(
                    do_sup, with_sup, lambda args: args,
                    (params, opt_state, aux_opt_state))
                return (params, opt_state, aux_opt_state), loss

            steps = jnp.arange(idx_u.shape[0])
            sup_idx_rows = jnp.take(idx_s, sup_j, axis=0)
            sup_w_rows = jnp.take(w_s, sup_j, axis=0)
            carry, losses = jax.lax.scan(
                body, (params, opt_state, aux_opt_state),
                (idx_u, w_u, sup_idx_rows, sup_w_rows, sup_mask, steps))
            params, opt_state, aux_opt_state = carry
            return params, opt_state, aux_opt_state, jnp.sum(losses)

        self._epoch_jit = jax.jit(epoch, donate_argnums=(0, 1, 2),
                          static_argnames=("uscales", "sscales"))

        # Multi-epoch fused path (mirrors SVItrainer.run): ONE lax.scan over
        # every interleaved step of every epoch, one device dispatch total.
        # `betas` is per-STEP (the per-epoch scale_schedule repeated), so KL
        # annealing runs inside the fused scan, same as SVItrainer.run.
        def run_epochs(params, opt_state, aux_opt_state, xu, sup_arrays,
                       idx_u, w_u, sup_idx, sup_w, sup_mask, keys, within,
                       betas, aux_mult, uscales=None, sscales=None):
            def body(carry, inp):
                params, opt_state, aux_opt_state = carry
                bidx, bw, sb, sw, do_sup, key, wstep, beta = inp
                x = apply_batch_scale((jnp.take(xu, bidx, axis=0),),
                                      uscales)[0]
                rng_u = jax.random.fold_in(key, 2 * wstep)
                params, opt_state, loss = unsup_step(
                    params, opt_state, rng_u, x, bw, beta)
                sup_batch = apply_batch_scale(
                    tuple(jnp.take(a, sb, axis=0) for a in sup_arrays),
                    sscales)
                rng_s = jax.random.fold_in(key, 2 * wstep + 1)

                def with_sup(args):
                    p, o, a = args
                    p, o, a, _ = sup_step(p, o, a, rng_s, sup_batch[0],
                                          sup_batch[1], sw, beta, aux_mult)
                    return p, o, a

                params, opt_state, aux_opt_state = jax.lax.cond(
                    do_sup, with_sup, lambda args: args,
                    (params, opt_state, aux_opt_state))
                return (params, opt_state, aux_opt_state), loss

            carry, losses = jax.lax.scan(
                body, (params, opt_state, aux_opt_state),
                (idx_u, w_u, sup_idx, sup_w, sup_mask, keys, within, betas))
            return carry[0], carry[1], carry[2], losses

        self._run_jit = jax.jit(run_epochs, donate_argnums=(0, 1, 2),
                        static_argnames=("uscales", "sscales"))

        # run_epochs + the per-epoch val metric INSIDE the fused dispatch
        # (the aux analogue of SVItrainer's run(test_loader=)): scan over
        # epochs; inner scans over the interleaved steps and the val
        # batches. Classification accumulates the weighted correct count
        # (exactly evaluate_cls's count — padded rows carry weight 0);
        # regression accumulates evaluate_reg's per-batch masked MSE.
        classification = self.task == "classification"
        enc_y = self.model.encoder_y_net

        def run_epochs_val(params, opt_state, aux_opt_state, xu, sup_arrays,
                           idx_u, w_u, sup_idx, sup_w, sup_mask, keys, betas,
                           aux_mult, val_arrays, vidx, vw, uscales=None,
                           sscales=None, vscales=None):
            steps = jnp.arange(idx_u.shape[1])

            def epoch_body(carry, inp):
                params, opt_state, aux_opt_state = carry
                eiu, ewu, esi, esw, em, key, beta, evidx, evw = inp

                def body(carry, binp):
                    params, opt_state, aux_opt_state = carry
                    bidx, bw, sb, sw, do_sup, wstep = binp
                    x = apply_batch_scale((jnp.take(xu, bidx, axis=0),),
                                          uscales)[0]
                    rng_u = jax.random.fold_in(key, 2 * wstep)
                    params, opt_state, loss = unsup_step(
                        params, opt_state, rng_u, x, bw, beta)
                    sup_batch = apply_batch_scale(
                        tuple(jnp.take(a, sb, axis=0) for a in sup_arrays),
                        sscales)
                    rng_s = jax.random.fold_in(key, 2 * wstep + 1)

                    def with_sup(args):
                        p, o, a = args
                        p, o, a, _ = sup_step(p, o, a, rng_s, sup_batch[0],
                                              sup_batch[1], sw, beta,
                                              aux_mult)
                        return p, o, a

                    params, opt_state, aux_opt_state = jax.lax.cond(
                        do_sup, with_sup, lambda args: args,
                        (params, opt_state, aux_opt_state))
                    return (params, opt_state, aux_opt_state), loss

                (params, opt_state, aux_opt_state), losses = jax.lax.scan(
                    body, (params, opt_state, aux_opt_state),
                    (eiu, ewu, esi, esw, em, steps))

                def vbody(acc, binp):
                    bidx, bw = binp
                    xv, yv = apply_batch_scale(
                        tuple(jnp.take(a, bidx, axis=0) for a in val_arrays),
                        vscales)
                    xv = xv.reshape(bidx.shape[0], -1)
                    pred = enc_y.apply({"params": params["encoder_y"]}, xv)
                    if classification:
                        hit = (jnp.argmax(pred, -1) == jnp.argmax(yv, -1))
                        return acc + jnp.sum(hit * bw), None
                    n_real = jnp.maximum(jnp.sum(bw), 1.0)
                    se = jnp.sum(((pred - yv) ** 2) * bw[:, None])
                    return acc + se / (n_real * yv.shape[-1]), None

                metric, _ = jax.lax.scan(vbody, jnp.float32(0.0),
                                         (evidx, evw))
                return (params, opt_state, aux_opt_state), (jnp.sum(losses),
                                                            metric)

            (params, opt_state, aux_opt_state), (tr, te) = jax.lax.scan(
                epoch_body, (params, opt_state, aux_opt_state),
                (idx_u, w_u, sup_idx, sup_w, sup_mask, keys, betas, vidx,
                 vw))
            return params, opt_state, aux_opt_state, tr, te

        self._run_val_jit = jax.jit(
    run_epochs_val, donate_argnums=(0, 1, 2),
    static_argnames=("uscales", "sscales", "vscales"))

    # ------------------------------------------------------------------
    def _train_chunked_stream(self, loader_unsup, loader_sup, beta,
                              aux_mult, sup_period=None) -> float:
        """Chunked out-of-core semi-supervised epoch (the aux analogue of
        ``SVItrainer._train_chunked_stream``): the UNLABELED set streams in
        ``stream_chunks``-batch chunks scanned on device in one dispatch
        each, while the (small) labeled set stays device-resident. Same
        interleave schedule, shuffle, and RNG chain as the resident path
        (losses match to 1e-6 relative; params to accumulated-f32
        reassociation tolerance — regression-tested). An explicit
        ``sup_period`` overrides the len()-derived cadence, matching
        :meth:`_train_streaming`."""
        idx_u, w_u = loader_unsup.epoch_indices()
        idx_s, w_s = loader_sup.epoch_indices()
        nb, bs = idx_u.shape
        mask, sup_j = self._schedule(loader_unsup, loader_sup, nb,
                                     idx_s.shape[0], sup_period)
        sup_idx_rows, sup_w_rows = idx_s[sup_j], w_s[sup_j]
        sup_arrays = loader_sup.device_arrays
        self.rng, epoch_rng = jax.random.split(self.rng)
        params, opt_state = self.model.params, self.opt_state
        aux_opt_state = self.aux_opt_state
        cb = min(loader_unsup.stream_chunks, nb)
        local = np.arange(cb * bs, dtype=np.int32).reshape(cb, bs)
        losses = []
        try:
            # double-buffer (same pattern as SVItrainer._train_chunked_stream):
            # device_put the NEXT unlabeled chunk asynchronously while the
            # current chunk's scan runs, so the host gather overlaps compute
            def staged(start):
                rows = idx_u[start:start + cb]
                # put_batch keeps the wire dtype narrow under scale=
                return rows.shape[0], loader_unsup.put_batch(
                    loader_unsup.gather_chunk(rows.reshape(-1)))

            c, (xu_chunk,) = staged(0)
            for start in range(0, nb, cb):
                nxt = None
                if start + cb < nb:
                    nxt = staged(start + cb)
                keys = jnp.broadcast_to(epoch_rng, (c,) + epoch_rng.shape)
                within = jnp.arange(start, start + c)
                betas = jnp.broadcast_to(beta, (c,) + jnp.shape(beta))
                params, opt_state, aux_opt_state, ls = self._run_jit(
                    params, opt_state, aux_opt_state, xu_chunk, sup_arrays,
                    jnp.asarray(local[:c]),
                    jnp.asarray(w_u[start:start + c]),
                    jnp.asarray(sup_idx_rows[start:start + c]),
                    jnp.asarray(sup_w_rows[start:start + c]),
                    jnp.asarray(mask[start:start + c]),
                    keys, within, betas, aux_mult,
                    sscales=loader_sup.scale)  # chunk is cast by put_batch
                losses.append(jnp.sum(ls))
                if nxt is not None:
                    c, (xu_chunk,) = nxt
        finally:
            # donated buffers: hand the latest live ones back on any error
            self.model.params = params
            self.opt_state = opt_state
            self.aux_opt_state = aux_opt_state
        return float(sum(float(l) for l in losses)) / max(float(w_u.sum()), 1.0)

    def _train_streaming(self, loader_unsup, loader_sup, beta, aux_mult,
                         sup_period: Optional[int] = None) -> float:
        """Per-batch jitted updates for host-resident loaders or generic
        iterables (uploads one batch per step). Interleave cadence follows
        the reference (``auxsvi.py:110-128``): one labeled step every
        ``p = (n_sup + n_unsup) // n_sup`` unlabeled iterations, where the
        counts come from ``len()`` — pass ``sup_period=`` for iterables
        without a length."""
        from .svi import SVItrainer
        if sup_period is not None:
            p = max(int(sup_period), 1)
        else:
            try:
                n_u, n_s = len(loader_unsup), len(loader_sup)
            except TypeError:
                raise TypeError(
                    "Streaming loaders without __len__ need an explicit "
                    "sup_period= (labeled step every p-th unlabeled batch)")
            p = max((n_s + n_u) // max(n_s, 1), 1)
        sup_now = (lambda i: True) if p == 1 else (lambda i: i % p == 1)

        self.rng, epoch_rng = jax.random.split(self.rng)
        params, opt_state = self.model.params, self.opt_state
        aux_opt_state = self.aux_opt_state
        sup_iter = iter(loader_sup)
        losses, count, bs_u, bs_s = [], 0, None, None
        try:
            for i, batch in enumerate(loader_unsup):
                x = jnp.asarray(batch[0] if isinstance(batch, (tuple, list))
                                else batch)
                bs_u = bs_u or x.shape[0]
                if x.shape[0] > bs_u:
                    raise ValueError(
                        f"Streaming batch {i} has {x.shape[0]} examples, "
                        f"larger than the first batch ({bs_u}); use a fixed "
                        "batch size.")
                count += x.shape[0]
                (x,), w = SVItrainer._pad_batch((x,), bs_u)
                rng_u = jax.random.fold_in(epoch_rng, 2 * i)
                params, opt_state, loss = self._step_unsup(
                    params, opt_state, rng_u, x, w, beta)
                losses.append(loss)  # device-side; one sync at epoch end
                if sup_now(i):
                    try:
                        sup_batch = next(sup_iter)
                    except StopIteration:  # cycle the (smaller) labeled loader
                        sup_iter = iter(loader_sup)
                        sup_batch = next(sup_iter)
                    sup_batch = tuple(jnp.asarray(b) for b in sup_batch)
                    bs_s = bs_s or sup_batch[0].shape[0]
                    if sup_batch[0].shape[0] > bs_s:
                        raise ValueError(
                            f"Labeled streaming batch has "
                            f"{sup_batch[0].shape[0]} examples, larger than "
                            f"the first labeled batch ({bs_s}); use a fixed "
                            "batch size.")
                    sup_batch, sw = SVItrainer._pad_batch(sup_batch, bs_s)
                    rng_s = jax.random.fold_in(epoch_rng, 2 * i + 1)
                    params, opt_state, aux_opt_state, _ = self._step_sup(
                        params, opt_state, aux_opt_state, rng_s,
                        sup_batch[0], sup_batch[1], sw, beta, aux_mult)
        finally:
            # jitted steps donate their inputs: always hand the LATEST live
            # buffers back so a mid-epoch error leaves the model usable
            self.model.params = params
            self.opt_state = opt_state
            self.aux_opt_state = aux_opt_state
        return float(sum(float(l) for l in losses)) / max(count, 1)

    @staticmethod
    def _schedule(loader_unsup, loader_sup, nb: int, n_sup_rows: int,
                  sup_period=None):
        """Static interleave schedule for one epoch: one labeled step every
        ``p = (n_sup + n_unsup) // n_sup`` unlabeled iterations, reference
        cadence ``i % p == 1`` (``auxsvi.py:110-128``). The reference's
        cadence never fires when p == 1 (labeled batches >= unlabeled) —
        labels would silently never train; deviate by supervising every
        iteration there (docs/DEVIATIONS.md). An explicit ``sup_period``
        overrides the len()-derived cadence. Returns (mask [nb] bool,
        labeled-batch row index per step [nb] int32)."""
        if sup_period is not None:
            p = max(int(sup_period), 1)
        else:
            p = ((len(loader_sup) + len(loader_unsup))
                 // max(len(loader_sup), 1))
        p = max(p, 1)
        sup_now = (lambda i: True) if p == 1 else (lambda i: i % p == 1)
        sup_mask = np.asarray([sup_now(i) for i in range(nb)], bool)
        sup_j = np.zeros(nb, np.int32)
        j = 0
        for i in range(nb):
            if sup_mask[i]:
                sup_j[i] = j % n_sup_rows
                j += 1
        return sup_mask, sup_j

    def run(self, loader_unsup: DataLoader, loader_sup: DataLoader,
            epochs: int, **kwargs) -> list:
        """Train ``epochs`` semi-supervised epochs in ONE device dispatch
        (the aux analogue of :meth:`SVItrainer.run`): the interleaved
        unlabeled/labeled schedule for every epoch is precomputed and the
        whole run is a single ``lax.scan`` — parameter-trajectory bitwise
        identical to sequential :meth:`train` calls. Appends to ``history``
        and returns per-epoch losses. Device-resident loaders only;
        streaming loaders fall back to per-epoch training.

        Keyword Args:
            scale_factor: KL scale beta applied to every epoch.
            scale_schedule: per-epoch beta sequence (length ``epochs``) for
                KL annealing inside the fused scan — same contract as
                :meth:`SVItrainer.run`.
            aux_loss_multiplier: weight of the auxiliary supervised loss.
            sup_period: explicit labeled-step cadence, overriding the
                len()-derived ``(n_sup + n_unsup) // n_sup``.
            loader_val: labeled loader whose accuracy (classification) or
                MSE (regression) is computed after every epoch INSIDE the
                fused dispatch (metrics land in ``history["test"]``) — the
                fused equivalent of ``step(..., loader_val=)``. Falls back
                to per-epoch ``step()`` when any loader is not
                device-resident.
            patience: early stopping on the ``loader_val`` metric
                (accuracy: higher is better; MSE: lower is better) — stop
                once it has not improved by more than ``min_delta`` for
                ``patience`` epochs, checked at fused-segment ends.
                ``trainer.stopped_early`` records whether it fired.
        """
        # enum_schedule=E: exact enumeration for the first E epochs, then
        # the model's enum_topk truncation (see _run_enum_schedule)
        enum_schedule = kwargs.pop("enum_schedule", None)
        if enum_schedule is not None:
            return self._run_enum_schedule((loader_unsup, loader_sup),
                                           int(epochs), enum_schedule,
                                           kwargs)
        self._ensure_built()
        handled, result = self._seg_route((loader_unsup, loader_sup),
                                          int(epochs), kwargs)
        if handled:
            return result
        loader_val = kwargs.get("loader_val")
        schedule = kwargs.get("scale_schedule")
        # built only on the non-segmented paths (segment sub-runs build
        # their own slice — don't prep epochs-many device scalars twice)
        aux_mult = self._seg_aux_mult(kwargs)
        if schedule is not None:
            epoch_betas = [jnp.asarray(s, jnp.float32) for s in schedule]
        else:
            epoch_betas = [jnp.asarray(kwargs.get("scale_factor", 1.0),
                                       jnp.float32)] * int(epochs)
        if loader_val is not None:
            return self._run_with_val(loader_unsup, loader_sup, loader_val,
                                      int(epochs), epoch_betas, schedule,
                                      aux_mult, kwargs)
        resident = (isinstance(loader_unsup, DataLoader)
                    and loader_unsup.device_resident
                    and isinstance(loader_sup, DataLoader)
                    and loader_sup.device_resident)
        if not resident:
            per_epoch = []
            step_kwargs = {k: v for k, v in kwargs.items()
                           if k not in ("scale_factor", "scale_schedule")}
            for e in range(int(epochs)):
                per_epoch.append(self.train(
                    loader_unsup, loader_sup,
                    scale_factor=float(epoch_betas[e]), **step_kwargs))
                self.history["training_loss"].append(per_epoch[-1])
                self.current_epoch += 1
            return per_epoch

        futs, nb, unsup_count = self._dispatch_run(
            loader_unsup, loader_sup, int(epochs), epoch_betas, aux_mult,
            kwargs.get("sup_period"))
        params, self.opt_state, self.aux_opt_state, losses = futs
        self.model.params = params
        per_epoch = (np.asarray(losses).reshape(int(epochs), nb).sum(1)
                     / max(unsup_count, 1.0)).tolist()
        self.history["training_loss"].extend(per_epoch)
        self.current_epoch += int(epochs)
        return per_epoch

    def _dispatch_run(self, loader_unsup, loader_sup, epochs: int,
                      epoch_betas, aux_mult, sup_period):
        """Dispatch ``epochs`` fused semi-supervised epochs; returns the
        asynchronous ``(params, opt_state, aux_opt_state, losses)``
        outputs plus ``(nb, unsup_count)`` WITHOUT materializing — the
        pipelined segment runner overlaps host work with these. Advances
        ``self.rng`` exactly as the blocking path does."""
        (xu,) = loader_unsup.device_arrays
        sup_arrays = loader_sup.device_arrays
        cols = {k: [] for k in ("iu", "wu", "si", "sw", "m")}
        keys = []
        nb = None
        unsup_count = None
        for _ in range(int(epochs)):
            idx_u, w_u = loader_unsup.epoch_indices()
            idx_s, w_s = loader_sup.epoch_indices()
            nb = idx_u.shape[0]
            unsup_count = float(w_u.sum())
            mask, sup_j = self._schedule(loader_unsup, loader_sup, nb,
                                         idx_s.shape[0], sup_period)
            cols["iu"].append(idx_u)
            cols["wu"].append(w_u)
            cols["si"].append(idx_s[sup_j])
            cols["sw"].append(w_s[sup_j])
            cols["m"].append(mask)
            self.rng, epoch_rng = jax.random.split(self.rng)
            keys.append(epoch_rng)
        cat = {k: jnp.asarray(np.concatenate(v)) for k, v in cols.items()}
        keys_rep = jnp.repeat(jnp.stack(keys), nb, axis=0)
        within = jnp.tile(jnp.arange(nb), int(epochs))
        betas = jnp.repeat(jnp.stack(epoch_betas), nb, axis=0)  # per step
        futs = self._run_jit(
            self.model.params, self.opt_state, self.aux_opt_state, xu,
            sup_arrays, cat["iu"], cat["wu"], cat["si"], cat["sw"], cat["m"],
            keys_rep, within, betas, aux_mult,
            uscales=loader_unsup.scale, sscales=loader_sup.scale)
        return futs, nb, unsup_count

    # ------------------------------------------------------------------
    # SegmentedRunsMixin hooks (shared machinery in trainers/_segmented.py)
    # ------------------------------------------------------------------
    def _seg_metric_key(self):
        return "test"  # matches history["test"] (accuracy or val MSE)

    def _seg_history(self):
        return self.history

    def _seg_has_metric(self, kwargs):
        return kwargs.get("loader_val") is not None

    def _seg_monitor_kwarg(self):
        return "loader_val"

    def _seg_monitor_sign(self):
        # classification monitors accuracy (higher is better)
        return -1.0 if self.task == "classification" else 1.0

    def _seg_sub_run(self, loaders, n, sub):
        return self.run(loaders[0], loaders[1], n, **sub)

    def _seg_resident(self, loaders, kwargs):
        loader_val = kwargs.get("loader_val")
        lds = tuple(loaders) + (() if loader_val is None else (loader_val,))
        return all(isinstance(ld, DataLoader) and ld.device_resident
                   for ld in lds)

    def _seg_prep_beta(self, value):
        return jnp.asarray(value, jnp.float32)

    def _seg_aux_mult(self, kwargs):
        """Device scalar for the aux-loss weight, cached per value so a
        long pipelined run doesn't re-upload it every segment."""
        v = float(kwargs.get("aux_loss_multiplier", 20))
        cache = getattr(self, "_aux_mult_cache", None)
        if cache is None or cache[0] != v:
            self._aux_mult_cache = (v, jnp.asarray(v, jnp.float32))
        return self._aux_mult_cache[1]

    def _seg_dispatch(self, loaders, n, betas, kwargs):
        aux_mult = self._seg_aux_mult(kwargs)
        sup_period = kwargs.get("sup_period")
        loader_val = kwargs.get("loader_val")
        if loader_val is None:
            futs, nb, uc = self._dispatch_run(loaders[0], loaders[1], n,
                                              betas, aux_mult, sup_period)
            return futs, (nb, uc)
        futs, uc, vn = self._dispatch_val(loaders[0], loaders[1], loader_val,
                                          n, betas, aux_mult, sup_period)
        return futs, (uc, vn)

    def _seg_materialize(self, futs, meta, n, loaders, kwargs):
        del loaders
        if kwargs.get("loader_val") is None:
            nb, unsup_count = meta
            per = (np.asarray(futs[3]).reshape(n, nb).sum(1)
                   / max(unsup_count, 1.0)).tolist()
            return per, None
        unsup_count, val_norm = meta
        per = (np.asarray(futs[3]) / max(unsup_count, 1.0)).tolist()
        te = (np.asarray(futs[4]) / val_norm).tolist()
        return per, te

    def _seg_state_futs(self, futs):
        return futs[0], futs[1], futs[2]

    def _seg_live(self):
        return (self.model.params, self.opt_state, self.aux_opt_state,
                self.rng)

    def _seg_set(self, tup):
        (self.model.params, self.opt_state, self.aux_opt_state,
         self.rng) = tup

    def _run_with_val(self, loader_unsup, loader_sup, loader_val,
                      epochs: int, epoch_betas, schedule, aux_mult,
                      kwargs) -> list:
        """``run(..., loader_val=)``: the fused multi-epoch dispatch with
        the val metric (accuracy / MSE) computed after every epoch
        on-device. Training PRNG chain and parameter trajectory are
        bitwise identical to :meth:`run` without a val loader (the metric
        consumes no PRNG keys, matching host-side :meth:`evaluate`)."""
        if not all(isinstance(ld, DataLoader) and ld.device_resident
                   for ld in (loader_unsup, loader_sup, loader_val)):
            per_epoch = []
            step_kwargs = {k: v for k, v in kwargs.items()
                           if k not in ("scale_factor", "scale_schedule",
                                        "loader_val")}
            for e in range(epochs):
                sf = (schedule[e] if schedule is not None
                      else kwargs.get("scale_factor", 1.0))
                self.step(loader_unsup, loader_sup, loader_val,
                          scale_factor=sf, **step_kwargs)
                per_epoch.append(self.history["training_loss"][-1])
            return per_epoch
        futs, unsup_count, val_norm = self._dispatch_val(
            loader_unsup, loader_sup, loader_val, epochs, epoch_betas,
            aux_mult, kwargs.get("sup_period"))
        params, self.opt_state, self.aux_opt_state, tr, te = futs
        self.model.params = params
        per_epoch = (np.asarray(tr) / max(unsup_count, 1.0)).tolist()
        metrics = (np.asarray(te) / val_norm).tolist()
        self.history["training_loss"].extend(per_epoch)
        self.history["test"].extend(metrics)
        self.current_epoch += epochs
        return per_epoch

    def _dispatch_val(self, loader_unsup, loader_sup, loader_val,
                      epochs: int, epoch_betas, aux_mult, sup_period):
        """Async dispatch of the fused train+val-metric run: returns the
        ``(params, opt_state, aux_opt_state, train_losses, metric_sums)``
        futures plus ``(unsup_count, val_norm)`` (see
        :meth:`_dispatch_run`)."""
        (xu,) = loader_unsup.device_arrays
        sup_arrays = loader_sup.device_arrays
        val_arrays = loader_val.device_arrays
        cols = {k: [] for k in ("iu", "wu", "si", "sw", "m", "vi", "vw")}
        keys = []
        unsup_count = None
        for _ in range(epochs):
            idx_u, w_u = loader_unsup.epoch_indices()
            idx_s, w_s = loader_sup.epoch_indices()
            unsup_count = float(w_u.sum())
            mask, sup_j = self._schedule(loader_unsup, loader_sup,
                                         idx_u.shape[0], idx_s.shape[0],
                                         sup_period)
            cols["iu"].append(idx_u)
            cols["wu"].append(w_u)
            cols["si"].append(idx_s[sup_j])
            cols["sw"].append(w_s[sup_j])
            cols["m"].append(mask)
            self.rng, epoch_rng = jax.random.split(self.rng)
            keys.append(epoch_rng)
            vi, vw = loader_val.epoch_indices()
            cols["vi"].append(vi)
            cols["vw"].append(vw)
        cat = {k: jnp.asarray(np.stack(v)) for k, v in cols.items()}
        futs = self._run_val_jit(
            self.model.params, self.opt_state, self.aux_opt_state, xu,
            sup_arrays, cat["iu"], cat["wu"], cat["si"], cat["sw"],
            cat["m"], jnp.stack(keys), jnp.stack(epoch_betas), aux_mult,
            val_arrays, cat["vi"], cat["vw"], uscales=loader_unsup.scale,
            sscales=loader_sup.scale, vscales=loader_val.scale)
        val_norm = (loader_val.dataset_size
                    if self.task == "classification"
                    else cat["vi"].shape[1])
        return futs, unsup_count, val_norm

    def train(self, loader_unsup: DataLoader, loader_sup: DataLoader,
              **kwargs) -> float:
        """One epoch over the unlabeled loader, interleaving labeled batches
        (reference: ``auxsvi.py:102-130``; supervised losses are not added to
        the reported epoch loss, ``auxsvi.py:126``)."""
        self._ensure_built()
        beta = jnp.asarray(kwargs.get("scale_factor", 1.0), jnp.float32)
        aux_mult = jnp.asarray(kwargs.get("aux_loss_multiplier", 20), jnp.float32)

        resident = (isinstance(loader_unsup, DataLoader)
                    and loader_unsup.device_resident
                    and isinstance(loader_sup, DataLoader)
                    and loader_sup.device_resident)
        if not resident:
            if (isinstance(loader_unsup, DataLoader)
                    and loader_unsup.stream_chunks > 1
                    and isinstance(loader_sup, DataLoader)
                    and loader_sup.device_resident):
                return self._train_chunked_stream(
                    loader_unsup, loader_sup, beta, aux_mult,
                    kwargs.get("sup_period"))
            return self._train_streaming(loader_unsup, loader_sup, beta,
                                         aux_mult, kwargs.get("sup_period"))

        idx_u, w_u = loader_unsup.epoch_indices()
        idx_s, w_s = loader_sup.epoch_indices()
        (xu,) = loader_unsup.device_arrays
        sup_arrays = loader_sup.device_arrays

        self.rng, epoch_rng = jax.random.split(self.rng)
        sup_mask, sup_j = self._schedule(loader_unsup, loader_sup,
                                         idx_u.shape[0], idx_s.shape[0],
                                         kwargs.get("sup_period"))
        unsup_count = float(w_u.sum())

        params, opt_state, self.aux_opt_state, total = self._epoch_jit(
            self.model.params, self.opt_state, self.aux_opt_state, epoch_rng,
            xu, sup_arrays, jnp.asarray(idx_u), jnp.asarray(w_u),
            jnp.asarray(idx_s), jnp.asarray(w_s), jnp.asarray(sup_mask),
            jnp.asarray(sup_j), beta, aux_mult,
            uscales=loader_unsup.scale, sscales=loader_sup.scale)
        self.model.params = params
        self.opt_state = opt_state
        if not kwargs.get("sync", True):  # see SVItrainer.train(sync=False)
            return _PendingLoss(total, max(unsup_count, 1.0))
        return float(total) / max(unsup_count, 1.0)

    # ------------------------------------------------------------------
    def evaluate(self, loader_val: DataLoader) -> float:
        """Accuracy (classification) or MSE (regression) on labeled data
        (reference: ``auxsvi.py:132-159``)."""
        if self.task == "classification":
            return self.evaluate_cls(loader_val)
        return self.evaluate_reg(loader_val)

    def evaluate_cls(self, loader_val: DataLoader) -> float:
        correct, total = 0, 0
        for data, labels in loader_val:
            predicted = np.asarray(self.model.classifier(data))
            lab_idx = np.asarray(labels).argmax(1)
            correct += int((predicted == lab_idx).sum())
            total += data.shape[0]
        return correct / total

    def evaluate_reg(self, loader_val: DataLoader) -> float:
        total_mse, batches = 0.0, 0
        for data, gt in loader_val:
            predicted = np.asarray(self.model.regressor(data))
            total_mse += float(np.mean((predicted - np.asarray(gt)) ** 2))
            batches += 1
        return total_mse / max(batches, 1)

    # ------------------------------------------------------------------
    def step(self, loader_unsup: DataLoader, loader_sup: DataLoader,
             loader_val: Optional[DataLoader] = None, **kwargs) -> None:
        """One train epoch (+ optional eval) (reference: ``auxsvi.py:161-189``).

        Keyword Args:
            scale_factor: KL scale beta (default 1).
            aux_loss_multiplier: weight of the auxiliary supervised loss
                (default 20; Eq. 9 of arXiv:1406.5298).
            sup_period: labeled-step cadence for length-less streaming
                loaders.
            sync: default True. ``sync=False`` queues the train epoch
                WITHOUT blocking on its loss (``history["training_loss"]``
                temporarily holds pending loss handles; see
                ``SVItrainer.step(sync=False)``). Note ``loader_val``
                evaluation is host-side (accuracy/MSE over numpy
                predictions) and blocks regardless — async pays off on
                val-less loops.
        """
        sync = kwargs.get("sync", True)
        t0 = time.perf_counter()
        self.history["training_loss"].append(
            self.train(loader_unsup, loader_sup, **kwargs))
        if loader_val is not None:
            self.history["test"].append(self.evaluate(loader_val))
        self.epoch_times.append(time.perf_counter() - t0)
        self.current_epoch += 1
        if self.log_file:
            ti = len(self.history["training_loss"]) - 1
            si = len(self.history["test"]) - 1 if loader_val is not None else None
            self._deferred_records.append(
                (self.current_epoch, ti, si, self.epoch_times[-1]))
            if sync:
                self.sync_history()
        if (self.checkpoint_path
                and self.current_epoch % self.checkpoint_every == 0):
            self.sync_history()  # checkpoints persist history as floats
            from ..utils.checkpoint import save_checkpoint
            save_checkpoint(self.checkpoint_path, self.model, self)

    def sync_history(self) -> None:
        """Materialize any pending ``step(sync=False)`` losses (ONE device
        sync for all queued epochs) and flush deferred JSONL records."""
        for key in ("training_loss", "test"):
            hist = self.history[key]
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
                                   self.history["training_loss"][ti],
                               "epoch_seconds": secs}
                        if si is not None:
                            rec["test"] = self.history["test"][si]
                        f.write(json.dumps(rec) + "\n")

    # ------------------------------------------------------------------
    def resume(self, checkpoint_path: Optional[str] = None) -> int:
        """Restore model + both optimizer states + PRNG + epoch from a
        checkpoint written by this trainer; returns the epoch to continue
        from."""
        from ..utils.checkpoint import load_checkpoint
        load_checkpoint(checkpoint_path or self.checkpoint_path,
                        self.model, self)
        return self.current_epoch

    # ------------------------------------------------------------------
    def save_running_weights(self, net: str = "encoder_y") -> None:
        """Snapshot a sub-network's parameters for SWA
        (reference: ``auxsvi.py:191-200``)."""
        self.running_weights[self.current_epoch] = jax.device_get(
            self.model.params[net])

    def average_weights(self, net: str = "encoder_y") -> None:
        """Replace a sub-network's parameters with the running average
        (reference: ``auxsvi.py:202-209``)."""
        self.model.params[net] = jax.tree_util.tree_map(
            jnp.asarray, average_weights(self.running_weights))

    def print_statistics(self) -> None:
        """Prints current-epoch loss and metric (reference: ``auxsvi.py:211-225``)."""
        self.sync_history()
        e = self.current_epoch
        if len(self.history["test"]) > 0:
            metric = "accuracy" if self.task == "classification" else "MSE"
            print("Epoch: {} Training loss: {:.4f}, Test {}: {:.4f}".format(
                e, self.history["training_loss"][-1], metric, self.history["test"][-1]))
        else:
            print("Epoch: {} Training loss: {:.4f}".format(
                e, self.history["training_loss"][-1]))
