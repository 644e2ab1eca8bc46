"""Shared segmented/pipelined fused-run machinery for both trainers.

``SVItrainer`` and ``auxSVItrainer`` run multi-epoch fused training the
same way — a pipeline of small sub-scans with host work (JSONL records,
atomic auto-checkpoints, ``on_segment`` callbacks, early stopping)
drained between segments — but differ in their state arity (2- vs
3-part optimizer state), history dict / metric key, loader tuples, and
dispatch functions. This mixin holds the machinery once; each trainer
implements the small ``_seg_*`` hook surface below. (Extracted from the
two near-identical per-trainer copies flagged in the round-3 review.)

Hook surface a trainer must provide:

* ``_seg_metric_key() -> str`` — record/JSONL key for the monitored
  metric (``"test_loss"`` for SVItrainer, ``"test"`` for the aux
  trainer, matching each one's history dict).
* ``_seg_history() -> dict`` — the history dict
  (``loss_history`` / ``history``).
* ``_seg_has_metric(kwargs) -> bool`` — was a held-out loader passed?
* ``_seg_monitor_kwarg() -> str`` — the loader kwarg name named in the
  ``patience=`` validation error (``"test_loader"`` / ``"loader_val"``).
* ``_seg_monitor_sign() -> float`` — +1 if lower metric is better,
  -1 if higher is better (classification accuracy).
* ``_seg_sub_run(loaders, n, sub_kwargs) -> list`` — blocking fused
  sub-run of ``n`` epochs (the trainer's ``run`` with ``_segmenting``
  already set by the caller).
* ``_seg_resident(loaders, kwargs) -> bool`` — all loaders (incl. the
  held-out one, if any) device-resident?
* ``_seg_prep_beta(value)`` — per-epoch beta scalar for dispatch.
* ``_seg_dispatch(loaders, n, betas, kwargs) -> (futs, meta)`` — async
  dispatch of ``n`` fused epochs; returns un-materialized outputs plus
  whatever normalizers ``_seg_materialize`` needs.
* ``_seg_materialize(futs, meta, n, loaders, kwargs) -> (per, te)`` —
  blocking conversion to per-epoch losses (and metric values or None).
* ``_seg_state_futs(futs) -> tuple`` — the (params, opt-state...) slice
  of the dispatch outputs.
* ``_seg_live() -> tuple`` / ``_seg_set(tup)`` — get/assign the live
  ``(params, *opt_states, rng)`` training state.
"""
import time
from collections import deque

import jax
import jax.numpy as jnp

# Fused runs longer than this are dispatched as a PIPELINE of
# PIPELINE_SEGMENT-epoch sub-scans instead of one monolithic scan: host
# index/key prep and H2D uploads of later segments overlap device compute
# of earlier ones (JAX async dispatch queues them), measured 1478 -> 1656
# steps/s (+12%) on the flagship 250-epoch workload (docs/PERFORMANCE.md).
# A second benefit: ANY epoch count reuses at most two compiled scan
# shapes (segment + remainder) instead of compiling per distinct total.
PIPELINE_SEGMENT = 5

# Upper bound on dispatched-but-undrained segments in the pipelined
# runner: bounds device memory held by losses futures and checkpoint
# boundary snapshots while keeping the device queue ahead of the host.
MAX_INFLIGHT = 4


class SegmentedRunsMixin:
    """Segmented + pipelined fused-run execution (see module docstring)."""

    # ------------------------------------------------------------------
    # segment sizing
    # ------------------------------------------------------------------
    def _run_segment_len(self):
        """Nominal fused-run segment length when per-segment host work
        (JSONL logging / auto-checkpointing) is configured; ``None``
        disables segmenting (pure single-dispatch run). The actual
        per-iteration length additionally aligns to checkpoint/log
        boundaries (see :meth:`_next_segment_epochs`)."""
        if self.checkpoint_path:
            return max(1, int(self.checkpoint_every))
        if self.log_file:
            return 10
        return None

    def _next_segment_epochs(self, remaining: int, at_epoch=None) -> int:
        """Epochs until the next host-work boundary: the next multiple of
        ``checkpoint_every`` and/or the 10-epoch log cadence — so a resumed
        trainer checkpoints at exactly the epochs a step() loop would.
        ``at_epoch`` overrides ``self.current_epoch`` (the pipelined
        runner dispatches ahead of the drained epoch counter)."""
        epoch = self.current_epoch if at_epoch is None else at_epoch
        cands = [remaining]
        if self.checkpoint_path:
            ce = max(1, int(self.checkpoint_every))
            cands.append(ce - (epoch % ce))
        if self.log_file:
            cands.append(10 - (epoch % 10))
        return max(1, min(cands))

    def _pipeline_cap(self) -> int:
        """Max epochs per pipelined segment. Small segments maximize
        dispatch/compute overlap (measured best on the flagship), but each
        segment costs one drain sync — with checkpointing configured, the
        per-boundary state fetch already paces the host, so segments grow
        to the checkpoint boundary (measured: 5-epoch segments 791-985
        steps/s vs boundary-sized 1119-1174 at checkpoint_every=10)."""
        if self.checkpoint_path:
            return max(PIPELINE_SEGMENT,
                       min(int(self.checkpoint_every), 5 * PIPELINE_SEGMENT))
        return PIPELINE_SEGMENT

    # ------------------------------------------------------------------
    # run() routing
    # ------------------------------------------------------------------
    def _seg_route(self, loaders, epochs: int, kwargs):
        """Shared ``run()`` prelude: pop + validate the segment-level
        kwargs (``patience``/``min_delta``/``on_segment``, schedule
        length) and route to the segmented or pipelined runner when one
        applies. Returns ``(True, result)`` when the run was handled
        here, ``(False, None)`` when the caller should continue on its
        trainer-specific monolithic/fallback paths. NOTE: mutates
        ``kwargs`` (the popped keys must not reach sub-runs)."""
        patience = kwargs.pop("patience", None)
        min_delta = float(kwargs.pop("min_delta", 0.0))
        on_segment = kwargs.pop("on_segment", None)
        if patience is not None and not self._seg_has_metric(kwargs):
            raise ValueError(
                "patience= (early stopping) requires "
                f"{self._seg_monitor_kwarg()}= to monitor")
        self.stopped_early = False
        schedule = kwargs.get("scale_schedule")
        if schedule is not None and len(schedule) != int(epochs):
            raise ValueError(
                f"scale_schedule has {len(schedule)} entries for "
                f"{epochs} epochs")
        if int(epochs) <= 0:
            return True, []
        if getattr(self, "_segmenting", False):
            return False, None  # sub-run of a segment loop: run as-is
        seg = self._run_segment_len()
        if (seg is not None or patience is not None
                or on_segment is not None):
            return True, self._run_segmented(
                loaders, int(epochs), seg, schedule, kwargs,
                patience, min_delta, on_segment)
        if (self._seg_resident(loaders, kwargs)
                and int(epochs) > PIPELINE_SEGMENT):
            # pipelined dispatch beats one monolithic scan even with no
            # host work configured (see PIPELINE_SEGMENT above)
            return True, self._run_segmented_pipelined(
                loaders, int(epochs), schedule, kwargs)
        return False, None

    # ------------------------------------------------------------------
    # enumeration scheduling (exact-early -> truncated-late)
    # ------------------------------------------------------------------
    def _run_enum_schedule(self, loaders, epochs: int, exact_epochs,
                           kwargs) -> list:
        """``run(..., enum_schedule=E)``: train the first ``E`` epochs with
        EXACT discrete enumeration, then switch to the model's configured
        ``enum_topk`` truncation for the rest — closing truncation's
        early-training bias (the guide q(y|x) is near-uniform at init, so
        top-k drops real probability mass; once it concentrates, the
        truncated estimator is nearly exact — docs/PERFORMANCE.md
        "enum_topk"). Implemented as two sub-runs riding the existing
        segment machinery; the estimator flip recompiles once.

        History/epoch bookkeeping concatenates seamlessly. ``patience=``
        applies within each phase (the baseline resets at the estimator
        switch — the truncated ELBO is a slightly different objective);
        under ``"auto"`` the baseline is carried across the exact phase's
        probe sub-runs, so patience spans the whole exact phase.

        ``enum_schedule="auto"`` (or ``("auto", threshold)``, default
        threshold 0.95) picks the switch epoch FROM THE GUIDE instead of a
        fixed count: every 5 exact epochs it measures the mean top-k
        probability mass of ``model.guide_probs`` on a fixed probe batch
        and flips to truncation once the guide carries >= ``threshold`` of
        its mass in the top ``enum_topk`` classes — i.e. exactly when the
        truncated estimator becomes near-exact, with no epoch count to
        tune per dataset.
        """
        model = self.model
        # run() enters here BEFORE _seg_route's reset, so a stale True from
        # an earlier early-stopped run would otherwise skip every phase
        self.stopped_early = False
        saved = int(getattr(model, "enum_topk", 0) or 0)
        if not saved:  # nothing to schedule: the model enumerates exactly
            return self._seg_sub_run(loaders, int(epochs), dict(kwargs))
        if exact_epochs == "auto" or (isinstance(exact_epochs, tuple)
                                      and exact_epochs[:1] == ("auto",)):
            thr = float(exact_epochs[1]) if isinstance(exact_epochs, tuple) \
                else 0.95
            return self._run_enum_schedule_auto(loaders, int(epochs), thr,
                                                saved, kwargs)
        E = max(0, min(int(exact_epochs), int(epochs)))
        schedule = kwargs.get("scale_schedule")
        out = []

        def phase(n, lo):
            sub = dict(kwargs)
            if schedule is not None:
                sub["scale_schedule"] = schedule[lo:lo + n]
            return self._seg_sub_run(loaders, n, sub)

        if E:
            model.enum_topk = 0
            self._swap_compiled_variant(0, saved)
            try:
                out += phase(E, 0)
            finally:
                model.enum_topk = saved
                self._swap_compiled_variant(saved, saved)
        if int(epochs) > E and not self.stopped_early:
            out += phase(int(epochs) - E, E)
        return out

    #: exact epochs between guide-concentration probes in
    #: ``enum_schedule="auto"`` (one tiny jitted encoder call per probe)
    ENUM_AUTO_PROBE_EVERY = 5

    #: epochs into the last ``enum_schedule="auto"`` run at which the
    #: trainer switched to truncation (None = no auto run yet, or the
    #: guide never concentrated past the threshold)
    enum_switch_epoch = None

    def _run_enum_schedule_auto(self, loaders, epochs: int, threshold: float,
                                saved: int, kwargs) -> list:
        """``enum_schedule="auto"``: exact enumeration until the guide's
        mean top-``enum_topk`` mass on a fixed probe batch reaches
        ``threshold``, then the truncated estimator (see
        :meth:`_run_enum_schedule`). The probe is ~512 training examples
        through ``model.guide_probs`` — one encoder forward between
        segments, negligible next to a 5-epoch sub-run."""
        import numpy as np

        model = self.model
        if not hasattr(model, "guide_probs"):
            raise ValueError(
                'enum_schedule="auto" needs a model with guide_probs() '
                f"(jiVAE/ssiVAE); {type(model).__name__} has none")
        if not 0.0 < threshold <= 1.0:
            raise ValueError(f"auto threshold must be in (0, 1], got {threshold}")
        # NOTE: device_arrays is a PROPERTY that uploads on first touch —
        # gate on the device_resident flag so a streaming loader raises
        # instead of silently device_put-ing a multi-GB host set
        if not getattr(loaders[0], "device_resident", False):
            raise ValueError(
                'enum_schedule="auto" needs a device-resident training '
                "loader (the probe reads from its arrays)")
        arrays = loaders[0].device_arrays
        from ..utils.data import apply_batch_scale
        # probe in MODEL space: narrow-dtype residency stores raw (e.g.
        # uint8) values that normalize inside the training scan
        probe = np.asarray(
            apply_batch_scale((arrays[0][:512],), loaders[0].scale)[0])
        schedule = kwargs.get("scale_schedule")
        out = []
        done = 0
        flipped = False
        #: (epoch, mean top-k guide mass) per probe — observability into
        #: why/when auto flipped (or why it never did)
        self.enum_probe_history = []

        def phase(n, lo):
            sub = dict(kwargs)
            if schedule is not None:
                sub["scale_schedule"] = schedule[lo:lo + n]
            return self._seg_sub_run(loaders, n, sub)

        model.enum_topk = 0
        self._swap_compiled_variant(0, saved)
        # patience= must span the whole exact phase: each 5-epoch probe
        # sub-run re-enters run() with a fresh early-stop baseline, so
        # without a carried state "no improvement for patience epochs"
        # could never accumulate (patience >= probe interval was inert).
        # The carry holds best/best_epoch across probe sub-runs; it is
        # dropped at the estimator switch (the truncated ELBO is a
        # slightly different objective, so its baseline restarts — same
        # documented semantics as the fixed-E path).
        self._es_carry = {"best": float("inf"),
                          "best_epoch": self.current_epoch}
        try:
            while done < epochs and not self.stopped_early:
                n = min(self.ENUM_AUTO_PROBE_EVERY, epochs - done)
                out += phase(n, done)
                done += n
                if done >= epochs or self.stopped_early:
                    break
                probs = np.asarray(model.guide_probs(probe))
                topk = np.sort(probs, axis=-1)[:, -saved:]
                mass = float(topk.sum(axis=-1).mean())
                self.enum_probe_history.append((done, mass))
                if mass >= threshold:
                    flipped = True
                    break
        finally:
            self._es_carry = None
            model.enum_topk = saved
            self._swap_compiled_variant(saved, saved)
        #: epochs into THIS run at which auto switched to truncation
        #: (None = the guide never concentrated past the threshold)
        self.enum_switch_epoch = done if flipped else None
        if done < epochs and not self.stopped_early:
            out += phase(epochs - done, done)
        return out

    def _swap_compiled_variant(self, key: int, default_key: int) -> None:
        """Switch the trainer's compiled step functions to the variant
        built for ``model.enum_topk == key``, stashing the current ones.

        The estimator is a Python attribute the jit cache cannot see, so a
        flip needs fresh traces — but repeated flips (every scheduled
        ``fit`` call, every `run(..., enum_schedule=)`) would otherwise
        re-trace the fused multi-epoch programs each time, which costs
        seconds and dominates short runs. Variants are keyed per trainer;
        ``default_key`` labels whatever was compiled before the first
        swap (the trainer warms up under the model's configured topk)."""
        cur = getattr(self, "_enum_variant_key", None)
        if cur is None:
            cur = default_key
        if cur == key:
            return
        variants = getattr(self, "_enum_variants", None)
        if variants is None:
            variants = self._enum_variants = {}
        attrs = self._compiled_attrs()
        variants[cur] = {a: getattr(self, a, None) for a in attrs}
        stash = variants.get(key)
        if stash is not None:
            for a, v in stash.items():
                setattr(self, a, v)
        else:
            self._invalidate_compiled()
        self._enum_variant_key = key

    # ------------------------------------------------------------------
    # shared host work
    # ------------------------------------------------------------------
    def _copy_state(self, *state):
        """On-device deep copy of the training state — checkpoint
        snapshots must not alias buffers a later dispatch donates."""
        if getattr(self, "_copy_state_jit", None) is None:
            self._copy_state_jit = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t))
        return self._copy_state_jit(tuple(state))

    def _seg_records(self, n, per, te):
        key = self._seg_metric_key()
        return [dict({"epoch": self.current_epoch - n + j + 1,
                      "training_loss": per[j]},
                     **({} if te is None else {key: te[j]}))
                for j in range(n)]

    def _seg_write_jsonl(self, n, per, te, dt):
        import json
        with open(self.log_file, "a") as f:
            for record in self._seg_records(n, per, te):
                record["epoch_seconds"] = dt / n
                f.write(json.dumps(record) + "\n")

    def _seg_save_checkpoint_async(self):
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(self.checkpoint_path, self.model, self,
                        async_write=True)

    def _seg_flush_checkpoints(self):
        if self.checkpoint_path:
            # artifacts are durable by the time run() returns
            from ..utils.checkpoint import wait_for_checkpoints
            wait_for_checkpoints(self.checkpoint_path)

    # ------------------------------------------------------------------
    # blocking segment loop (early stopping / non-resident loaders)
    # ------------------------------------------------------------------
    def _run_segmented(self, loaders, epochs: int, seg: int,
                       schedule, kwargs, patience=None,
                       min_delta: float = 0.0, on_segment=None) -> list:
        """Split ``run(epochs)`` into fused segments with the configured
        host work (JSONL records, auto-checkpoint, ``on_segment``,
        early-stop check) between them. The PRNG chain — and therefore
        the parameter trajectory — is unchanged by segmenting; only the
        dispatch granularity differs (~1 host sync per segment)."""
        del seg  # per-iteration length comes from _next_segment_epochs
        if patience is None and self._seg_resident(loaders, kwargs):
            # no stop decisions needed -> segments can be dispatched ahead
            return self._run_segmented_pipelined(loaders, epochs, schedule,
                                                 kwargs, on_segment)
        out = []
        done = 0
        history = self._seg_history()
        sign = self._seg_monitor_sign()
        metric_hist = history[self._seg_metric_key()]
        # carried early-stop state (enum_schedule="auto" probe sub-runs
        # share one baseline so patience spans the whole exact phase);
        # standalone runs start fresh
        es = getattr(self, "_es_carry", None)
        if es is None:
            es = {"best": float("inf"), "best_epoch": self.current_epoch}

        def fire(n):
            if on_segment is None:
                return
            per = history["training_loss"][-n:]
            te = (metric_hist[-n:]
                  if self._seg_has_metric(kwargs) else None)
            on_segment(self._seg_records(n, per, te))

        def stop_now(n):
            """Fold the segment's ``n`` new metric values into the
            best-so-far and report whether patience ran out. Keeps
            ``best_epoch`` / ``best_metric`` (raw value, un-signed)
            current on the trainer for user inspection."""
            if patience is None:
                return False
            for j, v in enumerate(metric_hist[-n:]):
                if sign * v < es["best"] - min_delta:
                    es["best"] = sign * v
                    es["best_epoch"] = self.current_epoch - n + j + 1
            self.best_epoch = es["best_epoch"]
            self.best_metric = sign * es["best"]
            if self.current_epoch - es["best_epoch"] >= int(patience):
                self.stopped_early = True
                return True
            return False

        while done < epochs:
            n = self._next_segment_epochs(epochs - done)
            if patience is not None:
                n = min(n, max(1, min(10, int(patience))))
            if on_segment is not None:
                n = min(n, 10)
            sub = dict(kwargs)
            if schedule is not None:
                sub["scale_schedule"] = list(schedule)[done:done + n]
            n_times = len(self.epoch_times)
            t0 = time.perf_counter()
            self._segmenting = True
            try:
                out.extend(self._seg_sub_run(loaders, n, sub))
            finally:
                self._segmenting = False
            dt = time.perf_counter() - t0
            stepped = len(self.epoch_times) > n_times
            if stepped:
                # the sub-run fell back to per-epoch step() calls, which
                # already did the logging/checkpoint/timing bookkeeping
                done += n
                fire(n)
                if stop_now(n):
                    break
                continue
            self.epoch_times.extend([dt / n] * n)
            if self.log_file:
                per = history["training_loss"][-n:]
                te = (metric_hist[-n:]
                      if self._seg_has_metric(kwargs) else None)
                self._seg_write_jsonl(n, per, te, dt)
            if (self.checkpoint_path
                    and self.current_epoch % self.checkpoint_every == 0):
                # async: the file write overlaps the next fused segment
                self._seg_save_checkpoint_async()
            done += n
            fire(n)
            if stop_now(n):
                break
        self._seg_flush_checkpoints()
        return out

    # ------------------------------------------------------------------
    # pipelined segment runner (the fast path)
    # ------------------------------------------------------------------
    def _run_segmented_pipelined(self, loaders, epochs: int,
                                 schedule, kwargs, on_segment=None) -> list:
        """Segmented fused run WITHOUT the per-segment device sync: up to
        ``MAX_INFLIGHT`` segments are dispatched ahead (JAX async
        execution queues them on-device), and host work — history, JSONL
        records, checkpoints, callbacks — drains as each segment's
        results materialize, overlapped with later segments' compute.
        The PRNG chain, segment boundaries, and therefore the parameter
        trajectory are identical to the blocking segment loop.

        Checkpoint boundaries snapshot the state via an on-device copy
        (the next segment's dispatch DONATES the live state buffers, so
        they cannot be fetched afterwards); the copy is fetched at drain
        time, overlapping the in-flight segments. Callbacks receive
        records only — the live trainer/model state runs ahead of the
        drained epochs (see the run() docstring) — and epoch_times are
        drain-to-drain wall times: exact in aggregate, approximate per
        epoch (the first drain absorbs compile + pipeline fill)."""
        self._ensure_built()
        history = self._seg_history()
        metric_hist = history[self._seg_metric_key()]
        sf = kwargs.get("scale_factor", 1.0)
        out = []
        pending = deque()
        done = 0
        epoch0 = self.current_epoch
        last_t = time.perf_counter()

        def drain_one():
            nonlocal last_t
            n, futs, meta, boundary, b_rng = pending.popleft()
            per, te = self._seg_materialize(futs, meta, n, loaders, kwargs)
            now = time.perf_counter()
            dt = now - last_t
            last_t = now
            out.extend(per)
            history["training_loss"].extend(per)
            if te is not None:
                metric_hist.extend(te)
            self.current_epoch += n
            self.epoch_times.extend([dt / n] * n)
            if self.log_file:
                self._seg_write_jsonl(n, per, te, dt)
            if boundary is not None:
                # save from the boundary snapshot, not the live futures
                live = self._seg_live()
                self._seg_set((*boundary, b_rng))
                try:
                    self._seg_save_checkpoint_async()
                finally:
                    self._seg_set(live)
            if on_segment is not None:
                on_segment(self._seg_records(n, per, te))

        while done < epochs:
            if len(pending) >= MAX_INFLIGHT:
                drain_one()
                continue
            n = min(self._next_segment_epochs(epochs - done,
                                              at_epoch=epoch0 + done),
                    self._pipeline_cap()
                    if on_segment is None
                    else min(self._pipeline_cap(), 10))
            if schedule is not None:
                betas = [self._seg_prep_beta(s)
                         for s in list(schedule)[done:done + n]]
            else:
                betas = [self._seg_prep_beta(sf)] * n
            futs, meta = self._seg_dispatch(loaders, n, betas, kwargs)
            boundary, b_rng = None, None
            end_epoch = epoch0 + done + n
            if (self.checkpoint_path
                    and end_epoch % self.checkpoint_every == 0):
                boundary = self._copy_state(*self._seg_state_futs(futs))
                b_rng = self.rng  # host value: post-prep, as blocking path
            self._seg_set((*self._seg_state_futs(futs), self.rng))
            pending.append((n, futs, meta, boundary, b_rng))
            done += n
        while pending:
            drain_one()
        self._seg_flush_checkpoints()
        return out
