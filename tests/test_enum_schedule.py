"""enum_schedule= (VERDICT r4 item 4): exact enumeration for the first E
epochs, then the model's enum_topk truncation — closing truncation's
early-training bias while keeping most of its speedup.
"""
import jax
import numpy as np
import pytest

from pyroved_tpu.models import jiVAE, ssiVAE
from pyroved_tpu.trainers import SVItrainer, auxSVItrainer
from pyroved_tpu.utils.data import init_dataloader, init_ssvae_dataloaders


def _data(n=60, seed=0):
    return np.random.RandomState(seed).rand(n, 6, 6).astype(np.float32)


def _params_close(a, b, atol=1e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-4)


def test_enum_schedule_matches_manual_two_phase():
    """run(4, enum_schedule=2) must reproduce the manual flip: 2 epochs
    exact, recompile, 2 epochs truncated — same PRNG chain."""
    X = _data()
    m1 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    m2 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t1 = SVItrainer(m1, seed=3)
    t2 = SVItrainer(m2, seed=3)
    l1 = init_dataloader(X, batch_size=20, seed=1)
    l2 = init_dataloader(X, batch_size=20, seed=1)

    sched = t1.run(l1, 4, enum_schedule=2)

    m2.enum_topk = 0
    t2._invalidate_compiled()
    manual = t2.run(l2, 2)
    m2.enum_topk = 2
    t2._invalidate_compiled()
    manual += t2.run(l2, 2)

    np.testing.assert_allclose(sched, manual, rtol=1e-6)
    _params_close(m1.params, m2.params)
    assert t1.current_epoch == 4
    assert len(t1.loss_history["training_loss"]) == 4


def test_enum_schedule_covering_all_epochs_is_exact():
    """enum_schedule >= epochs: the whole run is exact enumeration —
    identical to an enum_topk=0 model (truncation restored afterwards)."""
    X = _data(seed=1)
    m_ex = jiVAE((6, 6), 2, 4, ["r"], seed=0)
    m_sc = jiVAE((6, 6), 2, 4, ["r"], enum_topk=1, seed=0)
    t_ex = SVItrainer(m_ex, seed=5)
    t_sc = SVItrainer(m_sc, seed=5)
    a = t_ex.run(init_dataloader(X, batch_size=20, seed=2), 3)
    b = t_sc.run(init_dataloader(X, batch_size=20, seed=2), 3,
                 enum_schedule=10)
    np.testing.assert_allclose(a, b, rtol=1e-6)
    _params_close(m_ex.params, m_sc.params)
    assert m_sc.enum_topk == 1  # restored


def test_enum_schedule_noop_without_topk():
    X = _data(seed=2)
    m = jiVAE((6, 6), 2, 3, ["r"], seed=0)  # exact model
    t = SVItrainer(m, seed=1)
    out = t.run(init_dataloader(X, batch_size=20), 3, enum_schedule=1)
    assert len(out) == 3 and all(np.isfinite(out))


def test_enum_schedule_slices_scale_schedule():
    X = _data(seed=3)
    m1 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    m2 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t1, t2 = SVItrainer(m1, seed=7), SVItrainer(m2, seed=7)
    sched = [0.25, 0.5, 0.75, 1.0]
    l1 = init_dataloader(X, batch_size=20, seed=4)
    l2 = init_dataloader(X, batch_size=20, seed=4)  # ONE loader per trainer:
    # the shuffle chain must continue across the manual phases exactly as
    # the scheduled run continues it
    a = t1.run(l1, 4, enum_schedule=2, scale_schedule=sched)
    m2.enum_topk = 0
    t2._invalidate_compiled()
    b = t2.run(l2, 2, scale_schedule=sched[:2])
    m2.enum_topk = 2
    t2._invalidate_compiled()
    b += t2.run(l2, 2, scale_schedule=sched[2:])
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_fit_enum_schedule_jivae():
    X = _data(seed=4)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    tr = m.fit(X, epochs=4, batch_size=20, enum_schedule=2)
    assert len(tr.loss_history["training_loss"]) == 4
    assert all(np.isfinite(tr.loss_history["training_loss"]))
    assert m.enum_topk == 2


def test_fit_enum_schedule_verbose_rejected():
    X = _data(seed=5)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    with pytest.raises(ValueError, match="enum_schedule"):
        m.fit(X, epochs=2, batch_size=20, enum_schedule=1, verbose=True)


def test_ssivae_fit_enum_schedule():
    rs = np.random.RandomState(6)
    Xu = rs.rand(40, 6, 6).astype(np.float32)
    Xl = rs.rand(12, 6, 6).astype(np.float32)
    y = np.arange(12) % 3
    m = ssiVAE((6, 6), 2, 3, ["r"], enum_topk=2, seed=0)
    tr = m.fit(Xu, (Xl, y), epochs=4, batch_size=6, enum_schedule=2)
    assert len(tr.history["training_loss"]) == 4
    assert all(np.isfinite(tr.history["training_loss"]))
    assert m.enum_topk == 2


def test_enum_schedule_reuses_compiled_variants():
    """Repeated scheduled runs must swap the cached per-estimator step
    functions instead of re-tracing at every flip (the flip would
    otherwise dominate short runs)."""
    X = _data(seed=9)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t = SVItrainer(m, seed=11)
    loader = init_dataloader(X, batch_size=20)
    t.run(loader, 4, enum_schedule=2)
    variants = dict(t._enum_variants)
    exact_fn = variants[0]["_train_epoch_jit"]
    topk_fn = t._train_epoch_jit  # currently holding the topk variant
    assert exact_fn is not None and topk_fn is not None
    assert exact_fn is not topk_fn
    t.run(loader, 4, enum_schedule=2)
    # same function objects on the second scheduled run: no re-trace
    assert t._enum_variants[0]["_train_epoch_jit"] is exact_fn
    assert t._train_epoch_jit is topk_fn
    assert m.enum_topk == 2


def test_aux_run_enum_schedule_matches_manual():
    rs = np.random.RandomState(7)
    Xu = rs.rand(40, 6, 6).astype(np.float32)
    Xl = rs.rand(12, 6, 6).astype(np.float32)
    y = (np.arange(12) % 3).astype(np.int64)
    import jax.numpy as jnp
    y1h = jax.nn.one_hot(jnp.asarray(y), 3).astype(jnp.float32)

    def loaders():
        return init_ssvae_dataloaders(Xu, (Xl, y1h), (Xl, y1h), batch_size=8)

    m1 = ssiVAE((6, 6), 2, 3, ["r"], enum_topk=2, seed=0)
    m2 = ssiVAE((6, 6), 2, 3, ["r"], enum_topk=2, seed=0)
    t1 = auxSVItrainer(m1, seed=9)
    t2 = auxSVItrainer(m2, seed=9)
    lu1, ls1, _ = loaders()
    lu2, ls2, _ = loaders()

    a = t1.run(lu1, ls1, 4, enum_schedule=2)

    m2.enum_topk = 0
    t2._invalidate_compiled()
    b = t2.run(lu2, ls2, 2)
    m2.enum_topk = 2
    t2._invalidate_compiled()
    b += t2.run(lu2, ls2, 2)

    np.testing.assert_allclose(a, b, rtol=1e-6)
    _params_close(m1.params, m2.params)


# ----------------------------------------------------------------------
# enum_schedule="auto": guide-concentration-triggered switch
# ----------------------------------------------------------------------

def test_enum_auto_immediate_flip_matches_fixed_schedule():
    """With a threshold any guide clears, auto flips at the FIRST probe
    (epoch 5) — the whole run must reproduce enum_schedule=5 exactly."""
    X = _data(seed=4)
    m1 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    m2 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t1, t2 = SVItrainer(m1, seed=9), SVItrainer(m2, seed=9)
    l1 = init_dataloader(X, batch_size=20, seed=5)
    l2 = init_dataloader(X, batch_size=20, seed=5)
    auto = t1.run(l1, 8, enum_schedule=("auto", 1e-9))
    fixed = t2.run(l2, 8, enum_schedule=5)
    np.testing.assert_allclose(auto, fixed, rtol=1e-6)
    _params_close(m1.params, m2.params)
    assert t1.enum_switch_epoch == 5
    assert m1.enum_topk == 2  # restored


def test_enum_auto_never_flips_at_threshold_one():
    """threshold=1.0 is unreachable for a soft guide: the whole run stays
    exact — identical to an all-exact schedule."""
    X = _data(seed=5)
    m1 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=1, seed=0)
    m2 = jiVAE((6, 6), 2, 4, ["r"], enum_topk=1, seed=0)
    t1, t2 = SVItrainer(m1, seed=11), SVItrainer(m2, seed=11)
    l1 = init_dataloader(X, batch_size=20, seed=6)
    l2 = init_dataloader(X, batch_size=20, seed=6)
    auto = t1.run(l1, 6, enum_schedule=("auto", 1.0))
    exact = t2.run(l2, 6, enum_schedule=100)
    np.testing.assert_allclose(auto, exact, rtol=1e-6)
    assert t1.enum_switch_epoch is None


def test_enum_auto_plain_string_defaults():
    X = _data(seed=6)
    m = jiVAE((6, 6), 2, 3, ["r"], enum_topk=1, seed=0)
    t = SVItrainer(m, seed=1)
    out = t.run(init_dataloader(X, batch_size=20, seed=7), 6,
                enum_schedule="auto")
    assert len(out) == 6 and all(np.isfinite(out))
    assert m.enum_topk == 1


def test_enum_auto_threshold_validation():
    X = _data(seed=7)
    m = jiVAE((6, 6), 2, 3, ["r"], enum_topk=1, seed=0)
    t = SVItrainer(m, seed=1)
    with pytest.raises(ValueError, match="threshold"):
        t.run(init_dataloader(X, batch_size=20), 4,
              enum_schedule=("auto", 1.5))


def test_guide_probs_shapes_and_normalization():
    X = _data(n=16, seed=8)
    jm = jiVAE((6, 6), 2, 5, ["r"], seed=0)
    p = np.asarray(jm.guide_probs(X))
    assert p.shape == (16, 5)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)
    sm = ssiVAE((6, 6), 2, num_classes=4, seed=0)
    p = np.asarray(sm.guide_probs(X))
    assert p.shape == (16, 4)
    np.testing.assert_allclose(p.sum(-1), 1.0, rtol=1e-5)


def test_enum_auto_aux_trainer_ssivae():
    X = _data(n=60, seed=9)
    y = np.eye(3, dtype=np.float32)[np.random.RandomState(0).randint(0, 3, 30)]
    m = ssiVAE((6, 6), 2, num_classes=3, enum_topk=1, seed=0)
    loaders = init_ssvae_dataloaders(X[:30], (X[30:], y), (X[30:], y),
                                     batch_size=10)
    t = auxSVItrainer(m)
    out = t.run(loaders[0], loaders[1], 8, enum_schedule=("auto", 1e-9))
    assert len(out) == 8 and all(np.isfinite(out))
    assert t.enum_switch_epoch == 5
    assert m.enum_topk == 1


def test_enum_auto_probe_history_recorded():
    """Every probe lands in trainer.enum_probe_history as (epoch, mass)."""
    X = _data(seed=10)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t = SVItrainer(m, seed=1)
    t.run(init_dataloader(X, batch_size=20, seed=8), 11,
          enum_schedule=("auto", 1.0))
    assert [e for e, _ in t.enum_probe_history] == [5, 10]
    assert all(0.0 < mass <= 1.0 for _, mass in t.enum_probe_history)
    assert t.enum_switch_epoch is None


def test_config_accepts_auto_schedule():
    from pyroved_tpu.config import TrainConfig
    TrainConfig(enum_schedule="auto")
    TrainConfig(enum_schedule=5)
    with pytest.raises(ValueError, match="auto"):
        TrainConfig(enum_schedule="bogus")


# ---------------------------------------------------------------------------
# regression: state interactions found in the round-5 review
# ---------------------------------------------------------------------------
def test_enum_schedule_after_early_stopped_run_trains():
    """A stale stopped_early=True from an earlier early-stopped run must
    not skip a later enum_schedule run (run() enters the schedule path
    BEFORE _seg_route's reset)."""
    X = _data(seed=11)
    Xt = _data(n=20, seed=12)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t = SVItrainer(m, seed=3)
    loader = init_dataloader(X, batch_size=20, seed=1)
    tl = init_dataloader(Xt, batch_size=20, seed=1)
    # min_delta huge => "never improves" => stops right after patience
    t.run(loader, 10, test_loader=tl, patience=1, min_delta=1e9)
    assert t.stopped_early
    n0 = t.current_epoch
    # E=0: the exact phase is empty, so nothing resets the flag en route
    out = t.run(loader, 3, enum_schedule=0)
    assert len(out) == 3 and t.current_epoch == n0 + 3
    # auto: the while-loop guard reads the flag before the first phase
    out = t.run(loader, 3, enum_schedule=("auto", 1.0))
    assert len(out) == 3 and t.current_epoch == n0 + 6


def test_enum_auto_rejects_streaming_loader_without_upload():
    """The auto guard must check device_resident — touching the
    device_arrays PROPERTY would silently upload the full host set."""
    from pyroved_tpu.utils.data import DataLoader
    X = _data(seed=13)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t = SVItrainer(m, seed=3)
    loader = DataLoader(X, batch_size=20, seed=1, device_resident=False)
    with pytest.raises(ValueError, match="device-resident"):
        t.run(loader, 4, enum_schedule="auto")
    assert loader._device_arrays is None  # no silent device_put


def test_enum_auto_patience_spans_probe_phases():
    """patience >= the 5-epoch probe interval must still be able to fire:
    the early-stop baseline is carried across the auto loop's probe
    sub-runs instead of resetting every 5 epochs."""
    X = _data(seed=14)
    Xt = _data(n=20, seed=15)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t = SVItrainer(m, seed=3)
    loader = init_dataloader(X, batch_size=20, seed=1)
    tl = init_dataloader(Xt, batch_size=20, seed=1)
    # threshold 1.0: never flips, so the whole run is exact-phase probes;
    # min_delta huge: best_epoch pins to epoch 1, so patience=7 must stop
    # the run at epoch >= 8 — well before the requested 20
    t.run(loader, 20, test_loader=tl, patience=7, min_delta=1e9,
          enum_schedule=("auto", 1.0))
    assert t.stopped_early
    assert t.current_epoch < 20
    assert m.enum_topk == 2  # restored after the scheduled run


def test_enum_schedule_composes_with_pixel_chunks():
    """The estimator schedule and the pixel partition are independent
    levers: a scheduled run with pixel_chunks must reproduce the
    scheduled full-grid run (the partition is exact) to f32 tolerance."""
    X = _data(seed=16)
    m_full = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    m_chunk = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, pixel_chunks=3,
                    seed=0)
    t_full = SVItrainer(m_full, seed=3)
    t_chunk = SVItrainer(m_chunk, seed=3)
    a = t_full.run(init_dataloader(X, batch_size=20, seed=1), 4,
                   enum_schedule=2)
    b = t_chunk.run(init_dataloader(X, batch_size=20, seed=1), 4,
                    enum_schedule=2)
    np.testing.assert_allclose(a, b, rtol=2e-4)
    _params_close(m_full.params, m_chunk.params, atol=2e-3)


def test_pixel_flip_between_scheduled_runs_retraces_stashed_variants():
    """A pixel-mode flip after an enum_schedule run must invalidate the
    STASHED estimator variants too: restoring a variant compiled under
    the old pixel mode has to retrace (the rebuild gate catches the
    stale pixel key on the restored _built_gate)."""
    X = _data(seed=17)
    m = jiVAE((6, 6), 2, 4, ["r"], enum_topk=2, seed=0)
    t = SVItrainer(m, seed=3)
    loader = init_dataloader(X, batch_size=20, seed=1)
    t.run(loader, 2, enum_schedule=1)  # builds + stashes both variants
    m.pixel_chunks = 3
    losses = t.run(loader, 2, enum_schedule=1)
    assert np.isfinite(losses).all()
    assert t._built_gate[1][0] == "chunk"
