"""Trainer smoke tests (mirrors reference tests/test_trainers.py: short
training on random data; loss finite and decreasing-ish; weights change)."""
import numpy as np
import pytest

import jax

from pyroved_tpu.models import iVAE
from pyroved_tpu.trainers import SVItrainer
from pyroved_tpu.utils import init_dataloader

DATA_2D = (8, 8)


def _rand_imgs(n=64):
    return np.random.default_rng(0).uniform(0, 1, (n,) + DATA_2D).astype(np.float32)


def _params_changed(p0, p1):
    flat0 = jax.tree_util.tree_leaves(p0)
    flat1 = jax.tree_util.tree_leaves(p1)
    return any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(flat0, flat1))


@pytest.mark.parametrize("invariances", [None, ["r"]])
def test_trainer_two_epochs(invariances):
    model = iVAE(DATA_2D, latent_dim=2, invariances=invariances)
    p0 = jax.device_get(model.params)
    loader = init_dataloader(_rand_imgs(), batch_size=16)
    trainer = SVItrainer(model)
    for _ in range(2):
        trainer.step(loader)
    assert len(trainer.loss_history["training_loss"]) == 2
    assert all(np.isfinite(v) for v in trainer.loss_history["training_loss"])
    assert _params_changed(p0, model.params)


def test_trainer_with_test_loader_and_eval_does_not_update():
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    loader = init_dataloader(_rand_imgs(48), batch_size=16)
    test_loader = init_dataloader(_rand_imgs(32), batch_size=16)
    trainer = SVItrainer(model)
    trainer.step(loader, test_loader)
    p_after = jax.device_get(model.params)
    trainer.evaluate(test_loader)
    assert not _params_changed(p_after, model.params)
    assert len(trainer.loss_history["test_loss"]) == 1


def test_trainer_conditional_batches():
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], c_dim=3)
    y = np.eye(3, dtype=np.float32)[np.random.default_rng(0).integers(0, 3, 64)]
    loader = init_dataloader(_rand_imgs(), y, batch_size=16)
    trainer = SVItrainer(model)
    trainer.step(loader)
    assert np.isfinite(trainer.loss_history["training_loss"][0])


def test_partial_batch_padding_matches_dataset_size():
    # 50 examples, batch 16 -> padded 4th batch must not distort the loss scale
    model = iVAE(DATA_2D, latent_dim=2, invariances=None, kl="analytic")
    x = _rand_imgs(50)
    loader = init_dataloader(x, batch_size=16)
    trainer = SVItrainer(model)
    loss = trainer.train(loader)
    assert np.isfinite(loss)
    # the same data with a divisor batch size gives a loss in the same range
    model2 = iVAE(DATA_2D, latent_dim=2, invariances=None, kl="analytic")
    loader2 = init_dataloader(x, batch_size=10)
    trainer2 = SVItrainer(model2)
    loss2 = trainer2.train(loader2)
    assert abs(loss - loss2) / abs(loss) < 0.2


def test_scale_factor_kwarg():
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    loader = init_dataloader(_rand_imgs(32), batch_size=16)
    trainer = SVItrainer(model)
    trainer.step(loader, scale_factor=3.0)
    assert np.isfinite(trainer.loss_history["training_loss"][0])


def test_loss_decreases_on_structured_data():
    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 16)
    shifts = rng.uniform(-0.2, 0.2, 128)
    X = np.exp(-((t[None] - 0.5 - shifts[:, None]) ** 2) / 0.01).astype(np.float32)
    model = iVAE((16,), latent_dim=2, invariances=["t"], dx_prior=0.3)
    loader = init_dataloader(X, batch_size=32)
    trainer = SVItrainer(model)
    for _ in range(15):
        trainer.step(loader)
    hist = trainer.loss_history["training_loss"]
    assert hist[-1] < hist[0]


def test_fit_convenience():
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    trainer = model.fit(_rand_imgs(32), epochs=2, batch_size=16)
    assert len(trainer.loss_history["training_loss"]) == 2
    assert all(np.isfinite(v) for v in trainer.loss_history["training_loss"])


def test_fit_ssivae_convenience():
    from pyroved_tpu.models import ssiVAE
    rng = np.random.default_rng(0)
    X_unsup = _rand_imgs(32)
    Xl = _rand_imgs(16)
    yl = rng.integers(0, 3, 16)
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3)
    trainer = m.fit(X_unsup, (Xl, yl), epochs=1, batch_size=8)
    assert len(trainer.history["training_loss"]) == 1
    assert 0.0 <= trainer.history["test"][-1] <= 1.0


def test_trace_elbo_loss_arg():
    from pyroved_tpu.infer import TraceELBO
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    SVItrainer(model, loss=TraceELBO(num_particles=3, kl="analytic"))
    assert model.num_particles == 3 and model.kl_mode == "analytic"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        TraceELBO(kl="exact")


def test_golden_rvae_loss_band():
    """Regression guard: 3 epochs of the flagship config on fixed synthetic
    data must land in a tight loss band (catches silent numerics drift)."""
    rng = np.random.default_rng(7)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 12), np.linspace(-1, 1, 12),
                         indexing="ij")
    th = rng.uniform(0, 2 * np.pi, 256)
    xr = xx[None] * np.cos(th)[:, None, None] - yy[None] * np.sin(th)[:, None, None]
    X = np.exp(-(xr ** 2) / 0.05 - (yy[None] ** 2) / 0.3).astype(np.float32)
    model = iVAE((12, 12), latent_dim=2, invariances=["r"], seed=1)
    trainer = SVItrainer(model, seed=1)
    loader = init_dataloader(X, batch_size=64, seed=1)
    for _ in range(3):
        trainer.step(loader)
    final = trainer.loss_history["training_loss"][-1]
    # band measured on the reference implementation of this exact config
    assert 40.0 < final < 110.0, final
    assert trainer.loss_history["training_loss"][0] > final


def test_remat_matches_plain():
    x = _rand_imgs(32)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    t1 = SVItrainer(m1, seed=2)
    t2 = SVItrainer(m2, seed=2, remat=True)
    l1 = t1.train(init_dataloader(x, batch_size=16, seed=5))
    l2 = t2.train(init_dataloader(x, batch_size=16, seed=5))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_streaming_rejects_growing_batches():
    """A generic iterable whose later batch is LARGER than the first must
    raise a clear error instead of crashing inside padding."""
    model = iVAE(DATA_2D, latent_dim=2, invariances=None)
    trainer = SVItrainer(model)
    batches = [(np.zeros((4,) + DATA_2D, np.float32),),
               (np.zeros((8,) + DATA_2D, np.float32),)]
    with pytest.raises(ValueError, match="larger than the first"):
        trainer.train(iter(batches))


def test_decode_batch_size_chunking():
    """decode(batch_size=) must chunk large z and match the one-shot path."""
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    z = np.random.default_rng(0).normal(size=(37, 2)).astype(np.float32)
    full = np.asarray(model.decode(z))
    chunked = np.asarray(model.decode(z, batch_size=10))
    assert chunked.shape == (37,) + DATA_2D
    np.testing.assert_allclose(chunked, full, atol=1e-5)


def test_chunked_single_compile_per_bucket():
    """_chunked pads EVERY chunk to batch_size, so distinct short input
    lengths reuse one compiled shape."""
    model = iVAE(DATA_2D, latent_dim=2, invariances=None)
    shapes_seen = []

    @jax.jit
    def probe(p, x):
        shapes_seen.append(x.shape)
        return x * 2.0

    for n in (3, 5, 7):
        out = model._chunked(probe, np.ones((n, 4), np.float32), batch_size=8)
        assert out.shape == (n, 4)
    assert set(shapes_seen) == {(8, 4)}  # traced once, one padded shape


def test_run_multi_epoch_matches_sequential():
    """run(E) (one fused device dispatch) must reproduce E sequential
    train() calls bitwise: same PRNG chain, same shuffles, same updates."""
    x = _rand_imgs(48)

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    l1 = init_dataloader(x, batch_size=16, seed=3)
    seq = [t1.train(l1) for _ in range(3)]

    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9)
    l2 = init_dataloader(x, batch_size=16, seed=3)
    fused = t2.run(l2, 3)

    # reported losses match up to f32 summation order (host vs device sum);
    # the parameter trajectories are BITWISE identical
    np.testing.assert_allclose(seq, fused, rtol=1e-6)
    assert t2.loss_history["training_loss"] == fused
    assert t2.current_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_scale_schedule_matches_sequential_annealing():
    """run(scale_schedule=[...]) (KL annealing inside the fused scan) must
    reproduce sequential train(scale_factor=f(epoch)) calls bitwise."""
    x = _rand_imgs(48)
    schedule = [0.1, 0.5, 1.0]

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    l1 = init_dataloader(x, batch_size=16, seed=3)
    seq = [t1.train(l1, scale_factor=s) for s in schedule]

    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9)
    l2 = init_dataloader(x, batch_size=16, seed=3)
    fused = t2.run(l2, 3, scale_schedule=schedule)
    np.testing.assert_allclose(seq, fused, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="scale_schedule has 3"):
        t2.run(l2, 5, scale_schedule=schedule)


def test_run_with_test_loader_matches_sequential_step():
    """run(E, test_loader=) (train + held-out eval fused into one dispatch)
    must reproduce E sequential step(train, test) calls: same PRNG split
    order, bitwise parameter trajectory, matching train/test histories."""
    x = _rand_imgs(48)
    xt = _rand_imgs(24)

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    l1 = init_dataloader(x, batch_size=16, seed=3)
    tl1 = init_dataloader(xt, batch_size=16, seed=5)
    for _ in range(3):
        t1.step(l1, tl1)

    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9)
    l2 = init_dataloader(x, batch_size=16, seed=3)
    tl2 = init_dataloader(xt, batch_size=16, seed=5)
    fused = t2.run(l2, 3, test_loader=tl2)

    np.testing.assert_allclose(t1.loss_history["training_loss"], fused,
                               rtol=1e-6)
    np.testing.assert_allclose(t1.loss_history["test_loss"],
                               t2.loss_history["test_loss"], rtol=1e-6)
    assert t2.current_epoch == 3
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_with_test_data_uses_fused_run():
    """fit(test_data=...) routes through the fused run-with-eval path and
    still records per-epoch test losses."""
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=1)
    tr = m.fit(x, epochs=3, batch_size=16, test_data=xt)
    assert len(tr.loss_history["training_loss"]) == 3
    assert len(tr.loss_history["test_loss"]) == 3
    assert all(np.isfinite(v) for v in tr.loss_history["test_loss"])


def test_run_with_streaming_test_loader_falls_back():
    """A non-device-resident test loader falls back to per-epoch step()
    bookkeeping (epoch_times recorded), same histories filled."""
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=1)
    t = SVItrainer(m, seed=2)
    loader = init_dataloader(x, batch_size=16, seed=3)
    test_loader = init_dataloader(xt, batch_size=16, seed=4,
                                  device_resident=False)
    out = t.run(loader, 2, test_loader=test_loader)
    assert len(out) == 2
    assert len(t.loss_history["test_loss"]) == 2
    assert len(t.epoch_times) == 2


def test_run_streaming_fallback():
    model = iVAE(DATA_2D, latent_dim=2, invariances=None)
    trainer = SVItrainer(model)
    loader = init_dataloader(_rand_imgs(32), batch_size=16,
                             device_resident=False)
    losses = trainer.run(loader, 2)
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)
    # the fallback must keep run()'s bookkeeping contract
    assert trainer.loss_history["training_loss"] == losses
    assert trainer.current_epoch == 2
    assert trainer.run(loader, 0) == []  # no-op, no crash


def test_streaming_error_leaves_model_usable():
    """The jitted step donates params; an oversized-batch error mid-epoch
    must NOT leave the model pointing at deleted buffers."""
    model = iVAE(DATA_2D, latent_dim=2, invariances=None)
    trainer = SVItrainer(model)
    good = (np.zeros((4,) + DATA_2D, np.float32),)
    bad = (np.zeros((8,) + DATA_2D, np.float32),)
    with pytest.raises(ValueError, match="larger than the first"):
        trainer.train(iter([good, bad]))
    # params are live (the good step's result), and training continues
    assert np.isfinite(float(jax.tree_util.tree_leaves(model.params)[0].sum()))
    loss = trainer.train(iter([good, good]))
    assert np.isfinite(loss)


def test_full_training_determinism():
    """Same seeds -> bitwise-identical loss history (RNG discipline)."""
    x = _rand_imgs(48)

    def run():
        model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=11)
        trainer = SVItrainer(model, seed=13)
        loader = init_dataloader(x, batch_size=16, seed=17)
        for _ in range(3):
            trainer.step(loader)
        return trainer.loss_history["training_loss"]

    np.testing.assert_array_equal(run(), run())


def test_fusion_gate_rechecked_on_reshard():
    """Re-sharding decoder params AFTER the first compile must flip the
    fusion gate and rebuild the compiled steps on the next train() entry
    (VERDICT r2 weak #6) — not replay a stale fused step."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    model._fused = True  # simulate the TPU gate; small shapes route to XLA
    loader = init_dataloader(_rand_imgs(32), batch_size=16)
    trainer = SVItrainer(model)
    trainer.train(loader)
    built = trainer._train_epoch_jit
    # gate = (fusion_gate, pixel_mode_key) since the shard_pixels-staleness fix
    assert model._fused is True and trainer._built_gate[0] is True

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("model",))

    def shard(leaf):
        if leaf.ndim >= 1 and leaf.shape[-1] % 8 == 0:
            spec = P(*([None] * (leaf.ndim - 1)), "model")
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return leaf

    model.params["decoder"] = jax.tree_util.tree_map(
        shard, model.params["decoder"])
    with pytest.warns(UserWarning, match="disabling the fused"):
        trainer.train(loader)
    assert model._fused is False
    assert trainer._train_epoch_jit is not built  # retraced, not stale


def test_streaming_path_matches_device_resident_exactly():
    """The streaming (per-batch upload) path must train to the SAME loss
    and parameters as the device-resident scan path: same shuffle (seed,
    epoch)-keyed permutation, same per-step RNG chain, and zero-weight
    padding makes the differing pad rows (zeros vs row 0) gradient-inert
    (VERDICT r2 next-step #7 regression guard)."""
    x = _rand_imgs(52)  # deliberately not a multiple of the batch size

    def run(resident, chunks=0):
        m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
        t = SVItrainer(m, seed=9)
        loader = init_dataloader(x, batch_size=16, seed=3,
                                 device_resident=resident,
                                 stream_chunks=chunks)
        losses = [t.train(loader) for _ in range(3)]
        return losses, m.params

    l_res, p_res = run(True)
    l_str, p_str = run(False)
    # chunked streaming (2 batches per uploaded chunk; 4 batches/epoch so
    # the short-final-chunk path is exercised too)
    l_chk, p_chk = run(False, chunks=3)
    np.testing.assert_allclose(l_res, l_str, rtol=1e-6)
    np.testing.assert_allclose(l_res, l_chk, rtol=1e-6)
    for pv in (p_str, p_chk):
        for a, b in zip(jax.tree_util.tree_leaves(p_res),
                        jax.tree_util.tree_leaves(pv)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-7)


def test_run_segmented_logging_matches_pure_fused(tmp_path):
    """run() with log_file set splits into fused segments; the parameter
    trajectory must stay bitwise identical to the pure single-dispatch run
    and the JSONL must hold one record per epoch."""
    import json
    x = _rand_imgs(48)

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    pure = t1.run(init_dataloader(x, batch_size=16, seed=3), 5)

    log = tmp_path / "train.jsonl"
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9, log_file=str(log))
    seg = t2.run(init_dataloader(x, batch_size=16, seed=3), 5)

    np.testing.assert_allclose(pure, seg, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == [1, 2, 3, 4, 5]
    assert all(np.isfinite(r["training_loss"]) for r in records)
    assert all(r["epoch_seconds"] > 0 for r in records)


def test_run_segmented_checkpoints_at_step_loop_epochs(tmp_path):
    """run() with checkpoint_path/checkpoint_every must write checkpoints at
    exactly the epochs a step() loop would (multiples of checkpoint_every),
    including across a second run that starts off-boundary."""
    path = str(tmp_path / "auto.msgpack")
    x = _rand_imgs(48)
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t = SVItrainer(m, seed=9, checkpoint_path=path, checkpoint_every=5)
    loader = init_dataloader(x, batch_size=16, seed=3)
    t.run(loader, 7)  # boundary at epoch 5
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=1)
    t2 = SVItrainer(m2, checkpoint_path=path)
    assert t2.resume() == 5
    t.run(loader, 3)  # epochs 8..10 -> boundary at 10
    m3 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=1)
    t3 = SVItrainer(m3, checkpoint_path=path)
    assert t3.resume() == 10
    assert t.current_epoch == 10


def test_run_segmented_schedule_and_test_loader(tmp_path):
    """Segmented run must thread scale_schedule slices and the fused
    test-loader eval through each segment: bitwise trajectory vs the
    unsegmented run, test_loss in every JSONL record."""
    import json
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    schedule = [0.2, 0.4, 0.6, 0.8, 1.0]

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    pure = t1.run(init_dataloader(x, batch_size=16, seed=3), 5,
                  scale_schedule=schedule,
                  test_loader=init_dataloader(xt, batch_size=16, seed=5))

    log = tmp_path / "train.jsonl"
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9, log_file=str(log), checkpoint_path=None)
    seg = t2.run(init_dataloader(x, batch_size=16, seed=3), 5,
                 scale_schedule=schedule,
                 test_loader=init_dataloader(xt, batch_size=16, seed=5))

    np.testing.assert_allclose(pure, seg, rtol=1e-6)
    np.testing.assert_allclose(t1.loss_history["test_loss"],
                               t2.loss_history["test_loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(records) == 5 and all("test_loss" in r for r in records)


def test_fit_with_log_and_checkpoint_stays_fused(tmp_path):
    """fit() with log_file/checkpoint_path now routes through the segmented
    fused run (no per-epoch step() loop) and still produces the artifacts."""
    import json, os
    log = tmp_path / "fit.jsonl"
    ckpt = str(tmp_path / "fit.msgpack")
    x = _rand_imgs(48)
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=1)
    tr = m.fit(x, epochs=4, batch_size=16, log_file=str(log),
               checkpoint_path=ckpt, checkpoint_every=2)
    assert len(tr.loss_history["training_loss"]) == 4
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == [1, 2, 3, 4]
    assert os.path.exists(ckpt)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=5)
    t2 = SVItrainer(m2, checkpoint_path=ckpt)
    assert t2.resume() == 4


def test_early_stopping_fires_and_truncates():
    """patience= stops the run when the held-out loss plateaus, with the
    parameter trajectory up to the stop identical to an uncapped run."""
    x = _rand_imgs(48)
    xt = _rand_imgs(24)
    # pure noise: the test loss stops improving almost immediately
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    t = SVItrainer(m, seed=9)
    out = t.run(init_dataloader(x, batch_size=16, seed=3), 60,
                test_loader=init_dataloader(xt, batch_size=16, seed=5),
                patience=4, min_delta=5.0)  # large min_delta forces a stop
    assert t.stopped_early
    assert len(out) < 60
    assert len(t.loss_history["test_loss"]) == len(out)
    assert t.current_epoch == len(out)


def test_early_stopping_not_fired_when_improving():
    """A short run on structured data keeps improving -> no early stop."""
    rng = np.random.default_rng(1)
    t_ax = np.linspace(0, 1, 16)
    shifts = rng.uniform(-0.2, 0.2, 96)
    X = np.exp(-((t_ax[None] - 0.5 - shifts[:, None]) ** 2) / 0.01).astype(np.float32)
    m = iVAE((16,), latent_dim=2, invariances=["t"], dx_prior=0.3, seed=7)
    t = SVItrainer(m, seed=9)
    out = t.run(init_dataloader(X[:64], batch_size=16, seed=3), 12,
                test_loader=init_dataloader(X[64:], batch_size=16, seed=5),
                patience=12)
    assert not t.stopped_early
    assert len(out) == 12


def test_early_stopping_requires_test_loader():
    m = iVAE(DATA_2D, latent_dim=2, invariances=None)
    t = SVItrainer(m)
    with pytest.raises(ValueError, match="patience"):
        t.run(init_dataloader(_rand_imgs(32), batch_size=16), 5, patience=3)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=None)
    with pytest.raises(ValueError, match="patience"):
        m2.fit(_rand_imgs(32), epochs=5, batch_size=16, patience=3)


def test_fit_early_stopping_fused_and_verbose_agree():
    """fit(patience=) stops at the same epoch through the fused segmented
    path and the verbose step() loop (same PRNG chain either way)."""
    x = _rand_imgs(48)
    xt = _rand_imgs(24)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    t1 = m1.fit(x, epochs=40, batch_size=16, test_data=xt,
                patience=3, min_delta=5.0)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    t2 = m2.fit(x, epochs=40, batch_size=16, test_data=xt,
                patience=3, min_delta=5.0, verbose=True)
    assert t1.stopped_early and t2.stopped_early
    # fused checks at segment ends (cap min(10, patience)) so it may
    # overshoot the step-loop's stopping epoch by < one segment
    assert 0 <= t1.current_epoch - t2.current_epoch < 3


def test_on_segment_callback():
    """run(on_segment=fn) fires at every fused-segment drain with one
    record per new epoch, without changing the trajectory."""
    x = _rand_imgs(48)
    records = []

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    out = t1.run(init_dataloader(x, batch_size=16, seed=3), 25,
                 on_segment=records.extend)
    assert [r["epoch"] for r in records] == list(range(1, 26))
    np.testing.assert_allclose([r["training_loss"] for r in records], out,
                               rtol=1e-12)

    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9)
    plain = t2.run(init_dataloader(x, batch_size=16, seed=3), 25)
    np.testing.assert_allclose(out, plain, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_on_segment_callback_with_test_loader():
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    records = []
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t = SVItrainer(m, seed=9)
    t.run(init_dataloader(x, batch_size=16, seed=3), 12,
          test_loader=init_dataloader(xt, batch_size=16, seed=5),
          on_segment=records.extend)
    assert len(records) == 12 and all("test_loss" in r for r in records)


def test_optax_schedule_threads_through_segments():
    """An optax LR schedule (count-based) must see a monotonically
    increasing step count through pipelined/segmented fused runs — the
    trajectory matches the same schedule run per-epoch."""
    import optax
    x = _rand_imgs(48)
    sched = optax.cosine_decay_schedule(1e-2, decay_steps=40)

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, optimizer=optax.adam(sched), seed=9)
    l1 = init_dataloader(x, batch_size=16, seed=3)
    seq = [t1.train(l1) for _ in range(8)]

    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, optimizer=optax.adam(sched), seed=9)
    fused = t2.run(init_dataloader(x, batch_size=16, seed=3), 8)
    np.testing.assert_allclose(seq, fused, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_on_segment_forwards():
    """fit(on_segment=) reaches the fused run's callback (and the verbose
    step loop's per-epoch equivalent)."""
    x = _rand_imgs(48)
    recs = []
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=1)
    m.fit(x, epochs=8, batch_size=16, on_segment=recs.extend)
    assert [r["epoch"] for r in recs] == list(range(1, 9))
    recs2 = []
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=1)
    m2.fit(x, epochs=3, batch_size=16, verbose=True, on_segment=recs2.extend)
    assert [r["epoch"] for r in recs2] == [1, 2, 3]


def test_stopped_early_resets_between_fits():
    """A later run/fit must clear a stale stopped_early=True from an
    earlier early-stopped run — on both the fused and step-loop paths."""
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=1)
    t = SVItrainer(m, seed=2)
    t.run(init_dataloader(x, batch_size=16, seed=3), 30,
          test_loader=init_dataloader(xt, batch_size=16, seed=4),
          patience=2, min_delta=10.0)
    assert t.stopped_early
    m.fit(x, epochs=2, batch_size=16, trainer=t, verbose=True)
    assert not t.stopped_early


def test_pipelined_checkpoint_every_segment(tmp_path):
    """checkpoint_every=1 makes every pipelined segment a boundary: the
    on-device state snapshots and per-boundary saves must keep up with
    dispatch-ahead, and the final checkpoint holds the last epoch."""
    path = str(tmp_path / "dense.msgpack")
    x = _rand_imgs(48)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    t = SVItrainer(m, seed=9, checkpoint_path=path, checkpoint_every=1)
    t.run(init_dataloader(x, batch_size=16, seed=3), 8)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=1)
    t2 = SVItrainer(m2, checkpoint_path=path)
    assert t2.resume() == 8
    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_segmented_everything_enabled_matches_sequential(tmp_path):
    """All host-work features at once — JSONL log, auto-checkpoint,
    scale_schedule, fused test eval, on_segment callback — through the
    pipelined runner: trajectory bitwise equal to sequential step()."""
    import json
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    schedule = [0.2 + 0.1 * i for i in range(8)]

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t1 = SVItrainer(m1, seed=9)
    l1 = init_dataloader(x, batch_size=16, seed=3)
    tl1 = init_dataloader(xt, batch_size=16, seed=5)
    for s in schedule:
        t1.step(l1, tl1, scale_factor=s)

    recs = []
    log = tmp_path / "all.jsonl"
    ckpt = str(tmp_path / "all.msgpack")
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t2 = SVItrainer(m2, seed=9, log_file=str(log), checkpoint_path=ckpt,
                    checkpoint_every=3)
    out = t2.run(init_dataloader(x, batch_size=16, seed=3), 8,
                 scale_schedule=schedule,
                 test_loader=init_dataloader(xt, batch_size=16, seed=5),
                 on_segment=recs.extend)

    np.testing.assert_allclose(t1.loss_history["training_loss"], out,
                               rtol=1e-6)
    np.testing.assert_allclose(t1.loss_history["test_loss"],
                               t2.loss_history["test_loss"], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    records = [json.loads(l) for l in log.read_text().splitlines()]
    assert [r["epoch"] for r in records] == list(range(1, 9))
    assert [r["epoch"] for r in recs] == list(range(1, 9))
    assert all("test_loss" in r for r in records)
    m3 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=2)
    t3 = SVItrainer(m3, checkpoint_path=ckpt)
    assert t3.resume() == 6  # last multiple of checkpoint_every


def test_segment_machinery_config_fuzz(tmp_path):
    """Randomized configs (epoch counts, checkpoint cadences, log on/off,
    schedule on/off, eval on/off) all produce trajectories bitwise equal
    to a sequential step() loop — covers segment-boundary arithmetic the
    fixed tests might miss."""
    rng = np.random.default_rng(0)
    x = _rand_imgs(48)
    xt = _rand_imgs(16)
    for trial in range(5):
        epochs = int(rng.integers(1, 18))
        use_log = bool(rng.integers(0, 2))
        use_ckpt = bool(rng.integers(0, 2))
        every = int(rng.integers(1, 8))
        use_sched = bool(rng.integers(0, 2))
        use_eval = bool(rng.integers(0, 2))
        sched = ([float(s) for s in rng.uniform(0.1, 1.0, epochs)]
                 if use_sched else None)

        m1 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
        t1 = SVItrainer(m1, seed=9)
        l1 = init_dataloader(x, batch_size=16, seed=3)
        tl1 = init_dataloader(xt, batch_size=16, seed=5) if use_eval else None
        for e in range(epochs):
            t1.step(l1, tl1, scale_factor=sched[e] if sched else 1.0)

        tkw = {}
        if use_log:
            tkw["log_file"] = str(tmp_path / f"f{trial}.jsonl")
        if use_ckpt:
            tkw["checkpoint_path"] = str(tmp_path / f"f{trial}.msgpack")
            tkw["checkpoint_every"] = every
        m2 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
        t2 = SVItrainer(m2, seed=9, **tkw)
        rkw = {}
        if sched:
            rkw["scale_schedule"] = sched
        if use_eval:
            rkw["test_loader"] = init_dataloader(xt, batch_size=16, seed=5)
        out = t2.run(init_dataloader(x, batch_size=16, seed=3), epochs, **rkw)

        cfg = dict(epochs=epochs, log=use_log, ckpt=use_ckpt, every=every,
                   sched=use_sched, eval=use_eval)
        np.testing.assert_allclose(t1.loss_history["training_loss"], out,
                                   rtol=1e-6, err_msg=str(cfg))
        for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                        jax.tree_util.tree_leaves(m2.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(cfg))
        if use_ckpt and epochs >= every:
            m3 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=1)
            t3 = SVItrainer(m3, checkpoint_path=tkw["checkpoint_path"])
            assert t3.resume() == (epochs // every) * every, cfg


def test_early_stopping_reports_best_epoch():
    """patience= runs expose best_epoch/best_metric (the monitored
    held-out loss at its minimum)."""
    x = _rand_imgs(48)
    xt = _rand_imgs(24)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    t = SVItrainer(m, seed=9)
    assert t.best_epoch is None
    t.run(init_dataloader(x, batch_size=16, seed=3), 40,
          test_loader=init_dataloader(xt, batch_size=16, seed=5),
          patience=4, min_delta=5.0)
    assert t.stopped_early
    assert 1 <= t.best_epoch <= t.current_epoch
    te = t.loss_history["test_loss"]
    # best_metric is the value at best_epoch; with min_delta, "best" only
    # advances on improvements > min_delta, so it sits within min_delta
    # of the true minimum (standard early-stopping semantics)
    assert t.best_metric == te[t.best_epoch - 1]
    assert t.best_metric <= min(te) + 5.0 + 1e-9


def test_grad_accum_matches_manual_mean_grad_step():
    """grad_accum=k averages k consecutive microbatch gradients and applies
    ONE base-optimizer update (optax.MultiSteps semantics), replicating the
    trainer's per-step PRNG chain exactly."""
    import jax.numpy as jnp
    import optax

    X = _rand_imgs(200)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    # numpy snapshot: the jitted epoch donates the live params buffers
    p0 = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a)), m.params)
    tr = SVItrainer(m, grad_accum=4, seed=3, lr=1e-3)
    loader = init_dataloader(X, batch_size=50, shuffle=False)
    tr.train(loader)  # 4 microbatches -> exactly one adam update

    # manual reference: same rng chain (split once per epoch, fold_in(step))
    rng = jax.random.PRNGKey(3)
    _, epoch_rng = jax.random.split(rng)
    idx, w = loader.epoch_indices(0)
    grads = None
    for step in range(4):
        bidx = jnp.asarray(idx[step])
        bw = jnp.asarray(w[step])
        step_rng = jax.random.fold_in(epoch_rng, step)
        g = jax.grad(lambda p: m.weighted_loss_fn(
            p, step_rng, (jnp.asarray(X)[bidx],), bw, jnp.asarray(1.0)))(p0)
        grads = g if grads is None else jax.tree_util.tree_map(
            jnp.add, grads, g)
    mean_g = jax.tree_util.tree_map(lambda a: a / 4.0, grads)
    adam = optax.adam(1e-3)
    upd, _ = adam.update(mean_g, adam.init(p0), p0)
    p_ref = optax.apply_updates(p0, upd)
    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_grad_accum_carries_across_epochs():
    """With grad_accum > num_batches, the first epoch applies NO update
    (params unchanged) and the accumulator carries into the next epoch."""
    X = _rand_imgs(200)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=7)
    p0 = jax.tree_util.tree_map(np.asarray, m.params)  # pre-donation snapshot
    tr = SVItrainer(m, grad_accum=8, seed=3)
    loader = init_dataloader(X, batch_size=50, shuffle=False)
    tr.train(loader)   # 4 of 8 accumulation steps: no update yet
    assert not _params_changed(p0, m.params)
    tr.train(loader)   # steps 5-8 complete the window: update fires
    assert _params_changed(p0, m.params)


def test_grad_accum_fused_run_matches_sequential():
    """The fused multi-epoch run() must carry the MultiSteps accumulator
    bitwise-identically to sequential train() calls."""
    X = _rand_imgs(150)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=5)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=5)
    t1 = SVItrainer(m1, grad_accum=2, seed=2)
    t2 = SVItrainer(m2, grad_accum=2, seed=2)
    l1 = init_dataloader(X, batch_size=50, seed=0)
    l2 = init_dataloader(X, batch_size=50, seed=0)
    for _ in range(3):
        t1.train(l1)
    t2.run(l2, 3)
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_checkpoint_roundtrip(tmp_path):
    """MultiSteps opt_state (accumulator + counters) survives a msgpack
    checkpoint save/restore."""
    from pyroved_tpu.utils.checkpoint import save_checkpoint
    X = _rand_imgs(100)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=1)
    path = str(tmp_path / "ck.msgpack")
    tr = SVItrainer(m, grad_accum=3, seed=2, checkpoint_path=path)
    loader = init_dataloader(X, batch_size=25, shuffle=False)
    tr.train(loader)
    save_checkpoint(path, m, tr)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=9)
    t2 = SVItrainer(m2, grad_accum=3, checkpoint_path=path)
    t2.resume()
    for a, b in zip(jax.tree_util.tree_leaves(tr.opt_state),
                    jax.tree_util.tree_leaves(t2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accum_accepted_by_aux_trainer():
    """Round 4: the aux trainer accumulates the basic objective too (its
    full battery lives in tests/test_auxtrainer.py)."""
    import optax

    from pyroved_tpu.models import ssiVAE
    from pyroved_tpu.trainers import auxSVItrainer
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3)
    tr = auxSVItrainer(m, grad_accum=4)
    assert tr.grad_accum == 4
    assert isinstance(tr.opt_state, optax.MultiStepsState)


def test_uint8_wire_scale_matches_f32_training():
    """`DataLoader(scale=1/255)` on uint8 host data must train IDENTICALLY
    to pre-converted f32 data on every path (resident / per-batch
    streaming / chunked streaming): the upload carries uint8 over the wire
    (4x fewer bytes — the round-4 mitigation for wire-bound out-of-core
    training) and the f32 cast+scale runs on device, producing the same
    values the host conversion would."""
    rng = np.random.default_rng(11)
    u8 = rng.integers(0, 256, (52,) + DATA_2D).astype(np.uint8)
    f32 = (u8.astype(np.float32) / 255.0)

    def run(data, resident, chunks=0, fused=0, **kw):
        m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
        t = SVItrainer(m, seed=9)
        loader = init_dataloader(data, batch_size=16, seed=3,
                                 device_resident=resident,
                                 stream_chunks=chunks, **kw)
        if fused:
            losses = list(np.asarray(t.run(loader, fused)))
        else:
            losses = [t.train(loader) for _ in range(2)]
        return losses, m.params

    l_ref, p_ref = run(f32, True)
    for resident, chunks in ((True, 0), (False, 0), (False, 3)):
        l_u8, p_u8 = run(u8, resident, chunks, scale=1.0 / 255.0)
        np.testing.assert_allclose(l_ref, l_u8, rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                        jax.tree_util.tree_leaves(p_u8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-7)
    # the fused multi-epoch run() gathers from the NARROW resident array
    # and normalizes inside the scan — same trajectory as fused f32
    l_ref_f, p_ref_f = run(f32, True, fused=2)
    l_u8_f, p_u8_f = run(u8, True, fused=2, scale=1.0 / 255.0)
    np.testing.assert_allclose(l_ref_f, l_u8_f, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref_f),
                    jax.tree_util.tree_leaves(p_u8_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-7)


def test_uint8_resident_storage_stays_narrow():
    """With scale= the device-RESIDENT dataset keeps its uint8 dtype in
    HBM (1/4 the footprint — residency extends to ~4x-of-HBM logical
    datasets); batches normalize inside the training scan, and iteration
    yields normalized f32 batches."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (32,) + DATA_2D).astype(np.uint8)
    dl = init_dataloader(u8, batch_size=16, scale=1.0 / 255.0)
    assert dl.device_arrays[0].dtype == jnp.uint8
    xb, = next(iter(dl))
    assert xb.dtype == jnp.float32 and float(xb.max()) <= 1.0
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=7)
    t = SVItrainer(m, seed=9)
    t.run(dl, 2)
    assert dl.device_arrays[0].dtype == jnp.uint8  # still narrow after use
    assert np.isfinite(t.loss_history["training_loss"]).all()


def test_uint8_scale_auxsvi_matches_f32():
    """auxSVItrainer with uint8+scale loaders (unsup AND labeled signal)
    matches pre-converted f32 training exactly."""
    from pyroved_tpu.models import ssiVAE
    from pyroved_tpu.trainers import auxSVItrainer
    rng = np.random.default_rng(5)
    u8_u = rng.integers(0, 256, (48,) + DATA_2D).astype(np.uint8)
    u8_l = rng.integers(0, 256, (16,) + DATA_2D).astype(np.uint8)
    y = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 16)]
    s = np.float32(1.0 / 255.0)
    f32_u, f32_l = u8_u.astype(np.float32) * s, u8_l.astype(np.float32) * s

    def run(xu, xl, **kw):
        m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, seed=7)
        t = auxSVItrainer(m, seed=9)
        lu = init_dataloader(xu, batch_size=16, seed=3, **kw)
        ls = init_dataloader(xl, y, batch_size=8, seed=4,
                             **({"scale": (kw["scale"], None)} if kw else {}))
        losses = list(np.asarray(t.run(lu, ls, 2)))
        return losses, m.params

    l_ref, p_ref = run(f32_u, f32_l)
    l_u8, p_u8 = run(u8_u, u8_l, scale=float(s))
    np.testing.assert_allclose(l_ref, l_u8, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_u8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=1e-7)


def test_wire_scale_tuple_leaves_labels_untouched():
    """Scalar scale applies to the FIRST array only; a tuple gives
    per-array control and None entries pass through unchanged."""
    import jax.numpy as jnp

    from pyroved_tpu.utils.data import DataLoader
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (8, 4, 4)).astype(np.uint8)
    y = rng.normal(size=(8, 3)).astype(np.float32)
    dl = DataLoader(u8, y, batch_size=4, shuffle=False, scale=1 / 255.0)
    xb, yb = dl.device_arrays
    # resident storage stays NARROW; normalization rides the batch gather
    assert xb.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(yb), y)
    xb_n, yb_n = next(iter(dl))
    assert xb_n.dtype == jnp.float32 and float(xb_n.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(yb_n), y[:4])
    dl2 = DataLoader(u8, y, batch_size=4, shuffle=False,
                     scale=(1 / 255.0, 2.0))
    _, yb2 = next(iter(dl2))
    np.testing.assert_allclose(np.asarray(yb2), 2.0 * y[:4], rtol=1e-7)
    # streaming batches go through the same transform
    dl3 = DataLoader(u8, y, batch_size=4, shuffle=False,
                     device_resident=False, scale=1 / 255.0)
    xb3, yb3 = next(iter(dl3))
    assert xb3.dtype == jnp.float32 and float(xb3.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(yb3), y[:4])
    with pytest.raises(ValueError, match="scale has"):
        DataLoader(u8, y, batch_size=4, scale=(1.0,))
