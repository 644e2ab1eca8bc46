"""C++ host-pipeline library: build, determinism, numpy-fallback parity,
and streaming DataLoader mode."""
import numpy as np

from pyroved_tpu import native
from pyroved_tpu.models import iVAE
from pyroved_tpu.trainers import SVItrainer
from pyroved_tpu.utils import DataLoader


def test_shuffle_determinism_and_coverage():
    a = native.shuffle_indices(257, seed=7, epoch=3)
    b = native.shuffle_indices(257, seed=7, epoch=3)
    c = native.shuffle_indices(257, seed=7, epoch=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a.tolist()) == list(range(257))


def test_gather_rows_matches_numpy():
    src = np.random.default_rng(0).normal(size=(100, 17)).astype(np.float32)
    idx = native.shuffle_indices(100, 0, 0)[:37]
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])
    # non-f32 dtypes take the numpy path unchanged
    src_i = np.arange(50, dtype=np.int64)[:, None]
    np.testing.assert_array_equal(native.gather_rows(src_i, idx[:10] % 50),
                                  src_i[idx[:10] % 50])


def test_u8_normalization():
    u = (np.random.default_rng(1).random(1000) * 255).astype(np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(u),
                               u.astype(np.float32) / 255, rtol=1e-6)


def test_streaming_loader_trains():
    x = np.random.default_rng(0).uniform(0, 1, (48, 8, 8)).astype(np.float32)
    loader = DataLoader(x, batch_size=16, device_resident=False)
    batches = list(loader)
    assert len(batches) == 3
    model = iVAE((8, 8), latent_dim=2, invariances=["r"])
    trainer = SVItrainer(model)
    trainer.step(loader)
    loss = trainer.loss_history["training_loss"][0]
    assert np.isfinite(loss)
    # eval path too
    assert np.isfinite(trainer.evaluate(loader))


def test_streaming_and_resident_losses_close():
    x = np.random.default_rng(0).uniform(0, 1, (64, 8, 8)).astype(np.float32)
    m1 = iVAE((8, 8), latent_dim=2, invariances=None, kl="analytic")
    m2 = iVAE((8, 8), latent_dim=2, invariances=None, kl="analytic")
    t1 = SVItrainer(m1, seed=3)
    t2 = SVItrainer(m2, seed=3)
    l1 = t1.train(DataLoader(x, batch_size=16, seed=1))
    l2 = t2.train(DataLoader(x, batch_size=16, seed=1, device_resident=False))
    # same data, same epoch seeds -> same permutation -> near-identical loss
    np.testing.assert_allclose(l1, l2, rtol=1e-4)


def test_prefetch_wrapper():
    from pyroved_tpu.utils import prefetch
    x = np.random.default_rng(0).uniform(0, 1, (48, 8, 8)).astype(np.float32)
    loader = DataLoader(x, batch_size=16, device_resident=False, shuffle=False)
    batches = list(prefetch(loader, size=2))
    assert len(batches) == 3
    direct = list(DataLoader(x, batch_size=16, device_resident=False, shuffle=False))
    for (a,), (b,) in zip(batches, direct):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # trainer consumes a prefetched stream via the streaming fallback
    model = iVAE((8, 8), latent_dim=2, invariances=["r"])
    trainer = SVItrainer(model)
    loss = trainer.train(prefetch(DataLoader(x, batch_size=16,
                                             device_resident=False)))
    assert np.isfinite(loss)


def test_trainer_jsonl_logging(tmp_path):
    import json
    path = str(tmp_path / "metrics.jsonl")
    model = iVAE((8, 8), latent_dim=2, invariances=None)
    x = np.random.default_rng(0).uniform(0, 1, (32, 8, 8)).astype(np.float32)
    loader = DataLoader(x, batch_size=16)
    trainer = SVItrainer(model, log_file=path)
    trainer.step(loader)
    trainer.step(loader)
    records = [json.loads(l) for l in open(path)]
    assert len(records) == 2
    assert records[1]["epoch"] == 2
    assert "training_loss" in records[0] and "epoch_seconds" in records[0]


def test_batch_pipeline_matches_streaming_loader():
    """The native ring pipeline must produce the EXACT batch sequence of the
    plain streaming DataLoader (same (seed, epoch)-keyed shuffle)."""
    from pyroved_tpu.native import BatchPipeline
    from pyroved_tpu.utils import init_dataloader
    rng = np.random.default_rng(0)
    X = rng.normal(size=(53, 6)).astype(np.float32)  # short final batch
    loader = init_dataloader(X, batch_size=8, seed=4, device_resident=False)
    with BatchPipeline(X, batch_size=8, seed=4) as pipe:
        for epoch in range(2):
            for (ref,) in loader:
                got = pipe.next()
                np.testing.assert_array_equal(got, np.asarray(ref))


def test_batch_pipeline_trains():
    from pyroved_tpu.native import BatchPipeline
    from pyroved_tpu.models import iVAE
    from pyroved_tpu.trainers import SVItrainer
    X = np.random.default_rng(0).uniform(0, 1, (48, 8, 8)).astype(np.float32)
    model = iVAE((8, 8), latent_dim=2, invariances=None)
    trainer = SVItrainer(model)
    with BatchPipeline(X, batch_size=16, seed=1) as pipe:
        loss1 = trainer.train(pipe.epoch_batches())
        loss2 = trainer.train(pipe.epoch_batches())
    assert np.isfinite(loss1) and np.isfinite(loss2)


def test_batch_pipeline_close_idempotent():
    from pyroved_tpu.native import BatchPipeline
    pipe = BatchPipeline(np.zeros((10, 3), np.float32), batch_size=4)
    pipe.next()
    pipe.close()
    pipe.close()  # no crash


def test_batch_pipeline_next_after_close_raises():
    from pyroved_tpu.native import BatchPipeline
    pipe = BatchPipeline(np.zeros((10, 3), np.float32), batch_size=4)
    pipe.next()
    pipe.close()
    import pytest
    with pytest.raises(RuntimeError, match="closed"):
        pipe.next()


def test_batch_pipeline_zero_copy_view():
    """next(copy=False) returns the SAME data as the copying path; the view
    stays valid until the following next() call."""
    from pyroved_tpu.native import BatchPipeline, get_lib
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (40, 5)).astype(np.float32)
    with BatchPipeline(X, batch_size=8, seed=3) as a, \
            BatchPipeline(X, batch_size=8, seed=3) as b:
        for _ in range(10):  # two epochs, identical shuffle streams
            ref = a.next(copy=True)
            view = b.next(copy=False)
            np.testing.assert_array_equal(ref, view)
            if get_lib() is not None:
                snapshot = view.copy()
                np.testing.assert_array_equal(snapshot, ref)
