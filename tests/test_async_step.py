"""step(sync=False): non-blocking per-epoch dispatch.

The per-epoch ``step()`` path pays one host sync (a tunnel round-trip on
remote chips) per epoch because ``train()`` blocks on ``float(total)``.
``sync=False`` queues the epoch and leaves a pending loss handle in
``loss_history``; the PRNG chain, parameter trajectory, and materialized
loss values must be IDENTICAL to sync steps (only the blocking point
moves). Reference analogue: the per-epoch loop in
``pyroved/trainers/svi.py:139-162``.
"""
import json

import jax
import numpy as np
import pytest

from pyroved_tpu.models import iVAE
from pyroved_tpu.trainers import SVItrainer
from pyroved_tpu.utils import init_dataloader

DATA_2D = (8, 8)


def _rand_imgs(n=64):
    return np.random.default_rng(0).uniform(0, 1, (n,) + DATA_2D).astype(np.float32)


def _histories(sync, epochs=3, log_file=None, with_test=False,
               checkpoint_path=None):
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=0)
    loader = init_dataloader(_rand_imgs(), batch_size=16)
    test_loader = init_dataloader(_rand_imgs(32), batch_size=16) if with_test else None
    kwargs = {}
    if log_file:
        kwargs["log_file"] = str(log_file)
    if checkpoint_path:
        kwargs["checkpoint_path"] = str(checkpoint_path)
        kwargs["checkpoint_every"] = 2
    trainer = SVItrainer(model, seed=1, **kwargs)
    for _ in range(epochs):
        trainer.step(loader, test_loader, sync=sync)
    trainer.sync_history()
    return trainer, model


def test_async_step_matches_sync_exactly():
    t_sync, m_sync = _histories(sync=True)
    t_async, m_async = _histories(sync=False)
    assert t_async.loss_history["training_loss"] == t_sync.loss_history["training_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(m_sync.params),
                    jax.tree_util.tree_leaves(m_async.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_async_entries_are_pending_until_synced():
    from pyroved_tpu.trainers.svi import _PendingLoss

    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=0)
    loader = init_dataloader(_rand_imgs(), batch_size=16)
    trainer = SVItrainer(model, seed=1)
    trainer.step(loader, sync=False)
    trainer.step(loader, sync=False)
    assert all(isinstance(v, _PendingLoss)
               for v in trainer.loss_history["training_loss"])
    assert all(isinstance(v.total, jax.Array)
               for v in trainer.loss_history["training_loss"])
    trainer.sync_history()
    assert all(isinstance(v, float)
               for v in trainer.loss_history["training_loss"])
    assert all(np.isfinite(v) for v in trainer.loss_history["training_loss"])


def test_async_with_test_loader_matches_sync():
    t_sync, _ = _histories(sync=True, with_test=True)
    t_async, _ = _histories(sync=False, with_test=True)
    assert t_async.loss_history["test_loss"] == t_sync.loss_history["test_loss"]
    assert all(isinstance(v, float) for v in t_async.loss_history["test_loss"])


def test_async_jsonl_records_match_sync(tmp_path):
    f_sync = tmp_path / "sync.jsonl"
    f_async = tmp_path / "async.jsonl"
    _histories(sync=True, log_file=f_sync)
    _histories(sync=False, log_file=f_async)
    recs_sync = [json.loads(l) for l in f_sync.read_text().splitlines()]
    recs_async = [json.loads(l) for l in f_async.read_text().splitlines()]
    assert len(recs_sync) == len(recs_async) == 3
    for a, b in zip(recs_sync, recs_async):
        assert a["epoch"] == b["epoch"]
        assert a["training_loss"] == b["training_loss"]


def test_async_jsonl_deferred_until_sync(tmp_path):
    f = tmp_path / "log.jsonl"
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=0)
    loader = init_dataloader(_rand_imgs(), batch_size=16)
    trainer = SVItrainer(model, seed=1, log_file=str(f))
    trainer.step(loader, sync=False)
    trainer.step(loader, sync=False)
    assert not f.exists() or f.read_text() == ""
    trainer.sync_history()
    assert len(f.read_text().splitlines()) == 2


def test_async_auto_checkpoint_persists_floats(tmp_path):
    ckpt = tmp_path / "state.ckpt"
    trainer, _ = _histories(sync=False, epochs=2, checkpoint_path=ckpt)
    assert ckpt.exists()
    model2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=0)
    trainer2 = SVItrainer(model2, seed=1, checkpoint_path=str(ckpt))
    trainer2.resume()
    assert trainer2.current_epoch == 2
    assert all(isinstance(v, float)
               for v in trainer2.loss_history["training_loss"])


def test_print_statistics_syncs(capsys):
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=0)
    loader = init_dataloader(_rand_imgs(), batch_size=16)
    trainer = SVItrainer(model, seed=1)
    trainer.step(loader, sync=False)
    trainer.print_statistics()
    out = capsys.readouterr().out
    assert "Training loss" in out
    assert isinstance(trainer.loss_history["training_loss"][0], float)


def test_aux_async_step_matches_sync_exactly():
    from pyroved_tpu.models import ssiVAE
    from pyroved_tpu.trainers import auxSVItrainer
    from pyroved_tpu.utils import init_ssvae_dataloaders

    X = _rand_imgs(60)
    y = np.eye(3, dtype=np.float32)[
        np.random.RandomState(0).randint(0, 3, 20)]

    def run(sync):
        model = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, seed=0)
        lu, ls, _ = init_ssvae_dataloaders(X[:40], (X[40:], y),
                                           (X[40:], y), batch_size=10)
        t = auxSVItrainer(model, seed=1)
        for _ in range(3):
            t.step(lu, ls, sync=sync)
        t.sync_history()
        return t, model

    t_sync, m_sync = run(True)
    t_async, m_async = run(False)
    assert t_async.history["training_loss"] == t_sync.history["training_loss"]
    for a, b in zip(jax.tree_util.tree_leaves(m_sync.params),
                    jax.tree_util.tree_leaves(m_async.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_aux_async_jsonl_deferred_and_flushed(tmp_path):
    from pyroved_tpu.models import ssiVAE
    from pyroved_tpu.trainers import auxSVItrainer
    from pyroved_tpu.utils import init_ssvae_dataloaders

    X = _rand_imgs(60)
    y = np.eye(3, dtype=np.float32)[
        np.random.RandomState(0).randint(0, 3, 20)]
    f = tmp_path / "aux.jsonl"
    model = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, seed=0)
    lu, ls, _ = init_ssvae_dataloaders(X[:40], (X[40:], y), (X[40:], y),
                                       batch_size=10)
    t = auxSVItrainer(model, seed=1, log_file=str(f))
    t.step(lu, ls, sync=False)
    t.step(lu, ls, sync=False)
    assert not f.exists() or f.read_text() == ""
    t.print_statistics()  # syncs
    recs = [json.loads(l) for l in f.read_text().splitlines()]
    assert len(recs) == 2
    assert all(isinstance(r["training_loss"], float) for r in recs)


def test_streaming_loader_ignores_async_gracefully():
    # Streaming paths block per batch regardless; sync=False must not break.
    model = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=0)
    X = _rand_imgs()
    loader = init_dataloader(X, batch_size=16, device_resident=False)
    trainer = SVItrainer(model, seed=1)
    trainer.step(loader, sync=False)
    assert np.isfinite(float(trainer.loss_history["training_loss"][0]))
