"""Config-driven training CLI (`python -m pyroved_tpu.train job.json`)."""
import json

import numpy as np
import pytest

from pyroved_tpu import train as cli


def _write(tmp_path, name, arr):
    p = str(tmp_path / name)
    np.save(p, arr)
    return p + ".npy"


def test_cli_trains_ivae_and_exports(tmp_path):
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (48, 8, 8)).astype(np.float32)
    job = {
        "model": "iVAE",
        "model_config": {"data_dim": [8, 8], "latent_dim": 2,
                         "invariances": ["r"]},
        "train": {"epochs": 3, "batch_size": 16},
        "data": _write(tmp_path, "X", X),
        "save_weights": str(tmp_path / "w"),
        "export_path": str(tmp_path / "m.pvtx"),
    }
    summary = cli.run_job(job)
    assert np.isfinite(summary["training_loss"])
    assert (tmp_path / "w.pvt").exists()
    assert (tmp_path / "m.pvtx").exists()
    from pyroved_tpu.serving import ServedModel
    served = ServedModel(str(tmp_path / "m.pvtx"))
    assert served.encode(X[:4])[0].shape == (4, 3)


def test_cli_semi_supervised(tmp_path):
    rng = np.random.default_rng(0)
    Xu = rng.uniform(0, 1, (24, 8, 8)).astype(np.float32)
    Xs = rng.uniform(0, 1, (8, 8, 8)).astype(np.float32)
    ys = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)]
    job = {
        "model": "ssiVAE",
        "model_config": {"data_dim": [8, 8], "latent_dim": 2,
                         "num_classes": 3},
        "train": {"epochs": 2, "batch_size": 8},
        "unsup_data": _write(tmp_path, "Xu", Xu),
        "sup_data": [_write(tmp_path, "Xs", Xs), _write(tmp_path, "ys", ys)],
        "val_data": [_write(tmp_path, "Xv", Xs), _write(tmp_path, "yv", ys)],
    }
    summary = cli.run_job(job)
    assert np.isfinite(summary["training_loss"])
    assert 0.0 <= summary["val_metric"] <= 1.0


def test_cli_main_and_validation(tmp_path, capsys):
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 1, (16, 8, 8)).astype(np.float32)
    job = {"model": "iVAE",
           "model_config": {"data_dim": [8, 8]},
           "train": {"epochs": 1, "batch_size": 8},
           "data": _write(tmp_path, "X", X),
           "log_file": str(tmp_path / "log.jsonl")}
    path = tmp_path / "job.json"
    path.write_text(json.dumps(job))
    assert cli.main([str(path)]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["model"] == "iVAE" and out["epochs"] == 1
    assert (tmp_path / "log.jsonl").exists()  # hooks force the step() path
    with pytest.raises(ValueError, match="model must be one of"):
        cli.run_job({"model": "GAN"})
    assert cli.main([]) == 2  # usage

def test_cli_rejects_unknown_keys(tmp_path):
    rng = np.random.default_rng(0)
    X = _write(tmp_path, "X", rng.uniform(0, 1, (8, 8, 8)).astype(np.float32))
    base = {"model": "iVAE", "model_config": {"data_dim": [8, 8]},
            "train": {"epochs": 1, "batch_size": 8}, "data": X}
    with pytest.raises(ValueError, match="Unknown job keys.*'export'"):
        cli.run_job({**base, "export": "typo.pvtx"})
    with pytest.raises(ValueError, match="Unknown train keys.*'epoch'"):
        cli.run_job({**base, "train": {"epoch": 5, "batch_size": 8}})


def test_cli_final_checkpoint_always_written(tmp_path):
    """checkpoint_path must yield a checkpoint even when epochs < the
    auto-checkpoint cadence."""
    rng = np.random.default_rng(0)
    X = _write(tmp_path, "X", rng.uniform(0, 1, (16, 8, 8)).astype(np.float32))
    ck = str(tmp_path / "ck.npz")
    summary = cli.run_job({"model": "iVAE",
                           "model_config": {"data_dim": [8, 8]},
                           "train": {"epochs": 2, "batch_size": 8},
                           "data": X, "checkpoint_path": ck})
    assert summary["checkpoint"] == ck
    import os
    assert os.path.exists(ck)
    # and it resumes
    from pyroved_tpu.models import iVAE
    from pyroved_tpu.trainers import SVItrainer
    m = iVAE((8, 8))
    t = SVItrainer(m, checkpoint_path=ck)
    assert t.resume() == 2


def test_cli_grad_accum_and_fused_observability(tmp_path):
    """grad_accum reaches the trainer through the job config, and
    log_file/checkpoint jobs run through the segmented fused path (one
    JSONL record per epoch, checkpoint present)."""
    import json

    import numpy as np

    from pyroved_tpu.train import run_job

    X = str(tmp_path / "X.npy")
    np.save(X, np.random.default_rng(0).uniform(0, 1, (64, 8, 8)).astype(np.float32))
    log = str(tmp_path / "log.jsonl")
    ck = str(tmp_path / "ck.msgpack")
    summary = run_job({
        "model": "iVAE",
        "model_config": {"data_dim": [8, 8], "latent_dim": 2},
        "train": {"epochs": 4, "batch_size": 16, "grad_accum": 2},
        "data": X, "log_file": log, "checkpoint_path": ck})
    assert summary["epochs"] == 4
    recs = [json.loads(l) for l in open(log)]
    assert [r["epoch"] for r in recs] == [1, 2, 3, 4]
    import os
    assert os.path.exists(ck)


def test_cli_semisup_grad_accum(tmp_path):
    """Round 4: semi-supervised jobs accept grad_accum (the aux trainer
    accumulates the basic objective via optax.MultiSteps)."""
    import numpy as np

    from pyroved_tpu.train import run_job

    Xu = str(tmp_path / "Xu.npy")
    Xs = str(tmp_path / "Xs.npy")
    ys = str(tmp_path / "ys.npy")
    np.save(Xu, np.random.default_rng(0).uniform(0, 1, (32, 8, 8)).astype(np.float32))
    np.save(Xs, np.random.default_rng(1).uniform(0, 1, (16, 8, 8)).astype(np.float32))
    np.save(ys, np.eye(3, dtype=np.float32)[np.arange(16) % 3])
    summary = run_job({"model": "ssiVAE",
                       "model_config": {"data_dim": [8, 8], "latent_dim": 2,
                                        "num_classes": 3},
                       "train": {"epochs": 2, "batch_size": 8,
                                 "grad_accum": 2},
                       "unsup_data": Xu, "sup_data": [Xs, ys],
                       "val_data": [Xs, ys]})
    assert np.isfinite(summary["training_loss"])
    assert 0.0 <= summary["val_metric"] <= 1.0


def test_cli_test_data_and_early_stop(tmp_path):
    """test_data evaluates inside the fused dispatch; patience stops a
    plateaued run early and the summary records it."""
    import numpy as np

    from pyroved_tpu.train import run_job

    rng = np.random.default_rng(0)
    X = str(tmp_path / "X.npy")
    Xt = str(tmp_path / "Xt.npy")
    np.save(X, rng.uniform(0, 1, (64, 8, 8)).astype(np.float32))
    np.save(Xt, rng.uniform(0, 1, (32, 8, 8)).astype(np.float32))
    summary = run_job({
        "model": "iVAE",
        "model_config": {"data_dim": [8, 8], "latent_dim": 2},
        "train": {"epochs": 40, "batch_size": 16, "patience": 2,
                  "min_delta": 1000.0},  # impossible bar -> stops fast
        "data": X, "test_data": Xt})
    assert "test_loss" in summary
    assert summary["stopped_early"] is True
    assert summary["best_epoch"] is not None


def test_cli_semisup_patience_and_test_data_validation(tmp_path):
    """Semi-supervised jobs forward patience to the aux run (monitoring the
    val metric) and reject test_data; labeled SVI jobs require test_labels
    with test_data."""
    import numpy as np
    import pytest

    from pyroved_tpu.train import run_job

    rng = np.random.default_rng(0)
    Xu = str(tmp_path / "Xu.npy"); np.save(Xu, rng.uniform(0, 1, (32, 8, 8)).astype(np.float32))
    Xs = str(tmp_path / "Xs.npy"); np.save(Xs, rng.uniform(0, 1, (16, 8, 8)).astype(np.float32))
    ys = str(tmp_path / "ys.npy"); np.save(ys, np.eye(3, dtype=np.float32)[np.arange(16) % 3])
    semi = {"model": "ssiVAE",
            "model_config": {"data_dim": [8, 8], "latent_dim": 2,
                              "num_classes": 3},
            "unsup_data": Xu, "sup_data": [Xs, ys], "val_data": [Xs, ys]}
    with pytest.raises(ValueError, match="val_data"):
        run_job({**semi, "test_data": Xu,
                 "train": {"epochs": 1, "batch_size": 8}})
    summary = run_job({**semi, "train": {"epochs": 30, "batch_size": 8,
                                          "patience": 2, "min_delta": 1.0}})
    assert "stopped_early" in summary and "best_epoch" in summary

    X = str(tmp_path / "X.npy"); np.save(X, rng.uniform(0, 1, (32, 8, 8)).astype(np.float32))
    y = str(tmp_path / "y.npy"); np.save(y, rng.uniform(0, 1, (32, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="test_labels"):
        run_job({"model": "iVAE",
                 "model_config": {"data_dim": [8, 8], "latent_dim": 2,
                                   "c_dim": 4},
                 "train": {"epochs": 1, "batch_size": 8},
                 "data": X, "labels": y, "test_data": X})
    with pytest.raises(ValueError, match="patience"):
        run_job({"model": "iVAE",
                 "model_config": {"data_dim": [8, 8], "latent_dim": 2},
                 "train": {"epochs": 1, "batch_size": 8, "patience": 2},
                 "data": X})
    # labeled job WITH test_labels trains and evaluates conditioned
    summary = run_job({"model": "iVAE",
                       "model_config": {"data_dim": [8, 8], "latent_dim": 2,
                                         "c_dim": 4},
                       "train": {"epochs": 2, "batch_size": 8},
                       "data": X, "labels": y, "test_data": X,
                       "test_labels": y})
    assert "test_loss" in summary
