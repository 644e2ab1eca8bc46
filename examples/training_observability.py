"""Training observability at fused speed: live JSONL logs, auto-
checkpoints, a user callback, and early stopping — all while the run
stays a pipeline of fused device dispatches.

No reference counterpart (the reference leaves the epoch loop — and any
logging/stopping logic — to user code between epochs,
``pyroved/models/ivae.py:96-102``). Here `fit()` keeps the fused path:

1. `log_file=` appends one JSONL record per epoch (drained between
   pipelined segments, ~0.5% overhead measured — docs/PERFORMANCE.md),
2. `checkpoint_path=` writes atomic full-state checkpoints every N
   epochs (async, overlapped with the next segment's compute),
3. `on_segment=` invokes arbitrary host code with the new per-epoch
   records — here a console progress line,
4. `patience=` stops the run once the held-out loss plateaus
   (`trainer.stopped_early` records the outcome).
"""
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyroved_tpu as pv  # noqa: E402

pv.utils.profiling.enable_compilation_cache()


def make_data(n=3000, dim=28, seed=0):
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, n)
    yy, xx = np.meshgrid(np.linspace(-1, 1, dim), np.linspace(-1, 1, dim),
                         indexing="ij")
    xr = (xx[None] * np.cos(th)[:, None, None]
          - yy[None] * np.sin(th)[:, None, None])
    return np.exp(-(xr ** 2) / 0.05 - (yy[None] ** 2) / 0.3).astype(np.float32)


def main():
    X = make_data()
    X_train, X_val = X[:2400], X[2400:]
    workdir = tempfile.mkdtemp(prefix="pvt_obs_")
    log_path = os.path.join(workdir, "train.jsonl")
    ckpt_path = os.path.join(workdir, "state.msgpack")

    def progress(records):
        r = records[-1]
        print(f"  epoch {r['epoch']:>3}  train {r['training_loss']:.2f}"
              f"  val {r['test_loss']:.2f}", flush=True)

    model = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"])
    trainer = model.fit(
        X_train, epochs=200, batch_size=200, test_data=X_val,
        log_file=log_path, checkpoint_path=ckpt_path, checkpoint_every=20,
        on_segment=progress, patience=15)

    hist = trainer.loss_history["training_loss"]
    print(f"trained {trainer.current_epoch} epochs "
          f"(early stop: {trainer.stopped_early}); "
          f"loss {hist[0]:.2f} -> {hist[-1]:.2f}")
    records = [json.loads(line) for line in open(log_path)]
    assert [r["epoch"] for r in records] == list(range(1, len(hist) + 1))
    assert all("test_loss" in r for r in records)
    print(f"JSONL log: {len(records)} records at {log_path}")

    # the auto-checkpoint restores the full state at the last boundary
    model2 = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"], seed=5)
    trainer2 = pv.trainers.SVItrainer(model2, checkpoint_path=ckpt_path)
    resumed_epoch = trainer2.resume()
    print(f"checkpoint restores epoch {resumed_epoch} "
          f"(boundary multiple of 20)")
    assert resumed_epoch % 20 == 0 and resumed_epoch > 0
    assert hist[-1] < hist[0]
    print("OK")


if __name__ == "__main__":
    main()
