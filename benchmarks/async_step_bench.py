"""Per-epoch step() dispatch-latency A/B: sync vs sync=False vs fused run().

The per-epoch path pays one host sync per epoch (``float(total)`` — a full
tunnel round-trip on remote chips); ``step(sync=False)`` queues epochs
without blocking so they pipeline on the device. This measures how much of
the fused ``run()`` speed the async per-epoch loop recovers at the flagship
config (iVAE ['r'], 28x28, bs=200, 50 steps/epoch).

Methodology (tunnel rules): warm every timed shape first, best-of-3
windows, ratios quoted within this one log only.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402

BATCH, N_DATA, DATA_DIM, LATENT = 200, 10000, (28, 28), 2
N_EPOCHS = 5  # per timed window (matches bench.py's per-epoch section)


def make_data():
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28),
                         indexing="ij")
    cx = rng.uniform(-0.4, 0.4, N_DATA)[:, None, None]
    cy = rng.uniform(-0.4, 0.4, N_DATA)[:, None, None]
    s = rng.uniform(0.05, 0.2, N_DATA)[:, None, None]
    return np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / s).astype(np.float32)


def main():
    pv.utils.profiling.enable_compilation_cache()
    data = make_data()
    model = pv.models.iVAE(DATA_DIM, latent_dim=LATENT, invariances=["r"])
    loader = pv.utils.init_dataloader(data, batch_size=BATCH)
    trainer = pv.trainers.SVItrainer(model)
    spe = loader.num_batches

    trainer.step(loader)  # compile + first epoch
    results = {}

    # sync per-epoch (the reference-shaped loop)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_EPOCHS):
            trainer.step(loader)
        dt = time.perf_counter() - t0
        best = max(best, N_EPOCHS * spe / dt)
    results["sync_step"] = best
    print(f"per-epoch step(sync=True):  {best:.1f} steps/s", flush=True)

    # async per-epoch: queue all epochs, block once at the end
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(N_EPOCHS):
            trainer.step(loader, sync=False)
        trainer.sync_history()
        dt = time.perf_counter() - t0
        best = max(best, N_EPOCHS * spe / dt)
    results["async_step"] = best
    print(f"per-epoch step(sync=False): {best:.1f} steps/s", flush=True)

    # fused run() at the same epoch count (compile first: new epoch count
    # means a new program — warm with the exact count you time)
    trainer.run(loader, N_EPOCHS)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        trainer.run(loader, N_EPOCHS)
        dt = time.perf_counter() - t0
        best = max(best, N_EPOCHS * spe / dt)
    results["fused_run"] = best
    print(f"fused run({N_EPOCHS}):            {best:.1f} steps/s", flush=True)

    print(f"\nasync/sync   = {results['async_step'] / results['sync_step']:.2f}x")
    print(f"async/fused  = {results['async_step'] / results['fused_run']:.2f}x")
    assert all(isinstance(v, float)
               for v in trainer.loss_history["training_loss"])
    print(f"final loss {trainer.loss_history['training_loss'][-1]:.4f} "
          f"({len(trainer.loss_history['training_loss'])} epochs recorded)")


if __name__ == "__main__":
    main()
