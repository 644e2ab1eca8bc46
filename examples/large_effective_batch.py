"""Large effective batches: gradient accumulation + rematerialization.

Some workloads want optimizer steps computed over batches far larger than
the activations that fit on one chip (stable large-batch training, highly
class-imbalanced data, very large grids). Two orthogonal levers compose
for that here, neither changing the model:

* ``SVItrainer(grad_accum=k)`` averages gradients over k consecutive
  batches and applies ONE optimizer update (``optax.MultiSteps``), so the
  effective batch is ``k * batch_size`` while only one microbatch's
  activations are ever resident.
* ``SVItrainer(remat=True)`` rematerializes the loss forward pass inside
  the backward (``jax.checkpoint``), shrinking per-microbatch activation
  memory further at the cost of recompute FLOPs.

This script trains the flagship rVAE config three ways on the same data
and seed — (a) plain batch 200, (b) batch 50 with grad_accum=4, (c) the
same plus remat — and reports the loss trajectories: (b) and (c) follow
(a) closely (identical effective batch; microbatch RNG draws differ, so
trajectories match statistically rather than bitwise), while their peak
activation footprint is ~4x / >4x smaller.

Run: python examples/large_effective_batch.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402

EPOCHS = int(os.environ.get("PVT_EXAMPLE_EPOCHS", 20))
ROWS = int(os.environ.get("PVT_EXAMPLE_ROWS", 4000))


def make_data(n=ROWS):
    rng = np.random.default_rng(0)
    th = rng.uniform(0, 2 * np.pi, n)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28),
                         indexing="ij")
    xr = xx[None] * np.cos(th)[:, None, None] - yy[None] * np.sin(th)[:, None, None]
    return np.exp(-(xr ** 2) / 0.05 - (yy[None] ** 2) / 0.3).astype(np.float32)


def train(X, batch_size, **trainer_kwargs):
    model = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"], seed=4)
    trainer = pv.trainers.SVItrainer(model, seed=2, **trainer_kwargs)
    loader = pv.utils.init_dataloader(X, batch_size=batch_size, seed=0)
    trainer.run(loader, EPOCHS)
    return trainer.loss_history["training_loss"]


def main():
    pv.utils.profiling.enable_compilation_cache()
    X = make_data()

    plain = train(X, batch_size=200)
    accum = train(X, batch_size=50, grad_accum=4)
    accum_remat = train(X, batch_size=50, grad_accum=4, remat=True)

    print(f"{'epoch':>5} {'batch 200':>12} {'50 x accum 4':>13} "
          f"{'+ remat':>12}")
    for e in range(0, EPOCHS - 1, max(1, EPOCHS // 5)):
        print(f"{e + 1:>5} {plain[e]:>12.3f} {accum[e]:>13.3f} "
              f"{accum_remat[e]:>12.3f}")
    print(f"{EPOCHS:>5} {plain[-1]:>12.3f} {accum[-1]:>13.3f} "
          f"{accum_remat[-1]:>12.3f}")

    # all three see the same examples per optimizer step; final losses agree
    assert plain[-1] < plain[0]
    for other in (accum, accum_remat):
        rel = abs(other[-1] - plain[-1]) / abs(plain[-1])
        assert rel < 0.05, (plain[-1], other[-1])
    print("OK: accumulated runs track the plain large-batch trajectory "
          f"(final losses within {max(abs(accum[-1] - plain[-1]), abs(accum_remat[-1] - plain[-1])) / abs(plain[-1]):.2%})")


if __name__ == "__main__":
    main()
