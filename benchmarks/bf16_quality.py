"""Training-quality impact of bf16 data storage (VERDICT r4 item 3).

Trains the flagship rVAE twice from identical seeds — once on the f32
data, once through ``DataLoader(store_dtype="bfloat16")`` — and reports
the per-epoch loss-trajectory delta and the final-loss delta. The ONLY
difference between the runs is the one-time bf16 rounding of the inputs
(<= 2^-9 per element for [0,1] signals); the upcast arithmetic inside the
scan is f32 either way.

Usage: python benchmarks/bf16_quality.py [--epochs 100]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28),
                         indexing="ij")
    n = 10_000
    cx = rng.uniform(-0.4, 0.4, n)[:, None, None]
    cy = rng.uniform(-0.4, 0.4, n)[:, None, None]
    s = rng.uniform(0.05, 0.2, n)[:, None, None]
    data = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / s).astype(np.float32)

    losses = {}
    for tag, kw in (("f32", {}), ("bf16", {"store_dtype": "bfloat16"})):
        m = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"], seed=1)
        loader = pv.utils.init_dataloader(data, batch_size=200, **kw)
        tr = pv.trainers.SVItrainer(m, seed=1)
        tr.run(loader, args.epochs)
        losses[tag] = np.asarray(tr.loss_history["training_loss"])
        print(f"{tag}: first {losses[tag][0]:.4f} final {losses[tag][-1]:.4f}",
              flush=True)
    d = losses["bf16"] - losses["f32"]
    rel = np.abs(d) / np.abs(losses["f32"])
    print(f"loss-trajectory delta (bf16 - f32) over {args.epochs} epochs: "
          f"max |abs| {np.max(np.abs(d)):.4f} "
          f"(max rel {np.max(rel) * 100:.4f}%), "
          f"final {d[-1]:+.4f} ({rel[-1] * 100:.4f}%)", flush=True)
    print("BF16_QUALITY_OK" if np.max(rel) < 0.01 else "BF16_QUALITY_LARGE",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
