"""rVAE: rotationally-invariant VAE on MNIST-like images
(mirrors the reference's examples/VAE_gp.ipynb training config:
28x28 inputs, batch 200, latent_dim=2).

Pass a path to an .npy array of [N, 28, 28] images in [0, 1] to use real
data; otherwise synthetic oriented blobs are generated.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys

import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 100


def synthetic(n=10000, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28),
                         indexing="ij")
    cx = rng.uniform(-0.4, 0.4, n)[:, None, None]
    cy = rng.uniform(-0.4, 0.4, n)[:, None, None]
    s = rng.uniform(0.05, 0.2, n)[:, None, None]
    return np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / s).astype(np.float32)


if __name__ == "__main__":
    data = (np.load(sys.argv[1]).astype(np.float32) if len(sys.argv) > 1
            else synthetic())
    loader = pv.utils.init_dataloader(data, batch_size=200)
    rvae = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"])
    trainer = pv.trainers.SVItrainer(rvae)
    for e in range(EPOCHS):
        trainer.step(loader)
        if (e + 1) % 10 == 0:
            trainer.print_statistics()
    loc = rvae.manifold2d(d=12, plot=False)
    print("manifold:", loc.shape)
    z_loc, z_scale = rvae.encode(data[:1000])
    print("encoded:", z_loc.shape, "(first dim is the rotation latent)")
