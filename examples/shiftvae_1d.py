"""shiftVAE: translation-invariant VAE on 1-D spectra
(mirrors the reference's examples/shiftVAE.ipynb).

Generates synthetic randomly-shifted Gaussian peaks, trains a vanilla VAE
and a translation-invariant VAE, and prints the loss trajectories. With the
invariance enabled, the latent space stops encoding the nuisance shift.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

L, N, EPOCHS = 100, 2048, 50


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, L)
    shifts = rng.uniform(-0.2, 0.2, N)
    widths = rng.uniform(0.002, 0.01, N)
    X = np.exp(-((t[None] - 0.5 - shifts[:, None]) ** 2) / widths[:, None])
    return X.astype(np.float32)


def train(invariances, **kwargs):
    model = pv.models.iVAE((L,), latent_dim=2, invariances=invariances, **kwargs)
    loader = pv.utils.init_dataloader(make_data(), batch_size=64)
    trainer = pv.trainers.SVItrainer(model)
    for e in range(EPOCHS):
        trainer.step(loader)
        if (e + 1) % 10 == 0:
            trainer.print_statistics()
    return model, trainer


if __name__ == "__main__":
    print("=== vanilla VAE ===")
    train(None)
    print("=== shift-invariant VAE (invariances=['t'], dx_prior=0.3) ===")
    model, _ = train(["t"], dx_prior=0.3)
    loc = model.manifold2d(d=6, plot=False)
    print("manifold:", loc.shape)
