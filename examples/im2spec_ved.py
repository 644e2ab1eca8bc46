"""im2spec VED: predict 1-D spectra from 2-D image patches
(mirrors the reference's examples/im2spec_VED.ipynb: 16x16 images ->
length-64 spectra, conv encoder/decoder, 30-sample predictive uncertainty)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 50


def synthetic(n=2048, seed=0):
    """Images are blobs whose width controls the paired spectrum's peak."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16),
                         indexing="ij")
    t = np.linspace(0, 1, 64)
    w = rng.uniform(0.05, 0.3, n)
    imgs = np.exp(-(xx[None] ** 2 + yy[None] ** 2) / w[:, None, None])
    spec = np.exp(-((t[None] - w[:, None]) ** 2) / 0.005)
    return imgs.astype(np.float32), spec.astype(np.float32)


if __name__ == "__main__":
    X, Y = synthetic()
    loader = pv.utils.init_dataloader(X, Y, batch_size=100)
    ved = pv.models.VED((16, 16), (64,), latent_dim=2,
                        hidden_dim_e=((8,), (16,)), hidden_dim_d=((16,), (8,)))
    trainer = pv.trainers.SVItrainer(ved)
    for e in range(EPOCHS):
        trainer.step(loader)
        if (e + 1) % 10 == 0:
            trainer.print_statistics()
    mean, sd = ved.predict(X[:16])
    print("prediction:", mean.shape, "uncertainty:", sd.shape)
    print("mean predictive sd:", float(np.asarray(sd).mean()))
