"""Vanilla VAE + GP surrogate on the latent space
(mirrors the reference's examples/VAE_gp.ipynb: train a VAE, encode, fit a
GP from latents to a scalar property, predict over the latent grid)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 50


def synthetic(n=10000, seed=0):  # matches bench.py shapes -> compile-cache hit
    """Blobs whose size is the property the GP will regress."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28),
                         indexing="ij")
    size = rng.uniform(0.05, 0.3, n)
    imgs = np.exp(-(xx[None] ** 2 + yy[None] ** 2) / size[:, None, None])
    return imgs.astype(np.float32), size.astype(np.float32)


if __name__ == "__main__":
    X, prop = synthetic()
    vae = pv.models.iVAE((28, 28), latent_dim=2, invariances=None)
    trainer = vae.fit(X, epochs=EPOCHS, batch_size=200)
    trainer.print_statistics()
    (z, z_decoded), predictions = vae.predict_on_latent(
        X[:1000], prop[:1000], gp_iterations=50, d=12)
    print("latent grid:", np.asarray(z).shape,
          "decoded:", z_decoded.shape,
          "GP predictions:", np.asarray(predictions).shape)
    print("prediction range: [%.3f, %.3f] (true property range [%.3f, %.3f])"
          % (float(np.min(predictions)), float(np.max(predictions)),
             prop.min(), prop.max()))
