"""Rotation-invariant VAE on RGB images — beyond the reference.

The reference's spatial decoder is single-channel only (its TODO at
``pyroved/nets/fc.py:186``), so invariant VAEs on color data are
impossible there. Here ``iVAE(channels=3)`` trains on synthetic colored
blobs (hue encodes a latent factor, orientation is nuisance), learns a
rotation-invariant color manifold, and reconstructs in color.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyroved_tpu as pv  # noqa: E402

DIM = (24, 24)


def make_data(n=4000, seed=0):
    """Oriented two-lobe blobs with a hue tied to the lobe separation:
    rotation is a nuisance factor, color/shape is the signal."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, DIM[0]), np.linspace(-1, 1, DIM[1]),
                         indexing="ij")
    theta = rng.uniform(0, 2 * np.pi, n)
    sep = rng.uniform(0.15, 0.55, n)          # latent factor 1
    width = rng.uniform(0.05, 0.12, n)        # latent factor 2
    imgs = np.zeros((n,) + DIM + (3,), np.float32)
    for ch, phase in enumerate((0.0, 0.33, 0.66)):
        # per-channel intensity keyed to the separation -> hue varies
        w = 0.5 + 0.5 * np.cos(2 * np.pi * (sep * 1.8 + phase))
        for s in (+1.0, -1.0):
            cx = s * sep * np.cos(theta)
            cy = s * sep * np.sin(theta)
            d2 = (xx[None] - cx[:, None, None]) ** 2 + (yy[None] - cy[:, None, None]) ** 2
            imgs[..., ch] += (w[:, None, None]
                              * np.exp(-d2 / width[:, None, None])).astype(np.float32)
    return np.clip(imgs, 0, 1), sep


def main():
    pv.utils.profiling.enable_compilation_cache()
    X, sep = make_data()
    rvae = pv.models.iVAE(DIM, latent_dim=2, invariances=["r"], channels=3)
    trainer = rvae.fit(X, epochs=60, batch_size=100)
    lh = trainer.loss_history["training_loss"]
    print(f"trained 60 epochs: loss {lh[0]:.1f} -> {lh[-1]:.1f}")
    assert lh[-1] < lh[0]

    # the latent must capture the color/shape factor, not the rotation
    z_loc, _ = rvae.encode(X[:1000])
    z_content = np.asarray(z_loc)[:, rvae.coord:]
    corr = max(abs(np.corrcoef(z_content[:, i], sep[:1000])[0, 1])
               for i in range(z_content.shape[1]))
    print(f"max |corr(latent, separation factor)| = {corr:.2f}")

    recon = rvae.reconstruct(X[:8])
    print(f"color reconstructions: {recon.shape}")
    manifold = rvae.manifold2d(6, plot=False)   # [36, 24, 24, 3] RGB
    print(f"RGB manifold: {manifold.shape}")
    out = "/tmp/rgb_rvae_manifold.npy"
    np.save(out, np.asarray(manifold))
    print(f"saved {out} (render with plot_img_grid — RGB tiles supported)")


if __name__ == "__main__":
    main()
