"""ssVAE: semi-supervised classification with few labels
(mirrors the reference's examples/ssVAE-MNIST.ipynb workflow)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 30


def synthetic(n, seed=0):
    """Two classes: centered blob vs ring, with jitter; returns (X, y)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16),
                         indexing="ij")
    X, y = [], []
    for _ in range(n):
        cls = int(rng.integers(0, 2))
        cx, cy = rng.uniform(-0.2, 0.2, 2)
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        img = np.exp(-r2 / 0.08) if cls == 0 else np.exp(-((np.sqrt(r2) - 0.5) ** 2) / 0.02)
        X.append(img + rng.normal(0, 0.02, img.shape))
        y.append(cls)
    return np.clip(np.asarray(X, np.float32), 0, 1), np.asarray(y)


if __name__ == "__main__":
    X_unlab, _ = synthetic(2000, seed=0)
    X_lab, y_lab = synthetic(100, seed=1)
    X_val, y_val = synthetic(400, seed=2)
    y_lab1h = np.asarray(pv.utils.to_onehot(y_lab, 2))
    y_val1h = np.asarray(pv.utils.to_onehot(y_val, 2))

    loaders = pv.utils.init_ssvae_dataloaders(
        X_unlab, (X_lab, y_lab1h), (X_val, y_val1h), batch_size=64)

    ssvae = pv.models.ssiVAE((16, 16), latent_dim=2, num_classes=2,
                             invariances=None)
    trainer = pv.trainers.auxSVItrainer(ssvae)
    for e in range(EPOCHS):
        trainer.step(*loaders, aux_loss_multiplier=50)
        if (e + 1) % 5 == 0:
            trainer.print_statistics()
    print("final validation accuracy:", trainer.history["test"][-1])
