"""ssrVAE: semi-supervised regression with few labels
(mirrors the reference's ss_reg_iVAE workflow with the aux SVI trainer and
stochastic weight averaging of the regressor)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 100


def synthetic(n, seed=0):
    """Blobs whose eccentricity (the regression target) varies continuously."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 16), np.linspace(-1, 1, 16),
                         indexing="ij")
    ecc = rng.uniform(0.05, 0.5, n)
    X = np.exp(-(xx[None] ** 2) / 0.1 - (yy[None] ** 2) / ecc[:, None, None])
    return X.astype(np.float32), ecc.astype(np.float32)[:, None]


if __name__ == "__main__":
    X_unsup, _ = synthetic(2000, seed=0)
    X_lab, y_lab = synthetic(400, seed=1)
    X_val, y_val = synthetic(400, seed=2)
    # standardize targets: the model's y-prior is N(0, regressor_sig), so
    # centered/scaled targets are the canonical usage (as in the reference's
    # regression notebooks)
    mu_y, sd_y = y_lab.mean(), y_lab.std()
    y_lab = (y_lab - mu_y) / sd_y
    y_val = (y_val - mu_y) / sd_y

    ssr = pv.models.ss_reg_iVAE((16, 16), latent_dim=2, reg_dim=1,
                                invariances=["r"])
    trainer = pv.trainers.auxSVItrainer(ssr)
    loaders = pv.utils.init_ssvae_dataloaders(
        X_unsup, (X_lab, y_lab), (X_val, y_val), batch_size=64)
    for e in range(EPOCHS):
        trainer.step(*loaders, aux_loss_multiplier=200)
        if e > EPOCHS - 6:  # SWA over the tail of training
            trainer.save_running_weights("encoder_y")
        if (e + 1) % 10 == 0:
            trainer.print_statistics()
    trainer.average_weights("encoder_y")
    pred = np.asarray(ssr.regressor(X_val))
    mse = float(np.mean((pred - y_val) ** 2))
    print(f"final val MSE after SWA: {mse:.5f} "
          f"(target var {float(np.var(y_val)):.5f})")
