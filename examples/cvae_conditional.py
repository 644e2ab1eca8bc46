"""cVAE: class/continuous-conditional VAE on 1-D spectra
(mirrors the reference's examples/pyroVED_examples_C_cont_VAE.ipynb:
an iVAE with c_dim > 0 conditioned on a continuous variable)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

L, N, EPOCHS = 100, 4096, 60


def synthetic(seed=0):
    """Spectra whose peak width is driven by a known continuous variable c."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, L)
    c = rng.uniform(0.0, 1.0, N).astype(np.float32)
    width = 0.002 + 0.01 * c
    shift = rng.uniform(-0.1, 0.1, N)
    X = np.exp(-((t[None] - 0.5 - shift[:, None]) ** 2) / width[:, None])
    return X.astype(np.float32), c[:, None]


if __name__ == "__main__":
    X, c = synthetic()
    cvae = pv.models.iVAE((L,), latent_dim=2, invariances=None, c_dim=1)
    trainer = cvae.fit(X, c, epochs=EPOCHS, batch_size=128)
    trainer.print_statistics()
    # conditional generation: same latent grid, two different conditions
    man_lo = cvae.manifold2d(4, y=np.asarray([0.1], np.float32), plot=False)
    man_hi = cvae.manifold2d(4, y=np.asarray([0.9], np.float32), plot=False)
    print("conditional manifolds:", man_lo.shape,
          "| differ with condition:", not np.allclose(np.asarray(man_lo),
                                                      np.asarray(man_hi)))
