"""jrVAE: joint discrete + continuous rotationally-invariant VAE
(mirrors the reference's examples/jrVAE.ipynb): exact enumeration over the
discrete classes with separate KL scale factors [continuous, discrete]."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 50


def synthetic(n=4096, seed=0):
    """Three shape classes (blob, ring, bar) under random rotation."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 28), np.linspace(-1, 1, 28),
                         indexing="ij")
    out = []
    for _ in range(n):
        cls = rng.integers(0, 3)
        th = rng.uniform(0, 2 * np.pi)
        xr = xx * np.cos(th) - yy * np.sin(th)
        yr = xx * np.sin(th) + yy * np.cos(th)
        r2 = xr ** 2 + yr ** 2
        if cls == 0:
            img = np.exp(-r2 / 0.1)
        elif cls == 1:
            img = np.exp(-((np.sqrt(r2) - 0.5) ** 2) / 0.02)
        else:
            img = np.exp(-(xr ** 2) / 0.02 - (yr ** 2) / 0.5)
        out.append(img)
    return np.asarray(out, np.float32)


if __name__ == "__main__":
    data = synthetic()
    loader = pv.utils.init_dataloader(data, batch_size=128)
    jrvae = pv.models.jiVAE((28, 28), latent_dim=2, discrete_dim=3,
                            invariances=["r"])
    trainer = pv.trainers.SVItrainer(jrvae)
    kl_scale = np.concatenate([np.ones(10) * 10, np.linspace(10, 1, 20)])
    for e in range(EPOCHS):
        sc = kl_scale[e] if e < len(kl_scale) else kl_scale[-1]
        trainer.step(loader, scale_factor=[float(sc), 1.0])
        if (e + 1) % 10 == 0:
            trainer.print_statistics()
    z_loc, z_scale, classes = jrvae.encode(data[:512])
    print("predicted class histogram:", np.bincount(np.asarray(classes), minlength=3))
    trav = jrvae.manifold_traversal(6, cont_idx=0, plot=False)
    print("traversal:", trav.shape)
