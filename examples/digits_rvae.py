"""rVAE on REAL data: scikit-learn's handwritten digits (1797 8x8 images).

The one real-image dataset available offline — demonstrates the full
workflow (train -> latent embedding -> class structure -> manifold) on
actual data rather than synthetic blobs. The rotation latent absorbs the
digits' slant variation.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np

import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()

EPOCHS = 200

if __name__ == "__main__":
    from sklearn.datasets import load_digits
    digits = load_digits()
    X = (digits.images / 16.0).astype(np.float32)   # [1797, 8, 8] in [0, 1]
    y = digits.target

    rvae = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"])
    trainer = rvae.fit(X, epochs=EPOCHS, batch_size=128)
    trainer.print_statistics()

    z_loc, _ = rvae.encode(X)
    z = np.asarray(z_loc)[:, rvae.coord:]  # content latents
    # class structure: mean within-class distance vs overall spread
    overall = np.mean(np.linalg.norm(z - z.mean(0), axis=1))
    within = np.mean([
        np.mean(np.linalg.norm(z[y == c] - z[y == c].mean(0), axis=1))
        for c in range(10)])
    print(f"latent spread: within-class {within:.3f} vs overall {overall:.3f} "
          f"(ratio {within / overall:.2f}; < 1 means classes cluster)")
    man = rvae.manifold2d(8, plot=False)
    print("manifold:", man.shape)
