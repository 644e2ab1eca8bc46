"""Training invariant VAEs on LARGE coordinate grids.

The spatial decoder evaluates a per-pixel MLP over the H*W grid, so its
[batch, pixels, hidden] activation working set grows linearly with the
image area: at 512x512 and batch 200 that is ~27 GB — more than one
chip's HBM. This example shows the three levers, smallest-change first:

1. The DEFAULT fused Pallas kernel already bounds its own working set by
   tiling the pixel axis in VMEM — most large-grid configs just train.
2. ``pixel_chunks=k`` computes the reconstruction term as a lax.scan over
   k grid tiles with per-tile rematerialization — exact, works on every
   backend and decoder config, ~80%% of kernel speed at 512x512
   (docs/PERFORMANCE.md "Pixel-partitioned training").
3. ``parallel.shard_pixels(model, mesh)`` shards the pixel axis across a
   device mesh (shard_map + psum) — the sequence-parallel analogue — and
   composes with data parallelism on the same mesh.

Run on one chip (this script uses a 160x160 grid so it finishes quickly):
    python examples/large_grid_training.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import pyroved_tpu as pv  # noqa: E402

pv.utils.profiling.enable_compilation_cache()

DIM = (160, 160)
rng = np.random.default_rng(0)
yy, xx = np.meshgrid(np.linspace(-1, 1, DIM[0]), np.linspace(-1, 1, DIM[1]),
                     indexing="ij")
n = 512
cx = rng.uniform(-0.4, 0.4, n)[:, None, None]
cy = rng.uniform(-0.4, 0.4, n)[:, None, None]
s = rng.uniform(0.05, 0.2, n)[:, None, None]
X = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / s).astype(np.float32)

# 1. default path: the fused kernel tiles the 25,600-pixel grid itself
model = pv.models.iVAE(DIM, latent_dim=2, invariances=["r"], seed=1)
trainer = model.fit(X, epochs=5, batch_size=64)
print("default (fused kernel):", trainer.loss_history["training_loss"])

# 2. pixel-chunked: same math, [B, N/8, H] working set, any backend/config
model_c = pv.models.iVAE(DIM, latent_dim=2, invariances=["r"], seed=1,
                         pixel_chunks=8)
trainer_c = model_c.fit(X, epochs=5, batch_size=64)
print("pixel_chunks=8:        ", trainer_c.loss_history["training_loss"])

# identical trajectories — the partition is exact
a = np.asarray(trainer.loss_history["training_loss"])
b = np.asarray(trainer_c.loss_history["training_loss"])
assert np.allclose(a, b, rtol=5e-4), (a, b)

# 3. pixel-SHARDED across a mesh (needs >1 device; composes with 'data' DP)
if len(jax.devices()) >= 2:
    from jax.sharding import Mesh
    from pyroved_tpu.parallel import shard_pixels
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("pixels",))
    model_s = pv.models.iVAE(DIM, latent_dim=2, invariances=["r"], seed=1)
    shard_pixels(model_s, mesh)
    trainer_s = model_s.fit(X, epochs=2, batch_size=64)
    print("shard_pixels (2 dev): ", trainer_s.loss_history["training_loss"])

print("large_grid_training OK")
