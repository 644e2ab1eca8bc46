"""Production workflow: fused multi-epoch training, crash-safe checkpoints,
and StableHLO serving export.

No reference counterpart (the reference is notebook-driven with weight-only
persistence, ``pyroved/models/base.py:183-192``); this demonstrates the
TPU-native production loop:

1. train with auto-checkpointing every N epochs (full state: params +
   optimizer moments + PRNG + epoch + loss history),
2. simulate a crash and resume EXACTLY from the checkpoint,
3. finish training with the fused multi-epoch ``run()`` (one device
   dispatch),
4. export the trained model to a self-contained, pickle-free StableHLO
   artifact and serve it back — including a posed decode (the generated
   image re-rendered at a chosen rotation) — without the model object.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import pyroved_tpu as pv  # noqa: E402

pv.utils.profiling.enable_compilation_cache()


def make_data(n=2000, dim=24, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, dim), np.linspace(-1, 1, dim),
                         indexing="ij")
    th = rng.uniform(0, 2 * np.pi, n)
    xr = (xx[None] * np.cos(th)[:, None, None]
          - yy[None] * np.sin(th)[:, None, None])
    return np.exp(-(xr ** 2) / 0.05
                  - (yy[None] ** 2) / 0.3).astype(np.float32)


def main():
    tmp = tempfile.mkdtemp()
    ckpt = os.path.join(tmp, "train_state.npz")
    artifact = os.path.join(tmp, "rvae_serving.pvtx")

    X = make_data()
    loader = pv.utils.init_dataloader(X, batch_size=100)

    # --- 1. train with auto-checkpoint every 5 epochs -------------------
    model = pv.models.iVAE((24, 24), latent_dim=2, invariances=["r"], seed=1)
    trainer = pv.trainers.SVItrainer(model, checkpoint_path=ckpt,
                                     checkpoint_every=5)
    for _ in range(10):
        trainer.step(loader)
    print(f"trained 10 epochs, loss {trainer.loss_history['training_loss'][-1]:.4f}; "
          f"checkpoint at epoch {trainer.current_epoch}")

    # --- 2. "crash": fresh process state, resume exactly ----------------
    model2 = pv.models.iVAE((24, 24), latent_dim=2, invariances=["r"], seed=99)
    trainer2 = pv.trainers.SVItrainer(model2, checkpoint_path=ckpt)
    epoch = trainer2.resume()
    print(f"resumed at epoch {epoch} with "
          f"{len(trainer2.loss_history['training_loss'])} recorded losses")
    assert epoch == 10

    # --- 3. finish with the fused multi-epoch run -----------------------
    losses = trainer2.run(loader, 20)
    print(f"fused run: 20 epochs in one dispatch, "
          f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    assert losses[-1] < trainer.loss_history["training_loss"][0]

    # --- 4. export + serve without the model object ---------------------
    pv.serving.export_model(model2, artifact, batch_size=50)
    served = pv.serving.ServedModel(artifact)
    z_loc, z_scale = served.encode(X[:120])
    canonical = served.decode(np.zeros((4, 2), np.float32))
    rotated = served.decode(np.zeros((4, 2), np.float32), angle=np.pi / 4)
    print(f"served: encode {z_loc.shape}, canonical decode {canonical.shape}, "
          f"posed decode differs: {not np.allclose(np.asarray(canonical), np.asarray(rotated))}")
    print("PRODUCTION_WORKFLOW_OK")


if __name__ == "__main__":
    main()
