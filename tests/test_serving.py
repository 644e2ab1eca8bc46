"""Model export / serving round-trips (jax.export StableHLO artifacts)."""
import numpy as np

import jax.numpy as jnp

from pyroved_tpu.models import iVAE
from pyroved_tpu.serving import ServedModel, export_model


def test_export_and_serve_roundtrip(tmp_path):
    model = iVAE((8, 8), latent_dim=2, invariances=["r"])
    path = str(tmp_path / "model.pvtx")
    export_model(model, path, batch_size=8)

    served = ServedModel(path)
    x = np.random.default_rng(0).uniform(0, 1, (11, 8, 8)).astype(np.float32)
    z_loc, z_scale = served.encode(x)
    assert z_loc.shape == (11, 3)
    ref_loc, ref_scale = model.encode(x)
    np.testing.assert_allclose(np.asarray(z_loc), np.asarray(ref_loc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(z_scale), np.asarray(ref_scale), atol=1e-5)

    dec = served.decode(np.zeros((3, 2), np.float32))
    ref_dec = model.decode(np.zeros((3, 2), np.float32))
    np.testing.assert_allclose(np.asarray(dec).reshape(3, -1),
                               np.asarray(ref_dec).reshape(3, -1), atol=1e-5)


def test_export_vanilla_decoder(tmp_path):
    model = iVAE((8, 8), latent_dim=2, invariances=None)
    path = str(tmp_path / "vanilla.pvtx")
    export_model(model, path, batch_size=4)
    served = ServedModel(path)
    out = served.decode(np.zeros((4, 2), np.float32))
    assert np.asarray(out).shape[0] == 4
