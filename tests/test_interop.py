"""Torch-weight interop: reference pyroVED state_dicts <-> our param trees.

Builds torch modules with the REFERENCE's exact module names / Sequential
layouts (``pyroved/nets/fc.py``, ``pyroved/nets/conv.py``), loads their
state_dicts into our models via ``load_torch_weights``, and checks forward
parity against the torch forward pass; plus bidirectional round-trips.
"""
import jax
import numpy as np
import pytest
import torch

# TPU hardware tanh differs from torch's libm by ~2.4e-5 per layer
_ATOL = 1e-4 if jax.devices()[0].platform == "tpu" else 1e-5
import torch.nn as tnn
import torch.nn.functional as F

import pyroved_tpu as pv
from pyroved_tpu import interop


def _np(t):
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# Reference-shaped torch modules (names match pyroved/nets/*.py state_dicts)
# ---------------------------------------------------------------------------

class TorchCoordLatent(tnn.Module):
    def __init__(self, latent_dim, h):
        super().__init__()
        self.fc_coord = tnn.Linear(2, h)
        self.fc_latent = tnn.Linear(latent_dim, h, bias=False)

    def forward(self, x_coord, z):
        b, n = x_coord.shape[:2]
        hx = self.fc_coord(x_coord.reshape(b * n, -1)).reshape(b, n, -1)
        h = hx + self.fc_latent(z).unsqueeze(1)
        return torch.tanh(h.reshape(b * n, -1))


class TorchFcEncoder(tnn.Module):
    def __init__(self, in_dim, z_out, hidden=(128, 128)):
        super().__init__()
        layers = []
        dims = [in_dim] + list(hidden)
        for a, b in zip(dims[:-1], dims[1:]):
            layers += [tnn.Linear(a, b), tnn.Tanh()]
        self.fc_layers = tnn.Sequential(*layers)
        self.fc11 = tnn.Linear(hidden[-1], z_out)
        self.fc12 = tnn.Linear(hidden[-1], z_out)

    def forward(self, x):
        h = self.fc_layers(x.reshape(x.shape[0], -1))
        return self.fc11(h), F.softplus(self.fc12(h))


class TorchSDecoder(tnn.Module):
    def __init__(self, latent_dim, hidden=(128, 128)):
        super().__init__()
        self.coord_latent = TorchCoordLatent(latent_dim, hidden[0])
        layers = []
        dims = [hidden[0]] + list(hidden)
        for a, b in zip(dims[:-1], dims[1:]):
            layers += [tnn.Linear(a, b), tnn.Tanh()]
        self.fc_layers = tnn.Sequential(*layers)
        self.out = tnn.Linear(hidden[-1], 1)

    def forward(self, x_coord, z):
        b, n = x_coord.shape[:2]
        h = self.coord_latent(x_coord, z)
        h = self.fc_layers(h)
        return torch.sigmoid(self.out(h)).reshape(b, n)


class TorchIVAE(tnn.Module):
    """state_dict container with reference attribute names."""

    def __init__(self, in_dim, z_out, latent_dim):
        super().__init__()
        self.encoder_z = TorchFcEncoder(in_dim, z_out)
        self.decoder = TorchSDecoder(latent_dim)


class TorchConvEncoder(tnn.Module):
    """Reference convEncoderNet layout for 2-D input, default filters
    ((32,), (64, 64), (128, 128)), no batchnorm, pool_last=False."""

    def __init__(self, latent_dim, feat_rows):
        super().__init__()
        lr = tnn.LeakyReLU
        self.feature_extractor = tnn.Module()
        self.feature_extractor.layers = tnn.Sequential(
            tnn.Conv2d(1, 32, 3, 1, 1), lr(), tnn.MaxPool2d(2, 2),
            tnn.Conv2d(32, 64, 3, 1, 1), lr(),
            tnn.Conv2d(64, 64, 3, 1, 1), lr(), tnn.MaxPool2d(2, 2),
            tnn.Conv2d(64, 128, 3, 1, 1), lr(),
            tnn.Conv2d(128, 128, 3, 1, 1), lr(),
        )
        self.features2latent = tnn.Module()
        self.features2latent.fc_latent = tnn.Linear(feat_rows, 2 * latent_dim)
        self.latent_dim = latent_dim

    def forward(self, x):
        f = self.feature_extractor.layers(x)
        enc = self.features2latent.fc_latent(f.reshape(f.shape[0], -1))
        mu, sig = enc.split(self.latent_dim, 1)
        return mu, F.softplus(sig)


class TorchUpBlock1d(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv1d(ch, ch, 1, 1, 0)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv(x)


class TorchConvDecoder1d(tnn.Module):
    """Reference convDecoderNet layout for 1-D output, default filters
    ((128, 128), (64, 64), (32,))."""

    def __init__(self, latent_dim, out_len):
        super().__init__()
        lr = tnn.LeakyReLU
        in_spatial = out_len // 8
        self.latent2features = tnn.Module()
        self.latent2features.fc = tnn.Linear(latent_dim, 128 * in_spatial)
        self.upsampler = tnn.Module()
        self.upsampler.layers = tnn.Sequential(
            tnn.Conv1d(128, 128, 3, 1, 1), lr(),
            tnn.Conv1d(128, 128, 3, 1, 1), lr(), TorchUpBlock1d(128),
            tnn.Conv1d(128, 64, 3, 1, 1), lr(),
            tnn.Conv1d(64, 64, 3, 1, 1), lr(), TorchUpBlock1d(64),
            tnn.Conv1d(64, 32, 3, 1, 1), lr(), TorchUpBlock1d(32),
            tnn.Conv1d(32, 1, 1, 1, 0),
        )
        self.in_spatial = in_spatial

    def forward(self, z):
        x = self.latent2features.fc(z).reshape(z.shape[0], 128, self.in_spatial)
        return torch.sigmoid(self.upsampler.layers(x))


class TorchVED(tnn.Module):
    def __init__(self, latent_dim, feat_rows, out_len):
        super().__init__()
        self.encoder_z = TorchConvEncoder(latent_dim, feat_rows)
        self.decoder = TorchConvDecoder1d(latent_dim, out_len)


# ---------------------------------------------------------------------------
# Forward parity after import
# ---------------------------------------------------------------------------

def test_ivae_torch_import_forward_parity():
    torch.manual_seed(3)
    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r", "t", "s"])
    tm = TorchIVAE(64, z_out=2 + 4, latent_dim=2)
    model.load_torch_weights(tm.state_dict())

    x = np.random.default_rng(0).random((5, 8, 8)).astype(np.float32)
    mu_t, sig_t = tm.encoder_z(torch.from_numpy(x))
    z_loc, z_scale = model.encode(x)
    np.testing.assert_allclose(np.asarray(z_loc), _np(mu_t), atol=_ATOL)
    np.testing.assert_allclose(np.asarray(z_scale), _np(sig_t), atol=_ATOL)

    z = np.random.default_rng(1).normal(size=(4, 2)).astype(np.float32)
    dec = model.decode(z)
    grid_t = torch.from_numpy(np.asarray(model.grid)).expand(4, -1, -1)
    dec_t = tm.decoder(grid_t, torch.from_numpy(z)).reshape(4, 8, 8)
    np.testing.assert_allclose(np.asarray(dec), _np(dec_t), atol=_ATOL)


def test_ved_torch_import_forward_parity():
    torch.manual_seed(4)
    model = pv.models.VED((8, 8), (16,), latent_dim=2)
    tm = TorchVED(latent_dim=2, feat_rows=128 * 2 * 2, out_len=16)
    model.load_torch_weights(tm.state_dict())

    x = np.random.default_rng(0).random((3, 8, 8)).astype(np.float32)
    mu_t, sig_t = tm.encoder_z(torch.from_numpy(x).unsqueeze(1))
    z_loc, z_scale = model.encode(x)
    np.testing.assert_allclose(np.asarray(z_loc), _np(mu_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_scale), _np(sig_t), rtol=1e-4, atol=1e-4)

    z = np.random.default_rng(1).normal(size=(3, 2)).astype(np.float32)
    dec = model.decode(z)
    dec_t = tm.decoder(torch.from_numpy(z))[:, 0, :]
    np.testing.assert_allclose(np.asarray(dec), _np(dec_t), rtol=1e-4, atol=1e-4)


def test_load_from_pt_file(tmp_path):
    torch.manual_seed(5)
    tm = TorchIVAE(64, z_out=3, latent_dim=2)
    path = tmp_path / "ref_weights.pt"
    torch.save(tm.state_dict(), str(path))
    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"])
    model.load_torch_weights(str(path))
    x = np.random.default_rng(0).random((2, 8, 8)).astype(np.float32)
    mu_t, _ = tm.encoder_z(torch.from_numpy(x))
    z_loc, _ = model.encode(x)
    np.testing.assert_allclose(np.asarray(z_loc), _np(mu_t), atol=_ATOL)


# ---------------------------------------------------------------------------
# Round-trips (ours -> torch keys -> ours) for every model family
# ---------------------------------------------------------------------------

def _assert_tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a)} != {set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                       atol=1e-6, err_msg=path + "/" + str(k))


@pytest.mark.parametrize("make", [
    lambda: pv.models.iVAE((8, 8), latent_dim=2, invariances=["r", "t"], c_dim=3),
    lambda: pv.models.jiVAE((8, 8), latent_dim=2, discrete_dim=4, invariances=["t"]),
    lambda: pv.models.ssiVAE((8, 8), latent_dim=2, num_classes=3, invariances=["r"]),
    lambda: pv.models.ss_reg_iVAE((8, 8), latent_dim=2, reg_dim=1),
    lambda: pv.models.VED((8, 8), (16,), latent_dim=2),
    lambda: pv.models.iVAE((24,), latent_dim=2, invariances=["t"]),
    # non-default architectures
    lambda: pv.models.iVAE((8, 8), latent_dim=3, invariances=["r"],
                           hidden_dim_e=(96, 64, 32), hidden_dim_d=(64, 64)),
    lambda: pv.models.VED((8, 8), (16, 16), latent_dim=2,
                          hidden_dim_e=((16,), (32, 32)),
                          hidden_dim_d=((32,), (16, 16))),
    lambda: pv.models.VED((8, 8, 8), (16,), latent_dim=2,
                          hidden_dim_e=((8,), (16, 16))),
    lambda: pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"],
                           channels=3),
])
def test_round_trip(make):
    model = make()
    sd = interop.params_to_torch(model)
    params, stats = interop.torch_to_params(model, sd)
    _assert_tree_equal(model.params, params)
    assert stats == {}


def test_quirk_pool_config_rejected():
    """Configs where the reference's conv-counted maxpool placement
    diverges from block-counted placement (last block with a single conv)
    are untrainable in the reference; interop must refuse them rather than
    emit a self-inconsistent mapping."""
    model = pv.models.VED((8, 8), (16,), latent_dim=2,
                          hidden_dim_e=((8,), (16,)))
    with pytest.raises(ValueError, match="maxpool"):
        interop.params_to_torch(model)


def test_round_trip_batchnorm_ved():
    model = pv.models.VED((8, 8), (16,), latent_dim=2, batchnorm=True)
    sd = interop.params_to_torch(model)
    bn_keys = [k for k in sd if "running_mean" in k]
    assert bn_keys, "batchnorm stats missing from exported state_dict"
    assert any(k.endswith("num_batches_tracked") for k in sd)
    params, stats = interop.torch_to_params(model, sd)
    _assert_tree_equal(model.params, params)
    assert "encoder_z" in stats and "decoder" in stats


class TorchBNVED(tnn.Module):
    """Reference-shaped VED with batchnorm: encoder filters ((8,), (16, 16))
    on 8x8 input, decoder filters ((16, 16), (8,)) to a 16-point spectrum."""

    def __init__(self):
        super().__init__()
        lr = tnn.LeakyReLU
        self.encoder_z = tnn.Module()
        self.encoder_z.feature_extractor = tnn.Module()
        self.encoder_z.feature_extractor.layers = tnn.Sequential(
            tnn.Conv2d(1, 8, 3, 1, 1), lr(), tnn.BatchNorm2d(8),
            tnn.MaxPool2d(2, 2),
            tnn.Conv2d(8, 16, 3, 1, 1), lr(), tnn.BatchNorm2d(16),
            tnn.Conv2d(16, 16, 3, 1, 1), lr(), tnn.BatchNorm2d(16),
        )
        self.encoder_z.features2latent = tnn.Module()
        self.encoder_z.features2latent.fc_latent = tnn.Linear(16 * 4 * 4, 4)
        self.decoder = tnn.Module()
        self.decoder.latent2features = tnn.Module()
        self.decoder.latent2features.fc = tnn.Linear(2, 16 * 4)
        self.decoder.upsampler = tnn.Module()
        self.decoder.upsampler.layers = tnn.Sequential(
            tnn.Conv1d(16, 16, 3, 1, 1), lr(), tnn.BatchNorm1d(16),
            tnn.Conv1d(16, 16, 3, 1, 1), lr(), tnn.BatchNorm1d(16),
            TorchUpBlock1d(16),
            tnn.Conv1d(16, 8, 3, 1, 1), lr(), tnn.BatchNorm1d(8),
            TorchUpBlock1d(8),
            tnn.Conv1d(8, 1, 1, 1, 0),
        )

    def encode(self, x):
        f = self.encoder_z.feature_extractor.layers(x)
        enc = self.encoder_z.features2latent.fc_latent(f.reshape(f.shape[0], -1))
        mu, sig = enc.split(2, 1)
        return mu, F.softplus(sig)

    def decode(self, z):
        x = self.decoder.latent2features.fc(z).reshape(z.shape[0], 16, 4)
        return torch.sigmoid(self.decoder.upsampler.layers(x))


def test_batchnorm_running_stats_forward_parity():
    """Imported BatchNorm running statistics must drive inference: compare
    against the torch model in eval() mode after its stats have drifted
    from their init via a few train-mode forwards."""
    torch.manual_seed(6)
    tm = TorchBNVED()
    rng = np.random.default_rng(2)
    tm.train()
    for _ in range(3):  # accumulate nontrivial running stats
        tm.encode(torch.from_numpy(rng.random((16, 1, 8, 8), np.float32).copy()))
        tm.decode(torch.from_numpy(rng.normal(size=(16, 2)).astype(np.float32)))
    tm.eval()

    model = pv.models.VED((8, 8), (16,), latent_dim=2, batchnorm=True,
                          hidden_dim_e=((8,), (16, 16)),
                          hidden_dim_d=((16, 16), (8,)))
    model.load_torch_weights(tm.state_dict())
    assert model.use_running_stats

    x = rng.random((5, 8, 8), np.float32)
    with torch.no_grad():
        mu_t, sig_t = tm.encode(torch.from_numpy(x).unsqueeze(1))
    z_loc, z_scale = model.encode(x)
    np.testing.assert_allclose(np.asarray(z_loc), _np(mu_t), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z_scale), _np(sig_t), rtol=1e-4, atol=1e-4)

    z = rng.normal(size=(4, 2)).astype(np.float32)
    with torch.no_grad():
        dec_t = tm.decode(torch.from_numpy(z))[:, 0, :]
    dec = model.decode(z)
    np.testing.assert_allclose(np.asarray(dec), _np(dec_t), rtol=1e-4, atol=1e-4)


def test_batchnorm_stats_shape_mismatch_raises():
    model = pv.models.VED((8, 8), (16,), latent_dim=2, batchnorm=True)
    sd = interop.params_to_torch(model)
    key = next(k for k in sd if k.endswith("running_mean"))
    sd[key] = np.zeros(7, np.float32)
    with pytest.raises(ValueError, match="shape"):
        interop.torch_to_params(model, sd)


# ---------------------------------------------------------------------------
# Validation errors
# ---------------------------------------------------------------------------

def test_missing_key_strict_raises():
    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"])
    sd = interop.params_to_torch(model)
    sd.pop("encoder_z.fc11.weight")
    with pytest.raises(KeyError, match="missing"):
        interop.torch_to_params(model, sd)
    # non-strict: skipped, remaining weights still land
    params, _ = interop.torch_to_params(model, sd, strict=False)
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["out"]["bias"]),
        np.asarray(model.params["decoder"]["out"]["bias"]))


def test_extra_key_strict_raises():
    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"])
    sd = interop.params_to_torch(model)
    sd["decoder.bogus.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(KeyError, match="extra"):
        interop.torch_to_params(model, sd)
    interop.torch_to_params(model, sd, strict=False)


def test_shape_mismatch_raises():
    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"])
    other = pv.models.iVAE((8, 8), latent_dim=3, invariances=["r"])
    sd = interop.params_to_torch(other)
    with pytest.raises(ValueError, match="shape"):
        interop.torch_to_params(model, sd)


def test_torch_load_rejects_code(tmp_path):
    """load_torch_weights uses weights_only torch.load: a pickled payload
    carrying arbitrary objects must be rejected, not executed."""
    import pickle

    class Evil:
        def __reduce__(self):
            return (print, ("should never run",))

    path = tmp_path / "evil.pt"
    with open(path, "wb") as f:
        pickle.dump({"encoder_z.fc11.weight": Evil()}, f)
    model = pv.models.iVAE((8, 8), latent_dim=2, invariances=["r"])
    with pytest.raises(Exception):
        model.load_torch_weights(str(path))
