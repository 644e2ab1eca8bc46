"""Golden convergence bands for EVERY model family (the flagship iVAE band
lives in test_trainers.py): short fixed-seed runs on fixed synthetic data
must land in measured loss bands, so a silent ELBO/gradient regression in
any family fails CI. Bands were measured on the 8-virtual-device CPU
platform and carry ~25% headroom for platform/precision variation.

Mirrors the reference's trainer smoke tests
(`/root/reference/tests/test_trainers.py:26-129`) upgraded to quantitative.
"""
import numpy as np
import pytest

import pyroved_tpu as pv

DATA = (12, 12)


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(7)
    yy, xx = np.meshgrid(np.linspace(-1, 1, 12), np.linspace(-1, 1, 12),
                         indexing="ij")
    th = rng.uniform(0, 2 * np.pi, 192)
    xr = (xx[None] * np.cos(th)[:, None, None]
          - yy[None] * np.sin(th)[:, None, None])
    X = np.exp(-(xr ** 2) / 0.05 - (yy[None] ** 2) / 0.3).astype(np.float32)
    y1h = np.eye(3, dtype=np.float32)[(th // (2 * np.pi / 3)).astype(int)]
    yreg = (th[:, None] / (2 * np.pi)).astype(np.float32)
    spec = np.stack([np.exp(-(np.linspace(-1, 1, 16) - (a / np.pi - 1)) ** 2
                            / 0.1) for a in th]).astype(np.float32)
    return X, y1h, yreg, spec


def test_golden_jivae_band(dataset):
    X = dataset[0]
    m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=3,
                        invariances=["r"], seed=1)
    t = pv.trainers.SVItrainer(m, seed=1)
    losses = t.run(pv.utils.init_dataloader(X, batch_size=64, seed=1), 5)
    # measured: [95.2, 67.3, 54.8, 55.6, 57.3]
    assert 40.0 < losses[-1] < 75.0, losses
    assert losses[0] > losses[-1]


def test_golden_ssivae_band(dataset):
    X, y1h = dataset[0], dataset[1]
    loaders = pv.utils.init_ssvae_dataloaders(
        X, (X[:64], y1h[:64]), (X[:64], y1h[:64]), batch_size=32)
    m = pv.models.ssiVAE(DATA, latent_dim=2, num_classes=3,
                         invariances=["r"], seed=1)
    t = pv.trainers.auxSVItrainer(m, seed=1)
    for _ in range(5):
        t.step(loaders[0], loaders[1])
    h = t.history["training_loss"]
    # measured: [84.4, 58.1, 54.9, 54.4, 53.1]
    assert 40.0 < h[-1] < 70.0, h
    assert h[0] > h[-1]


def test_golden_ss_reg_ivae_band(dataset):
    X, yreg = dataset[0], dataset[2]
    m = pv.models.ss_reg_iVAE(DATA, latent_dim=2, reg_dim=1,
                              invariances=["r"], seed=1)
    t = pv.trainers.auxSVItrainer(m, seed=1)
    lu = pv.utils.init_dataloader(X, batch_size=32, seed=1)
    ls = pv.utils.init_dataloader(X[:64], yreg[:64], batch_size=32, seed=1)
    for _ in range(5):
        t.step(lu, ls)
    h = t.history["training_loss"]
    # measured: [85.5, 58.9, 55.2, 54.3, 53.4]
    assert 40.0 < h[-1] < 70.0, h
    assert h[0] > h[-1]


def test_golden_ved_band(dataset):
    X, spec = dataset[0], dataset[3]
    m = pv.models.VED(DATA, (16,), latent_dim=2, seed=1)
    t = pv.trainers.SVItrainer(m, seed=1)
    losses = t.run(pv.utils.init_dataloader(X, spec, batch_size=64, seed=1), 5)
    # measured: [11.3, 10.7, 9.6, 9.5, 9.6]
    assert 7.0 < losses[-1] < 11.0, losses
    assert losses[0] > losses[-1]
