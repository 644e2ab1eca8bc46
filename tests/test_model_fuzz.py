"""Seeded end-to-end fuzz over random model configurations.

Property test across the construction space (family x invariances x
sampler x kl x channels x hidden widths x data shape): every sampled
config must construct, produce finite per-example losses AND gradients,
round-trip encode/decode shapes, and survive save/load. Catches
constructor/shape/routing edge cases the enumerated tests miss.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyroved_tpu as pv

RNG = np.random.default_rng(20260817)


def _sample_config(rng):
    ndim = int(rng.integers(1, 3))
    if ndim == 1:
        data_dim = (int(rng.integers(8, 40)),)
        invariances = [None, ["t"]][int(rng.integers(0, 2))]
    else:
        data_dim = (int(rng.integers(5, 14)), int(rng.integers(5, 14)))
        invariances = [None, ["r"], ["t"], ["r", "t"], ["r", "t", "s"]][
            int(rng.integers(0, 5))]
    return dict(
        data_dim=data_dim,
        invariances=invariances,
        latent_dim=int(rng.integers(2, 5)),
        sampler=["bernoulli", "continuous_bernoulli", "gaussian"][
            int(rng.integers(0, 3))],
        kl=["mc", "analytic"][int(rng.integers(0, 2))],
        channels=int(rng.integers(1, 4)),
        hidden=tuple(int(rng.integers(8, 80))
                     for _ in range(int(rng.integers(1, 3)))),
    )


def _data(rng, cfg, n=4):
    shape = (n,) + cfg["data_dim"] + (
        (cfg["channels"],) if cfg["channels"] > 1 else ())
    return rng.uniform(0, 1, shape).astype(np.float32)


def _check_finite(loss, tag):
    assert loss.shape[0] > 0 and np.isfinite(np.asarray(loss)).all(), tag


@pytest.mark.parametrize("trial", range(8))
def test_ivae_fuzz(trial, tmp_path):
    rng = np.random.default_rng(1000 + trial)
    cfg = _sample_config(rng)
    m = pv.models.iVAE(cfg["data_dim"], latent_dim=cfg["latent_dim"],
                       invariances=cfg["invariances"],
                       hidden_dim_d=cfg["hidden"], sampler_d=cfg["sampler"],
                       kl=cfg["kl"], channels=cfg["channels"],
                       sigmoid_d=cfg["sampler"] != "gaussian")
    x = _data(rng, cfg)
    key = jax.random.PRNGKey(trial)
    loss = m.loss_fn(m.params, key, (jnp.asarray(x),), jnp.asarray(1.0))
    _check_finite(loss, cfg)
    g = jax.grad(lambda p: jnp.sum(
        m.loss_fn(p, key, (jnp.asarray(x),), jnp.asarray(1.0))))(m.params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g)), cfg
    z_loc, z_scale = m.encode(x)
    assert z_loc.shape == (4, m.z_dim) and (np.asarray(z_scale) > 0).all()
    dec = m.decode(np.asarray(z_loc)[:, m.coord:])
    assert dec.shape == x.shape, (dec.shape, x.shape, cfg)
    # persistence round-trip preserves outputs
    m.save_weights(str(tmp_path / "w"))
    m2 = pv.models.iVAE(cfg["data_dim"], latent_dim=cfg["latent_dim"],
                        invariances=cfg["invariances"],
                        hidden_dim_d=cfg["hidden"], sampler_d=cfg["sampler"],
                        kl=cfg["kl"], channels=cfg["channels"],
                        sigmoid_d=cfg["sampler"] != "gaussian", seed=7)
    m2.load_weights(str(tmp_path / "w"))
    np.testing.assert_allclose(np.asarray(m2.encode(x)[0]),
                               np.asarray(z_loc), atol=1e-6)


@pytest.mark.parametrize("trial", range(4))
def test_family_fuzz(trial):
    """jiVAE / ssiVAE / ss_reg_iVAE with random shapes: losses and
    gradients finite on both labeled and unlabeled batches."""
    rng = np.random.default_rng(2000 + trial)
    cfg = _sample_config(rng)
    if cfg["sampler"] == "gaussian":
        cfg["sampler"] = "bernoulli"  # keep sigmoid head in this fuzz
    K = int(rng.integers(2, 5))
    x = jnp.asarray(_data(rng, cfg, n=6))
    key = jax.random.PRNGKey(trial)
    common = dict(latent_dim=cfg["latent_dim"], invariances=cfg["invariances"],
                  hidden_dim_d=cfg["hidden"], sampler_d=cfg["sampler"],
                  kl=cfg["kl"], channels=cfg["channels"])

    j = pv.models.jiVAE(cfg["data_dim"], discrete_dim=K, **common)
    _check_finite(j.loss_fn(j.params, key, (x,), j.prep_beta(1.0)), cfg)

    s = pv.models.ssiVAE(cfg["data_dim"], num_classes=K, **common)
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, K, 6)), K)
    _check_finite(s.loss_fn(s.params, key, (x,), jnp.asarray(1.0)), cfg)
    _check_finite(s.loss_fn(s.params, key, (x, y), jnp.asarray(1.0)), cfg)
    _check_finite(s.aux_loss_fn(s.params, key, (x, y), jnp.asarray(20.0)), cfg)

    r = pv.models.ss_reg_iVAE(cfg["data_dim"], reg_dim=2, **common)
    yr = jnp.asarray(rng.normal(size=(6, 2)), jnp.float32)
    _check_finite(r.loss_fn(r.params, key, (x,), jnp.asarray(1.0)), cfg)
    _check_finite(r.loss_fn(r.params, key, (x, yr), jnp.asarray(1.0)), cfg)
