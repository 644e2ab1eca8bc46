"""Distribution log-density parity vs torch.distributions (the reference's
numerics, pyroved/utils/prob.py)."""
import numpy as np
import pytest
import torch
import torch.distributions as td

import jax
import jax.numpy as jnp

from pyroved_tpu.infer import dists


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_normal_log_prob_parity(rng):
    x = rng.normal(size=(8, 5)).astype(np.float32)
    loc = rng.normal(size=(8, 5)).astype(np.float32)
    scale = rng.uniform(0.1, 2.0, size=(8, 5)).astype(np.float32)
    ours = np.asarray(dists.normal_log_prob(jnp.asarray(x), jnp.asarray(loc), jnp.asarray(scale)))
    ref = td.Normal(torch.tensor(loc), torch.tensor(scale)).log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_normal_kl_analytic(rng):
    loc = rng.normal(size=(4, 3)).astype(np.float32)
    scale = rng.uniform(0.2, 1.5, size=(4, 3)).astype(np.float32)
    ours = np.asarray(dists.normal_kl(jnp.asarray(loc), jnp.asarray(scale)))
    ref = td.kl_divergence(
        td.Normal(torch.tensor(loc), torch.tensor(scale)),
        td.Normal(torch.zeros_like(torch.tensor(loc)), torch.ones_like(torch.tensor(scale)))
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bernoulli_log_prob_nonbinary_obs(rng):
    # validate_args=False semantics: grayscale observations are allowed
    x = rng.uniform(0, 1, size=(6, 10)).astype(np.float32)
    p = rng.uniform(0.01, 0.99, size=(6, 10)).astype(np.float32)
    ours = np.asarray(dists.bernoulli_log_prob(jnp.asarray(x), jnp.asarray(p)))
    ref = td.Bernoulli(probs=torch.tensor(p), validate_args=False).log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_bernoulli_log_prob_corners():
    x = jnp.asarray([[0.0, 1.0, 1.0, 0.0]])
    p = jnp.asarray([[0.0, 1.0, 0.5, 0.5]])
    out = np.asarray(dists.bernoulli_log_prob(x, p))
    assert np.isfinite(out[0, 0]) and np.isfinite(out[0, 1])
    np.testing.assert_allclose(out[0, 2:], np.log(0.5), rtol=1e-6)


def test_continuous_bernoulli_parity(rng):
    x = rng.uniform(0, 1, size=(5, 7)).astype(np.float32)
    p = rng.uniform(0.05, 0.95, size=(5, 7)).astype(np.float32)
    ours = np.asarray(dists.continuous_bernoulli_log_prob(jnp.asarray(x), jnp.asarray(p)))
    ref = td.ContinuousBernoulli(probs=torch.tensor(p)).log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_continuous_bernoulli_near_half():
    x = jnp.full((1, 4), 0.3)
    p = jnp.asarray([[0.5, 0.4999, 0.5001, 0.499]])
    ours = np.asarray(dists.continuous_bernoulli_log_prob(x, p))
    ref = td.ContinuousBernoulli(probs=torch.tensor(np.asarray(p))).log_prob(
        torch.tensor(np.asarray(x))).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_one_hot_categorical_parity(rng):
    p = rng.uniform(0.1, 1.0, size=(6, 4)).astype(np.float32)
    p = p / p.sum(-1, keepdims=True)
    idx = rng.integers(0, 4, size=6)
    x = np.eye(4, dtype=np.float32)[idx]
    ours = np.asarray(dists.one_hot_categorical_log_prob(jnp.asarray(x), jnp.asarray(p)))
    ref = td.OneHotCategorical(probs=torch.tensor(p)).log_prob(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_normal_sample_reparam_stats():
    key = jax.random.PRNGKey(0)
    z = dists.normal_sample(key, jnp.full((20000,), 2.0), jnp.full((20000,), 0.5))
    assert abs(float(z.mean()) - 2.0) < 0.02
    assert abs(float(z.std()) - 0.5) < 0.02


def test_get_sampler_dispatch():
    for name in ("bernoulli", "continuous_bernoulli", "gaussian"):
        obs = dists.get_sampler(name)
        assert obs.name == name
    with pytest.raises(KeyError):
        dists.get_sampler("poisson")


def test_gaussian_sampler_sigma_kwarg():
    obs = dists.get_sampler("gaussian", decoder_sig=0.1)
    x = jnp.zeros((4,))
    loc = jnp.zeros((4,))
    lp = np.asarray(obs.log_prob(x, loc))
    ref = td.Normal(0.0, 0.1).log_prob(torch.tensor(0.0)).item()
    np.testing.assert_allclose(lp, ref, rtol=1e-4)


def test_continuous_bernoulli_sample_range():
    obs = dists.get_sampler("continuous_bernoulli")
    key = jax.random.PRNGKey(1)
    p = jnp.asarray(np.random.default_rng(3).uniform(0.05, 0.95, (1000,)).astype(np.float32))
    s = np.asarray(obs.sample(key, p))
    assert (s >= 0).all() and (s <= 1).all()


def test_bernoulli_saturated_probs_finite():
    # f32-saturated sigmoid outputs must not give -inf (torch clamps too)
    p = jnp.asarray([[0.0, 1.0, 1e-30, 1.0 - 1e-8]])
    x = jnp.asarray([[1.0, 0.0, 1.0, 0.0]])
    out = np.asarray(dists.bernoulli_log_prob(x, p))
    assert np.isfinite(out).all()
    out_cb = np.asarray(dists.continuous_bernoulli_log_prob(x, p))
    assert np.isfinite(out_cb).all()
