"""Minimal functional distribution library for the ELBO engine.

Replaces the reference's dependency on ``pyro.distributions``
(``pyroved/utils/prob.py:5-37``) with pure-jnp log-density and sampling
functions. Everything is elementwise and shape-polymorphic so XLA can fuse
the densities straight into the surrounding matmuls; no distribution
objects, no validation machinery on the hot path.
"""
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_LOG_2PI = math.log(2.0 * math.pi)


# ---------------------------------------------------------------------------
# Normal
# ---------------------------------------------------------------------------

def normal_sample(rng: Array, loc: Array, scale: Array) -> Array:
    """Reparameterized draw z = loc + scale * eps."""
    eps = jax.random.normal(rng, loc.shape, loc.dtype)
    return loc + scale * eps


def normal_log_prob(x: Array, loc: Array, scale: Array) -> Array:
    z = (x - loc) / scale
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)


def std_normal_log_prob(x: Array) -> Array:
    return -0.5 * (x * x + _LOG_2PI)


def normal_kl(loc: Array, scale: Array) -> Array:
    """Analytic KL( N(loc, scale) || N(0, 1) ), elementwise."""
    var = scale * scale
    return 0.5 * (var + loc * loc - 1.0) - jnp.log(scale)


# ---------------------------------------------------------------------------
# Bernoulli (validate_args=False semantics: non-binary observations allowed,
# matching the reference sampler at utils/prob.py:26)
# ---------------------------------------------------------------------------

_PROB_EPS = float(np.finfo(np.float32).eps)


def bernoulli_log_prob(x: Array, probs: Array) -> Array:
    # Clamp to [eps, 1-eps] exactly like torch's probs_to_logits, so a
    # saturated sigmoid (p rounding to 0.0/1.0 in f32) cannot produce -inf;
    # xlogy then handles the 0*log(0) corners like torch's BCE path.
    probs = jnp.clip(probs, _PROB_EPS, 1.0 - _PROB_EPS)
    return jax.scipy.special.xlogy(x, probs) + jax.scipy.special.xlog1py(1.0 - x, -probs)


def _cb_log_norm(probs: Array) -> Array:
    """Log normalizing constant of the continuous Bernoulli (Loaiza-Ganem &
    Cunningham, NeurIPS 2019): C(p) = 2*atanh(1-2p) / (1-2p), with a 4th-order
    Taylor expansion in the numerically unstable window around p = 0.5."""
    # Clamp the direct formula away from 0.5 to keep it finite; the Taylor
    # branch is selected inside the unstable window so the clamp never leaks.
    unstable = jnp.abs(probs - 0.5) < 1e-3
    safe_p = jnp.where(unstable, 0.499, probs)
    x = 1.0 - 2.0 * safe_p
    direct = jnp.log(jnp.abs(2.0 * jnp.arctanh(x))) - jnp.log(jnp.abs(x))
    dp = probs - 0.5
    taylor = math.log(2.0) + (4.0 / 3.0) * dp**2 + (104.0 / 45.0) * dp**4
    return jnp.where(unstable, taylor, direct)


def continuous_bernoulli_log_prob(x: Array, probs: Array) -> Array:
    probs = jnp.clip(probs, _PROB_EPS, 1.0 - _PROB_EPS)
    return bernoulli_log_prob(x, probs) + _cb_log_norm(probs)


def _continuous_bernoulli_sample(rng: Array, probs: Array) -> Array:
    """Inverse-CDF draw; for p != 0.5,
    F^{-1}(u) = log(((2p-1)u + 1 - p) / (1 - p)) / log(p / (1-p))."""
    u = jax.random.uniform(rng, probs.shape, probs.dtype)
    unstable = jnp.abs(probs - 0.5) < 1e-4
    p = jnp.where(unstable, 0.499, probs)
    x = jnp.log(((2.0 * p - 1.0) * u + 1.0 - p) / (1.0 - p)) / (jnp.log(p) - jnp.log1p(-p))
    return jnp.where(unstable, u, x)


# ---------------------------------------------------------------------------
# OneHotCategorical
# ---------------------------------------------------------------------------

def one_hot_categorical_log_prob(x_onehot: Array, probs: Array) -> Array:
    """log p(one-hot x) under class probabilities; reduces the event dim."""
    return jnp.sum(jax.scipy.special.xlogy(x_onehot, probs), axis=-1)


def one_hot_categorical_sample(rng: Array, probs: Array) -> Array:
    idx = jax.random.categorical(rng, jnp.log(probs), axis=-1)
    return jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)


# ---------------------------------------------------------------------------
# Decoder observation samplers (reference: utils/prob.py:5-37)
# ---------------------------------------------------------------------------

class ObsModel(NamedTuple):
    """Decoder observation model: elementwise log-density + a sampler."""
    name: str
    log_prob: callable  # (x, loc) -> elementwise log density
    sample: callable    # (rng, loc) -> draw with the same shape as loc


def _gaussian_obs(decoder_sig: float) -> ObsModel:
    sig = float(decoder_sig)

    def log_prob(x, loc):
        return normal_log_prob(x, loc, jnp.asarray(sig, loc.dtype))

    def sample(rng, loc):
        return loc + sig * jax.random.normal(rng, loc.shape, loc.dtype)

    return ObsModel("gaussian", log_prob, sample)


def get_sampler(sampler: str, **kwargs) -> ObsModel:
    """Observation model registry mirroring the reference's ``get_sampler``
    ('bernoulli' | 'continuous_bernoulli' | 'gaussian'; ``decoder_sig``
    defaults to 0.5 for the gaussian, ``utils/prob.py:28``)."""
    if sampler == "bernoulli":
        return ObsModel(
            "bernoulli",
            bernoulli_log_prob,
            lambda rng, loc: jax.random.bernoulli(rng, loc).astype(loc.dtype),
        )
    if sampler == "continuous_bernoulli":
        return ObsModel(
            "continuous_bernoulli",
            continuous_bernoulli_log_prob,
            _continuous_bernoulli_sample,
        )
    if sampler == "gaussian":
        return _gaussian_obs(kwargs.get("decoder_sig", 0.5))
    raise KeyError(
        "Select between the following decoder samplers: "
        "['bernoulli', 'continuous_bernoulli', 'gaussian']"
    )
