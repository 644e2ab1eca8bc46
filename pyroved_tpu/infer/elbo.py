"""Reparameterized ELBO building blocks.

This is the TPU-native replacement for Pyro's ``SVI`` / ``Trace_ELBO`` /
``poutine.scale`` machinery (reference usage: ``trainers/svi.py:79-91``).
Instead of tracing probabilistic programs at runtime, each model composes
these site helpers into an explicit, jit-compiled per-example ELBO. Sign
convention: helpers return *positive* contributions to the ELBO; trainers
minimize ``-sum(elbo)``.

Scaling semantics match Pyro exactly: ``poutine.scale(beta)`` around a
latent site multiplies both its prior and guide log-densities, i.e. the ELBO
gets ``beta * (log p(z) - log q(z|x))``; observation terms are unscaled.
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from . import dists

Array = jax.Array


class TraceELBO:
    """Configuration object mirroring ``pyro.infer.Trace_ELBO`` for the
    trainer's ``loss=`` argument (reference: ``trainers/svi.py:82-91``):
    ``SVItrainer(model, loss=TraceELBO(num_particles=4, kl='analytic'))``
    applies the estimator settings to the model's loss function."""

    def __init__(self, num_particles: int = 1, kl: str = "mc"):
        if kl not in ("mc", "analytic"):
            raise ValueError("kl must be 'mc' or 'analytic'")
        self.num_particles = int(num_particles)
        self.kl = kl

    def configure(self, model) -> None:
        model.kl_mode = self.kl
        if hasattr(model, "num_particles"):
            model.num_particles = self.num_particles


def normal_latent_site(
    rng: Array,
    loc: Array,
    scale: Array,
    beta: Array = 1.0,
    kl: str = "mc",
) -> Tuple[Array, Array]:
    """Sample z ~ q = N(loc, scale) and return (z, elbo contribution).

    The contribution is ``beta * (log p(z) - log q(z))`` with p = N(0, I),
    summed over the event (last) dim. ``kl='mc'`` uses the single-sample
    Monte-Carlo estimator (what Pyro's ``Trace_ELBO`` computes); ``'analytic'``
    substitutes the closed-form Normal-Normal KL for lower variance.
    """
    z = dists.normal_sample(rng, loc, scale)
    if kl == "analytic":
        neg_kl = -jnp.sum(dists.normal_kl(loc, scale), axis=-1)
    else:
        neg_kl = jnp.sum(
            dists.std_normal_log_prob(z) - dists.normal_log_prob(z, loc, scale),
            axis=-1)
    return z, beta * neg_kl


def obs_site(obs_model: dists.ObsModel, x: Array, loc: Array) -> Array:
    """Observation term: log p(x | loc) summed over the event (last) dim,
    mirroring ``.to_event(1)`` on the flattened signal
    (reference: ``models/ivae.py:200-202``)."""
    return jnp.sum(obs_model.log_prob(x, loc), axis=-1)
