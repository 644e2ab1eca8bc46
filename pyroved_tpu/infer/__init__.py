"""Functional distributions and ELBO building blocks."""
from . import dists
from .dists import get_sampler
from .elbo import TraceELBO, normal_latent_site, obs_site

__all__ = ["dists", "get_sampler", "TraceELBO", "normal_latent_site",
           "obs_site"]
