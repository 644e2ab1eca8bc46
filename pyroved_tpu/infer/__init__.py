"""Functional distributions and ELBO building blocks."""
from . import dists
from .dists import get_sampler
from .elbo import normal_latent_site, obs_site

__all__ = ["dists", "get_sampler", "normal_latent_site", "obs_site"]
