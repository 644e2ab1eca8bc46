"""Explicit-collective SPMD training step (shard_map + psum).

The default data-parallel path lets XLA GSPMD derive the gradient
all-reduce from sharding constraints (``SVItrainer(mesh=...)``). This module
provides the explicit alternative — ``jax.shard_map`` over the ``'data'``
mesh axis with a hand-placed ``lax.psum`` gradient reduction — for users who
want visible, auditable collectives (and as the building block for schedules
GSPMD cannot derive). Both express the same computation; the collectives
ride ICI either way.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def make_spmd_train_step(model, optimizer: optax.GradientTransformation,
                         mesh: Mesh, axis: str = "data"):
    """Builds ``step(params, opt_state, rng, batch, weights, beta)`` that
    runs one SGD step with the batch sharded over ``axis``:

    * each shard computes the summed per-example loss and its gradient on
      its local examples (with a shard-distinct PRNG fold for the latent
      draws),
    * ``lax.psum`` over ICI reduces gradients and loss,
    * the (replicated) Adam update runs identically on every shard.

    The batch's leading dim must be divisible by the axis size. Returns a
    jitted function producing (params, opt_state, loss).
    """
    gate = getattr(model, "sync_fusion_gate", None)
    if gate is not None:
        gate()  # TP-sharded decoder weights auto-disable the fused kernel
    loss_fn = model.loss_fn

    def local_step(params, opt_state, rng, batch, weights, beta):
        # distinct latent noise per shard (the batch rows differ per shard)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def batch_loss(p):
            return jnp.sum(loss_fn(p, rng, batch, beta) * weights)

        loss, grads = jax.value_and_grad(batch_loss)(params)
        grads = jax.lax.psum(grads, axis)        # gradient all-reduce over ICI
        loss = jax.lax.psum(loss, axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, rng, batch: Tuple, weights, beta):
        batch_specs = tuple(P(axis) for _ in batch)
        # check_vma=False: pallas_call cannot declare how its outputs vary
        # across mesh axes, so the varying-mesh-axes lint rejects any fused
        # kernel inside the mapped body; the psum placement here is explicit
        # and covered by the numerics tests.
        mapped = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P(), batch_specs, P(axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return mapped(params, opt_state, rng, batch, weights, beta)

    return jax.jit(step, donate_argnums=(0, 1))
