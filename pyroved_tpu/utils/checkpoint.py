"""Full-training-state checkpointing.

The reference persists only network ``state_dict`` weights
(``pyroved/models/base.py:183-192``), so resuming mid-training loses the
optimizer moments and RNG state. Here a checkpoint captures params +
optimizer state + PRNG + epoch + loss history, so training resumes exactly.
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _to_device(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def save_checkpoint(path: str, model, trainer=None, backend: str = "pickle") -> None:
    """Serialize model params (+ trainer optimizer state, histories).

    ``backend='orbax'`` writes an orbax-checkpoint directory (atomic,
    async-capable, multi-host aware) instead of a pickle file.
    """
    if backend == "orbax":
        _save_orbax(path, model, trainer)
        return
    payload = {
        "params": _to_host(model.params),
        "rng": np.asarray(jax.device_get(model.rng)) if model.rng is not None else None,
    }
    if trainer is not None:
        payload["opt_state"] = _to_host(trainer.opt_state)
        payload["current_epoch"] = trainer.current_epoch
        payload["loss_history"] = getattr(trainer, "loss_history",
                                          getattr(trainer, "history", None))
        payload["trainer_rng"] = np.asarray(jax.device_get(trainer.rng))
        if hasattr(trainer, "aux_opt_state"):
            payload["aux_opt_state"] = _to_host(trainer.aux_opt_state)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_checkpoint(path: str, model, trainer=None, backend: str = "pickle") -> None:
    """Restore state saved by :func:`save_checkpoint` in place."""
    if backend == "orbax":
        _load_orbax(path, model, trainer)
        return
    with open(path, "rb") as f:
        payload = pickle.load(f)
    model.params = _to_device(payload["params"])
    if payload.get("rng") is not None:
        model.rng = jnp.asarray(payload["rng"])
    if trainer is not None and "opt_state" in payload:
        trainer.opt_state = jax.tree_util.tree_map(
            lambda tmpl, new: jnp.asarray(new), trainer.opt_state,
            payload["opt_state"])
        trainer.current_epoch = payload["current_epoch"]
        hist = payload.get("loss_history")
        if hist is not None:
            if hasattr(trainer, "loss_history"):
                trainer.loss_history = hist
            else:
                trainer.history = hist
        trainer.rng = jnp.asarray(payload["trainer_rng"])
        if hasattr(trainer, "aux_opt_state") and "aux_opt_state" in payload:
            trainer.aux_opt_state = _to_device(payload["aux_opt_state"])


# ---------------------------------------------------------------------------
# orbax backend (atomic directory checkpoints)
# ---------------------------------------------------------------------------

def _orbax_payload(model, trainer):
    payload = {"params": _to_host(model.params)}
    if model.rng is not None:
        payload["rng"] = np.asarray(jax.device_get(model.rng))
    if trainer is not None:
        payload["opt_state"] = _to_host(trainer.opt_state)
        payload["trainer_rng"] = np.asarray(jax.device_get(trainer.rng))
        payload["current_epoch"] = np.asarray(trainer.current_epoch)
    return payload


def _save_orbax(path: str, model, trainer) -> None:
    import os

    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), _orbax_payload(model, trainer), force=True)


def _load_orbax(path: str, model, trainer) -> None:
    import os

    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             item=_orbax_payload(model, trainer))
    model.params = _to_device(restored["params"])
    if "rng" in restored:
        model.rng = jnp.asarray(restored["rng"])
    if trainer is not None and "opt_state" in restored:
        trainer.opt_state = _to_device(restored["opt_state"])
        trainer.rng = jnp.asarray(restored["trainer_rng"])
        trainer.current_epoch = int(restored["current_epoch"])
