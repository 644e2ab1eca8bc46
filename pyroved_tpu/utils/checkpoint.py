"""Full-training-state checkpointing.

The reference persists only network ``state_dict`` weights
(``pyroved/models/base.py:183-192``), so resuming mid-training loses the
optimizer moments and RNG state. Here a checkpoint captures params +
optimizer state(s) + PRNG + epoch + loss history, so training resumes
exactly — including onto a live device mesh: parameter shardings
(PartitionSpecs) are recorded at save time and re-applied on restore.

Backends:
  * ``'msgpack'`` (default) — one pickle-free file: the payload pytree is
    flax-msgpack-serialized inside an ``np.savez`` archive, so loading an
    untrusted checkpoint cannot execute code.
  * ``'orbax'`` — an orbax-checkpoint directory (atomic, async-capable,
    multi-host aware).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec


def _prefetch_to_host(tree):
    """Issue non-blocking device→host copies for every leaf, so the
    per-leaf transfers overlap instead of paying one link round-trip
    each (measured on a tunneled v5e: 52-leaf training state 1674 ms
    fetched serially vs ~1 ms with the copies in flight together)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()


def _to_host(tree):
    # device_get on the WHOLE tree (not mapped per leaf — that would
    # serialize the transfers) so jax's own async sweep applies too
    return jax.tree_util.tree_map(np.asarray, jax.device_get(tree))


def _to_device(tree):
    # device_put on the WHOLE tree batches the H2D transfers (the same
    # per-leaf round-trip trap as _to_host, in the other direction)
    return jax.device_put(tree)


def _param_specs(params):
    """JSON-encodable list of per-leaf PartitionSpecs (None = replicated /
    unsharded), in tree_leaves order. A dim entry may itself be a TUPLE of
    axis names (a dim sharded over several mesh axes) — encoded as a JSON
    list-of-lists, while a single axis name stays a plain string."""
    specs = []
    for leaf in jax.tree_util.tree_leaves(params):
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        if spec is None or all(s is None for s in spec):
            specs.append(None)
        else:
            specs.append([
                [str(a) for a in s] if isinstance(s, tuple)
                else (None if s is None else str(s))
                for s in spec])
    return specs


def _apply_specs(params, specs, mesh):
    """Re-apply saved PartitionSpecs onto a live mesh (leaves with a None
    spec are replicated)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    placed = []
    for leaf, spec in zip(leaves, specs):
        if spec is None:
            p = PartitionSpec()
        else:
            p = PartitionSpec(*[tuple(s) if isinstance(s, list) else s
                                for s in spec])
        placed.append(jax.device_put(leaf, NamedSharding(mesh, p)))
    return jax.tree_util.tree_unflatten(treedef, placed)


def _history_to_json(hist) -> str:
    # JSON, not arrays: histories may be empty lists (orbax rejects
    # zero-size arrays) and are small host-side floats anyway
    return json.dumps({k: [float(x) for x in v] for k, v in hist.items()})


def _build_payload(model, trainer):
    # one up-front async sweep over the WHOLE state (params + optimizer
    # moments + RNGs) so every leaf transfer is already in flight before
    # the first blocking fetch below
    _prefetch_to_host((model.params, model.rng,
                       getattr(trainer, "opt_state", None),
                       getattr(trainer, "rng", None),
                       getattr(trainer, "aux_opt_state", None)))
    payload = {"params": _to_host(model.params)}
    if model.rng is not None:
        payload["rng"] = np.asarray(jax.device_get(model.rng))
    payload["param_specs"] = json.dumps(_param_specs(model.params))
    if trainer is not None:
        payload["opt_state"] = _to_host(trainer.opt_state)
        payload["current_epoch"] = int(trainer.current_epoch)
        hist = getattr(trainer, "loss_history", None)
        payload["history_kind"] = "loss_history" if hist is not None else "history"
        payload["loss_history"] = _history_to_json(
            hist if hist is not None else trainer.history)
        payload["trainer_rng"] = np.asarray(jax.device_get(trainer.rng))
        if hasattr(trainer, "aux_opt_state"):
            payload["aux_opt_state"] = _to_host(trainer.aux_opt_state)
    return payload


def _remap_state(target, restored):
    """Rebuild a (possibly tuple/NamedTuple-structured) optimizer state from
    its serialized form: key-matched via flax state dicts when possible,
    else positionally onto the target's tree structure (orbax restores
    tuples as lists)."""
    import flax.serialization as fs
    try:
        return fs.from_state_dict(target, restored)
    except Exception:
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(target),
            jax.tree_util.tree_leaves(restored))


def _restore_into(restored, model, trainer, mesh):
    specs = json.loads(restored.get("param_specs", "null")) \
        if "param_specs" in restored else None
    model.params = _to_device(restored["params"])
    if mesh is not None and specs is not None:
        model.params = _apply_specs(model.params, specs, mesh)
    if restored.get("rng") is not None:
        model.rng = jnp.asarray(restored["rng"])
    if trainer is not None and "opt_state" in restored:
        opt = _to_device(_remap_state(trainer.opt_state, restored["opt_state"]))
        if mesh is not None:
            # optimizer moments live on the mesh replicated; the first
            # compiled step re-lays them out to match the param shardings
            opt = jax.device_put(opt, NamedSharding(mesh, PartitionSpec()))
        trainer.opt_state = opt
        trainer.current_epoch = int(restored["current_epoch"])
        hist = json.loads(restored["loss_history"])
        if restored.get("history_kind", "loss_history") == "loss_history" \
                and hasattr(trainer, "loss_history"):
            trainer.loss_history = hist
        else:
            trainer.history = hist
        trainer.rng = jnp.asarray(restored["trainer_rng"])
        if hasattr(trainer, "aux_opt_state") and "aux_opt_state" in restored:
            trainer.aux_opt_state = _to_device(
                _remap_state(trainer.aux_opt_state, restored["aux_opt_state"]))


def _check_backend(backend: str) -> None:
    if backend == "pickle":
        raise ValueError(
            "The 'pickle' checkpoint backend was removed (loading pickles "
            "can execute arbitrary code). Checkpoints are now pickle-free "
            "msgpack archives (backend='msgpack', the default) or orbax "
            "directories (backend='orbax'). Old pickle checkpoints must be "
            "re-saved: load them in the revision that wrote them, then "
            "save_checkpoint() here.")
    if backend not in ("msgpack", "orbax"):
        raise ValueError(f"Unknown checkpoint backend {backend!r}; choose "
                         "'msgpack' or 'orbax'")


import threading

_pending_lock = threading.Lock()
_pending_threads: dict = {}   # abspath -> writer thread
_pending_errors: dict = {}    # abspath -> first exception


def wait_for_checkpoints(path=None) -> None:
    """Block until in-flight ``save_checkpoint(async_write=True)`` writes
    have finished (``path=None``: all of them; else just that file);
    re-raises the error from a failed write, attributed per path."""
    import os
    key = None if path is None else os.path.abspath(path)
    with _pending_lock:
        items = [(p, t) for p, t in _pending_threads.items()
                 if key is None or p == key]
    for p, t in items:
        t.join()
        with _pending_lock:
            if _pending_threads.get(p) is t:
                del _pending_threads[p]
    with _pending_lock:
        errs = ([(key, _pending_errors.pop(key))]
                if key is not None and key in _pending_errors
                else ([] if key is not None
                      else [_pending_errors.popitem()
                            for _ in range(len(_pending_errors))]))
    if errs:
        raise errs[0][1]


def _write_msgpack(path: str, payload) -> None:
    """Serialize + write ATOMICALLY (unique temp file in the target dir,
    then ``os.replace``): a crash mid-write leaves the previous checkpoint
    intact instead of a truncated archive — this file IS the
    crash-recovery artifact — and concurrent writers to the same path
    cannot publish each other's partial bytes."""
    import os
    import tempfile

    import flax.serialization
    # to_bytes dict-ifies tuples/NamedTuples (optimizer states) before
    # msgpack, which cannot encode them natively
    blob = flax.serialization.to_bytes(payload)
    fd, tmp = tempfile.mkstemp(
        prefix=os.path.basename(path) + ".", suffix=".tmp",
        dir=os.path.dirname(os.path.abspath(path)) or ".")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, payload=np.frombuffer(blob, np.uint8))
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_checkpoint(path: str, model, trainer=None,
                    backend: str = "msgpack",
                    async_write: bool = False) -> None:
    """Serialize the full training state (see module docstring).

    ``async_write=True`` (msgpack only) returns as soon as the state is
    snapshotted to host memory; serialization and the atomic file write
    happen on a background thread so training can continue — the
    segmented fused runs use this. Writes to the SAME path stay ordered
    (a new save joins that path's previous write first; independent
    trainers checkpointing to different paths do not serialize each
    other) and :func:`load_checkpoint` flushes the target path's pending
    write before reading. The writer thread is non-daemon, so a normal
    interpreter exit finishes the write.
    """
    import os
    _check_backend(backend)
    key = os.path.abspath(path)
    wait_for_checkpoints(path)  # order same-path writes; surface errors
    payload = _build_payload(model, trainer)
    if backend == "orbax":
        _save_orbax(path, payload)
        return
    if async_write:
        def _writer():
            try:
                _write_msgpack(path, payload)
            except BaseException as e:  # surfaced by wait_for_checkpoints
                with _pending_lock:
                    _pending_errors[key] = e

        t = threading.Thread(target=_writer, name="pvt-ckpt-write")
        with _pending_lock:
            _pending_threads[key] = t
        t.start()
        return
    _write_msgpack(path, payload)


def load_checkpoint(path: str, model, trainer=None, backend: str = "msgpack",
                    mesh=None) -> None:
    """Restore state saved by :func:`save_checkpoint` in place.

    Pass ``mesh=`` to restore onto a live device mesh: parameters get their
    SAVED PartitionSpecs back (tensor-parallel layouts survive the
    round-trip instead of silently coming back fully replicated).
    """
    _check_backend(backend)
    wait_for_checkpoints(path)  # don't read mid-replace by an async save
    if backend == "orbax":
        restored = _load_orbax(path)
    else:
        import flax.serialization
        with np.load(path, allow_pickle=False) as archive:
            restored = flax.serialization.msgpack_restore(
                archive["payload"].tobytes())
    _restore_into(restored, model, trainer, mesh)


# ---------------------------------------------------------------------------
# orbax backend (atomic directory checkpoints)
# ---------------------------------------------------------------------------

def _save_orbax(path: str, payload) -> None:
    import os

    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)


def _load_orbax(path: str):
    import os

    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
