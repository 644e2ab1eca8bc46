"""Model export for production serving.

The reference has no serving story (notebook-driven, SURVEY.md section 2.5);
this module packages a trained model's inference functions as serialized
StableHLO artifacts via ``jax.export`` — loadable in any JAX process (or any
StableHLO-consuming runtime) without the pyroved_tpu source tree, with the
trained parameters baked in as constants.

Note: exported artifacts are lowered for the platform they were exported on
(TPU exports serve on TPU, CPU exports on CPU) — export on the platform you
will serve from.
"""
import pickle
from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jexport


def _exported(fn, *example_args):
    specs = [jax.ShapeDtypeStruct(a.shape, a.dtype) for a in example_args]
    return jexport.export(jax.jit(fn))(*specs)


def export_model(model, path: str, batch_size: int = 256) -> None:
    """Serialize the model's encoder (and decoder, when its latent interface
    is self-contained) for serving at a fixed batch size.

    Writes a pickle containing named serialized StableHLO functions with the
    trained parameters closed over as constants:

    * ``encode``: ``[batch, *data_dim] -> (z_loc, z_scale)`` (plus class
      probabilities for jiVAE-style encoders).
    * ``decode`` (models with a content-latent decode path): content latents
      (with any conditional vector already concatenated) -> decoded signal.
    """
    params = model.params
    flat = 1
    for d in model.data_dim:
        flat *= d

    arts = {}

    def enc(x):
        return model.encoder_net.apply({"params": params["encoder_z"]},
                                       x.reshape(batch_size, -1))

    x_spec = jnp.zeros((batch_size,) + tuple(model.data_dim), jnp.float32)
    arts["encode"] = _exported(enc, x_spec).serialize()

    if getattr(model, "coord", 0) == 0 and hasattr(model, "latent_dim"):
        zdim = model.latent_dim + getattr(model, "c_dim", 0) \
            + getattr(model, "num_classes", 0) + getattr(model, "reg_dim", 0) \
            + getattr(model, "discrete_dim", 0)

        def dec(z):
            return model.decoder_net.apply({"params": params["decoder"]}, z)

        arts["decode"] = _exported(
            dec, jnp.zeros((batch_size, zdim), jnp.float32)).serialize()
    elif getattr(model, "coord", 0) > 0:
        zdim = model.latent_dim + getattr(model, "c_dim", 0) \
            + getattr(model, "num_classes", 0) + getattr(model, "reg_dim", 0) \
            + getattr(model, "discrete_dim", 0)
        grid = model.grid

        def dec(z):
            coords = jnp.broadcast_to(grid, (z.shape[0],) + grid.shape)
            return model.decoder_net.apply({"params": params["decoder"]},
                                           coords, z)

        arts["decode"] = _exported(
            dec, jnp.zeros((batch_size, zdim), jnp.float32)).serialize()

    payload = {"batch_size": batch_size, "data_dim": tuple(model.data_dim),
               "functions": arts}
    with open(path, "wb") as f:
        pickle.dump(payload, f)


class ServedModel:
    """Loads an :func:`export_model` artifact and serves its functions.
    Inputs are padded/truncated to the exported batch size."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.batch_size = payload["batch_size"]
        self.data_dim = payload["data_dim"]
        self._fns = {name: jexport.deserialize(data)
                     for name, data in payload["functions"].items()}

    def _run_batched(self, name: str, x):
        fn = self._fns[name]
        n = x.shape[0]
        outs = []
        for start in range(0, n, self.batch_size):
            chunk = x[start:start + self.batch_size]
            pad = self.batch_size - chunk.shape[0]
            if pad:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            res = fn.call(chunk)
            res = res if isinstance(res, tuple) else (res,)
            outs.append(tuple(r[: self.batch_size - pad] if pad else r
                              for r in res))
        joined = tuple(jnp.concatenate([o[i] for o in outs])
                       for i in range(len(outs[0])))
        return joined if len(joined) > 1 else joined[0]

    def encode(self, x):
        return self._run_batched("encode", jnp.asarray(x, jnp.float32))

    def decode(self, z):
        return self._run_batched("decode", jnp.asarray(z, jnp.float32))
