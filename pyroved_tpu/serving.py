"""Model export for production serving.

The reference has no serving story (notebook-driven, SURVEY.md section 2.5);
this module packages a trained model's inference functions as serialized
StableHLO artifacts via ``jax.export`` — loadable in any JAX process (or any
StableHLO-consuming runtime) without the pyroved_tpu source tree, with the
trained parameters baked in as constants.

* Spatial models export a POSED decoder: ``decode(z, angle, shift, scale)``
  re-poses the generated signal at serve time (the reference's fixed
  angle/shift/scale generation path, ``models/base.py:145-171``).
* Semi-supervised models additionally export their ``classify`` /
  ``regress`` head.
* Pass ``platforms=["cpu", "tpu"]`` to lower once for several platforms;
  the default exports for the current platform only.
* The artifact is an ``np.savez`` archive (JSON manifest + raw StableHLO
  bytes) — no pickle, so loading an untrusted file cannot execute code.
"""
import json
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport


def _exported(fn, specs, platforms):
    specs = [a if isinstance(a, jax.ShapeDtypeStruct)
             else jax.ShapeDtypeStruct(a.shape, a.dtype) for a in specs]
    return jexport.export(jax.jit(fn), platforms=platforms)(*specs)


def quantize_params(params):
    """Per-output-channel symmetric int8 quantization of every >=2-D float
    weight in a param pytree (Dense kernels, conv HWIO kernels); 1-D leaves
    (biases, batch-norm scales) pass through in f32.

    Returns a pytree of the same structure whose quantized leaves are
    ``{"qint8": int8 array, "qscale": f32 per-last-axis scales}`` dicts —
    rebuild full-precision weights with :func:`dequantize_params`. Used by
    ``export_model(quantize="int8")``: the int8 arrays ship in the artifact
    (~4x smaller weight payload, one copy shared by every exported fn);
    dequantization is a convert+mul XLA fuses into the consuming matmul."""
    def q(leaf):
        leaf = np.asarray(leaf)
        if leaf.ndim < 2 or not np.issubdtype(leaf.dtype, np.floating):
            return leaf
        absmax = np.max(np.abs(leaf), axis=tuple(range(leaf.ndim - 1)),
                        keepdims=True)
        scale = (absmax / 127.0).astype(np.float32)
        scale = np.where(scale == 0.0, 1.0, scale)
        w = np.clip(np.rint(leaf / scale), -127, 127).astype(np.int8)
        return {"qint8": w, "qscale": scale.astype(np.float32)}

    is_q = lambda x: isinstance(x, dict) and set(x) == {"qint8", "qscale"}  # noqa: E731
    return jax.tree_util.tree_map(q, params, is_leaf=is_q)


def dequantize_params(qparams):
    """Inverse of :func:`quantize_params` (returns f32 weights)."""
    def dq(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"qint8", "qscale"}:
            return jnp.asarray(leaf["qint8"], jnp.float32) * leaf["qscale"]
        return leaf

    is_q = lambda x: isinstance(x, dict) and set(x) == {"qint8", "qscale"}  # noqa: E731
    return jax.tree_util.tree_map(dq, qparams, is_leaf=is_q)


def export_model(model, path: str,
                 batch_size: Union[int, None] = None,
                 platforms: Optional[Sequence[str]] = None,
                 quantize: Optional[str] = None) -> None:
    """Serialize the model's inference functions for serving (see module
    docstring for the exported surface).

    By default the batch dimension is exported SYMBOLIC (``jax.export``
    shape polymorphism): one artifact serves any batch size, compiling
    once per distinct concrete size at serve time (:class:`ServedModel`
    pads to power-of-two buckets to bound that to ~log2(max_batch)
    compiles). Pass an integer ``batch_size`` for a fixed-shape export —
    a single ahead-of-time shape, inputs padded/chunked to it.

    ``quantize="int8"`` stores every Dense/conv kernel per-output-channel
    symmetric int8 inside the artifact, ONE copy shared by all exported
    functions (~4x smaller weight payload; f32 exports bake weights into
    each function separately). Weights dequantize at serve time in ops XLA
    fuses into the matmuls — compute stays f32, so accuracy impact is
    weight-rounding only (measured in docs/PERFORMANCE.md)."""
    params = model.params
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
        # Quantized weights travel as CALL-TIME ARGUMENTS, not baked
        # constants: np arrays are concrete at trace time, so dequantizing
        # a closed-over copy would constant-fold back to f32 inside the
        # artifact. As arguments they stay int8 in the .npz (the size win,
        # one shared copy for every exported fn) and the dequantize
        # convert+mul is traced for XLA to fuse into the consuming matmul.
        # All leaves pack into exactly TWO flat buffers (int8 kernels;
        # f32 scales+biases) rebuilt by STATIC slices inside the traced fn
        # — per-call dispatch cost is 2 extra device args, not one per
        # parameter leaf (measured 2x serve throughput vs per-leaf args).
        is_q = lambda x: isinstance(x, dict) and set(x) == {"qint8", "qscale"}  # noqa: E731
        qleaves, qtreedef = jax.tree_util.tree_flatten(
            quantize_params(params), is_leaf=is_q)
        i8_parts, f32_parts, specs_by_leaf = [], [], []
        i8_off = f32_off = 0
        for leaf in qleaves:
            if is_q(leaf):
                w, s = np.asarray(leaf["qint8"]), np.asarray(leaf["qscale"])
                specs_by_leaf.append(("q", i8_off, w.shape, f32_off, s.shape))
                i8_parts.append(w.ravel())
                f32_parts.append(s.ravel())
                i8_off += w.size
                f32_off += s.size
            else:
                a = np.asarray(leaf)
                if not np.issubdtype(a.dtype, np.floating):
                    raise ValueError(
                        f"quantize='int8' requires float params; found a "
                        f"{a.dtype} leaf of shape {a.shape}")
                a = a.astype(np.float32)
                specs_by_leaf.append(("f", f32_off, a.shape))
                f32_parts.append(a.ravel())
                f32_off += a.size
        qweights = [
            np.concatenate(i8_parts) if i8_parts else np.zeros(0, np.int8),
            np.concatenate(f32_parts) if f32_parts else np.zeros(0, np.float32),
        ]
        _w_cell = []

        def _params():
            wi8, wf32 = _w_cell[0]
            leaves = []
            for spec in specs_by_leaf:
                if spec[0] == "q":
                    _, o, shape, so, sshape = spec
                    n = int(np.prod(shape))
                    sn = int(np.prod(sshape))
                    leaves.append(
                        wi8[o:o + n].reshape(shape).astype(jnp.float32)
                        * wf32[so:so + sn].reshape(sshape))
                else:
                    _, o, shape = spec
                    n = int(np.prod(shape))
                    leaves.append(wf32[o:o + n].reshape(shape))
            return jax.tree_util.tree_unflatten(qtreedef, leaves)
    else:
        qweights = []

        def _params():
            return params

    def _exported_fn(fn, specs):
        if quantize is None:
            return _exported(fn, specs, platforms)

        def wrapped(*args):
            _w_cell[:] = [args[len(specs):]]
            return fn(*args[:len(specs)])

        wspecs = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in qweights]
        return _exported(wrapped, list(specs) + wspecs, platforms)

    arts = {}
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    x_spec = jax.ShapeDtypeStruct((b,) + tuple(model.data_dim), jnp.float32)
    cond_dim = int(getattr(model, "c_dim", 0))

    if "encoder_y" in params:
        # Semi-supervised encoder q(z|x,y): compose the auto-classify /
        # auto-regress step in, matching model.encode's label-free call
        # (reference ``ssivae.py:282-307``).
        def enc(x):
            p = _params()
            xf = x.reshape((x.shape[0], -1))
            y = model.encoder_y_net.apply({"params": p["encoder_y"]}, xf)
            if hasattr(model, "num_classes"):
                y = jax.nn.one_hot(jnp.argmax(y, -1), model.num_classes,
                                   dtype=jnp.float32)
            return model.encoder_net.apply({"params": p["encoder_z"]},
                                           xf, y)

        arts["encode"] = _exported_fn(enc, (x_spec,)).serialize()
    elif cond_dim > 0:
        def enc(x, y):
            return model.encoder_net.apply({"params": _params()["encoder_z"]},
                                           x.reshape((x.shape[0], -1)), y)

        y_spec = jax.ShapeDtypeStruct((b, cond_dim), jnp.float32)
        arts["encode"] = _exported_fn(enc, (x_spec, y_spec)).serialize()
    else:
        def enc(x):
            return model.encoder_net.apply({"params": _params()["encoder_z"]},
                                           x.reshape((x.shape[0], -1)))

        arts["encode"] = _exported_fn(enc, (x_spec,)).serialize()

    zdim = getattr(model, "latent_dim", 0) + getattr(model, "c_dim", 0) \
        + getattr(model, "num_classes", 0) + getattr(model, "reg_dim", 0) \
        + getattr(model, "discrete_dim", 0)
    z_spec = jax.ShapeDtypeStruct((b, zdim), jnp.float32)

    if getattr(model, "coord", 0) == 0 and hasattr(model, "latent_dim"):
        def dec(z):
            return model.decoder_net.apply({"params": _params()["decoder"]}, z)

        arts["decode"] = _exported_fn(dec, (z_spec,)).serialize()
    elif getattr(model, "coord", 0) > 0:
        from .utils.coord import transform_coordinates
        grid = model.grid
        D = int(grid.shape[-1])

        def dec(z, angle, shift, scale):
            coords = transform_coordinates(grid[None], angle[None], shift,
                                           scale[None])[0]
            coords_b = jnp.broadcast_to(coords, (z.shape[0],) + coords.shape)
            return model.decoder_net.apply({"params": _params()["decoder"]},
                                           coords_b, z)

        pose = (z_spec, jnp.zeros((), jnp.float32),
                jnp.zeros((D,), jnp.float32), jnp.ones((), jnp.float32))
        arts["decode"] = _exported_fn(dec, pose).serialize()

    if "encoder_y" in params:
        def head(x):
            return model.encoder_y_net.apply({"params": _params()["encoder_y"]},
                                             x.reshape((x.shape[0], -1)))

        head_name = "classify" if hasattr(model, "num_classes") else "regress"
        arts[head_name] = _exported_fn(head, (x_spec,)).serialize()

    manifest = {"batch_size": batch_size,
                "data_dim": list(model.data_dim),
                "c_dim": cond_dim if "encoder_y" not in params else 0,
                "coord": int(getattr(model, "coord", 0)),
                "grid_dim": int(model.grid.shape[-1]) if getattr(
                    model, "coord", 0) else 0,
                "platforms": list(platforms) if platforms else None,
                "quantize": quantize,
                "n_weights": len(qweights),
                "functions": sorted(arts)}
    arrays = {f"fn_{name}": np.frombuffer(blob, np.uint8)
              for name, blob in arts.items()}
    for i, leaf in enumerate(qweights):
        arrays[f"w_{i}"] = leaf
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), np.uint8)
    with open(path, "wb") as f:
        np.savez(f, **arrays)


class ServedModel:
    """Loads an :func:`export_model` artifact and serves its functions.

    Symbolic-batch artifacts (the default export) accept any batch size;
    inputs are padded up to the next power-of-two bucket (min 8) so serve
    traffic with ragged sizes triggers at most ~log2(max_batch) compiles.
    Fixed-batch artifacts are chunked/padded to their exported size."""

    def __init__(self, path: str):
        with np.load(path, allow_pickle=False) as archive:
            manifest = json.loads(archive["manifest"].tobytes().decode("utf-8"))
            self.batch_size = manifest["batch_size"]
            self.data_dim = tuple(manifest["data_dim"])
            self.c_dim = manifest.get("c_dim", 0)
            self.coord = manifest.get("coord", 0)
            self.grid_dim = manifest.get("grid_dim", 0)
            self.platforms = manifest.get("platforms")
            self.quantize = manifest.get("quantize")
            self._fns = {name: jexport.deserialize(
                archive[f"fn_{name}"].tobytes())
                for name in manifest["functions"]}
            # Quantized exports carry the weights as TWO packed npz arrays
            # (flat int8 kernels; flat f32 scales+biases) passed as
            # trailing call args; upload once, share across every exported
            # function — 2 extra dispatch args per call regardless of
            # parameter count.
            self._weights = tuple(
                jnp.asarray(archive[f"w_{i}"])
                for i in range(manifest.get("n_weights", 0)))

    @staticmethod
    def _pad_to(chunks, size):
        pad = size - chunks[0].shape[0]
        if pad:
            chunks = [jnp.concatenate(
                [c, jnp.zeros((pad,) + c.shape[1:], c.dtype)])
                for c in chunks]
        return chunks, pad

    #: Largest power-of-two bucket a symbolic-batch artifact will compile/
    #: run in one call; larger requests are chunked at this size (bounds
    #: both the one-off compile cost and the per-call memory footprint).
    max_bucket = 1024

    def _run_batched(self, name: str, batched, extra=()):
        """Run an exported fn over ``batched`` (tuple of batch-aligned
        arrays, padded per chunk) with trailing non-batched ``extra`` args."""
        fn = self._fns[name]
        n = batched[0].shape[0]
        if self.batch_size is None:  # symbolic batch: bucketed calls
            def call_bucket(chunks, m):
                bucket = min(self.max_bucket,
                             max(8, 1 << max(m - 1, 0).bit_length()))
                chunks, _ = self._pad_to(chunks, bucket)
                res = fn.call(*chunks, *extra, *self._weights)
                res = res if isinstance(res, tuple) else (res,)
                return tuple(r[:m] for r in res)

            if n <= self.max_bucket:
                out = call_bucket(list(batched), n)
                return out if len(out) > 1 else out[0]
            outs = []
            for start in range(0, n, self.max_bucket):
                chunks = [b[start:start + self.max_bucket] for b in batched]
                outs.append(call_bucket(chunks, chunks[0].shape[0]))
            joined = tuple(jnp.concatenate([o[i] for o in outs])
                           for i in range(len(outs[0])))
            return joined if len(joined) > 1 else joined[0]
        outs = []
        for start in range(0, n, self.batch_size):
            chunks = [b[start:start + self.batch_size] for b in batched]
            chunks, pad = self._pad_to(chunks, self.batch_size)
            res = fn.call(*chunks, *extra, *self._weights)
            res = res if isinstance(res, tuple) else (res,)
            outs.append(tuple(r[: self.batch_size - pad] if pad else r
                              for r in res))
        joined = tuple(jnp.concatenate([o[i] for o in outs])
                       for i in range(len(outs[0])))
        return joined if len(joined) > 1 else joined[0]

    def encode(self, x, y=None):
        args = (jnp.asarray(x, jnp.float32),)
        if self.c_dim > 0:
            if y is None:
                raise ValueError(
                    f"This export was built for a conditional encoder; pass "
                    f"y with {self.c_dim} features")
            args = args + (jnp.asarray(y, jnp.float32).reshape(
                args[0].shape[0], self.c_dim),)
        return self._run_batched("encode", args)

    def decode(self, z, angle=0.0, shift=0.0, scale=1.0):
        """Decode latents; for spatial exports the pose arguments re-pose
        the generated signal (identity by default)."""
        z = jnp.asarray(z, jnp.float32)
        if self.coord > 0:
            extra = (jnp.asarray(angle, jnp.float32).reshape(()),
                     jnp.broadcast_to(jnp.asarray(shift, jnp.float32),
                                      (self.grid_dim,)).astype(jnp.float32),
                     jnp.asarray(scale, jnp.float32).reshape(()))
            out = self._run_batched("decode", (z,), extra)
        else:
            out = self._run_batched("decode", (z,))
        # match the model API's signal-space shape
        if int(np.prod(out.shape[1:])) == int(np.prod(self.data_dim)):
            out = out.reshape((out.shape[0],) + self.data_dim)
        return out

    def classify(self, x):
        return self._run_batched("classify", (jnp.asarray(x, jnp.float32),))

    def regress(self, x):
        return self._run_batched("regress", (jnp.asarray(x, jnp.float32),))
