"""int8-quantized serving exports (``export_model(quantize="int8")``).

Weight-only per-output-channel symmetric quantization: the artifact bakes
int8 kernel constants (~4x smaller file), serve-time compute stays f32, so
the only error source is weight rounding (~0.4% of each channel's absmax).
The reference has no serving/quantization story (SURVEY.md section 2.5).
"""
import numpy as np
import pytest

import jax

from pyroved_tpu.models import iVAE, ssiVAE
from pyroved_tpu.serving import (ServedModel, dequantize_params,
                                 export_model, quantize_params)


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-12)


def test_quantize_roundtrip_error_bound():
    model = iVAE((8, 8), latent_dim=2, invariances=["r"])
    q = quantize_params(model.params)
    dq = dequantize_params(q)
    for orig, rec in zip(jax.tree_util.tree_leaves(model.params),
                         jax.tree_util.tree_leaves(dq)):
        orig, rec = np.asarray(orig), np.asarray(rec)
        if orig.ndim < 2:
            assert np.array_equal(orig, rec)  # biases pass through
        else:
            # symmetric int8: per-channel error <= absmax/254 per weight
            absmax = np.abs(orig).max(axis=tuple(range(orig.ndim - 1)),
                                      keepdims=True)
            assert np.all(np.abs(orig - rec) <= absmax / 254.0 + 1e-9)


def test_quantized_leaves_are_int8():
    model = iVAE((8, 8), latent_dim=2)
    q = quantize_params(model.params)

    def leaves(t):
        if isinstance(t, dict) and set(t) == {"qint8", "qscale"}:
            yield t
        elif isinstance(t, dict):
            for v in t.values():
                yield from leaves(v)

    qs = list(leaves(q))
    assert qs, "no kernels were quantized"
    for leaf in qs:
        assert leaf["qint8"].dtype == np.int8
        assert leaf["qscale"].dtype == np.float32


def test_quantized_export_smaller_and_close(tmp_path):
    model = iVAE((8, 8), latent_dim=2, invariances=["r"])
    p32 = str(tmp_path / "f32.pvtx")
    p8 = str(tmp_path / "int8.pvtx")
    export_model(model, p32, batch_size=8)
    export_model(model, p8, batch_size=8, quantize="int8")

    import os
    size32, size8 = os.path.getsize(p32), os.path.getsize(p8)
    assert size8 < 0.5 * size32, (size8, size32)

    served = ServedModel(p8)
    assert served.quantize == "int8"
    x = np.random.default_rng(0).uniform(0, 1, (8, 8, 8)).astype(np.float32)
    z8, s8 = served.encode(x)
    z32, s32 = ServedModel(p32).encode(x)
    assert _rel(z8, z32) < 0.05  # weight-rounding only
    # decode path too (posed decoder with the quantized sDecoder weights)
    z = np.zeros((4, 2), np.float32)
    d8 = served.decode(z)
    d32 = ServedModel(p32).decode(z)
    assert _rel(d8, d32) < 0.05


def test_quantized_export_semisupervised_classify_agrees(tmp_path):
    model = ssiVAE((8, 8), latent_dim=2, num_classes=3, invariances=["r"])
    p32 = str(tmp_path / "f32.pvtx")
    p8 = str(tmp_path / "int8.pvtx")
    export_model(model, p32, batch_size=8)
    export_model(model, p8, batch_size=8, quantize="int8")
    x = np.random.default_rng(1).uniform(0, 1, (16, 8, 8)).astype(np.float32)
    c8 = np.argmax(np.asarray(ServedModel(p8).classify(x)), -1)
    c32 = np.argmax(np.asarray(ServedModel(p32).classify(x)), -1)
    # argmax decisions should essentially never flip from weight rounding
    assert (c8 == c32).mean() >= 0.9


def test_quantize_rejects_unknown_mode(tmp_path):
    model = iVAE((8, 8), latent_dim=2)
    with pytest.raises(ValueError, match="quantize"):
        export_model(model, str(tmp_path / "x.pvtx"), batch_size=4,
                     quantize="int4")


def test_quantized_symbolic_batch_export(tmp_path):
    model = iVAE((8, 8), latent_dim=2, invariances=["r"])
    path = str(tmp_path / "sym.pvtx")
    export_model(model, path, quantize="int8")  # symbolic batch
    served = ServedModel(path)
    x = np.random.default_rng(2).uniform(0, 1, (5, 8, 8)).astype(np.float32)
    z, _ = served.encode(x)
    assert z.shape == (5, 3)
    zref, _ = model.encode(x)
    assert _rel(z, zref) < 0.05
