"""Numerical parity with torch replicas of the reference networks.

Copies flax parameters into torch modules built exactly like the reference's
(``pyroved/nets/fc.py``, ``nets/conv.py``) and compares forward outputs.
This catches kernel-transposition, activation, and layout mistakes that
shape tests cannot.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax

# TPU evaluates tanh in hardware (~2.4e-5 off torch's libm per layer);
# the parity contract is math-level, so tolerances widen there.
_ON_TPU_HW = jax.devices()[0].platform == "tpu"
_ATOL = 1e-4 if _ON_TPU_HW else 1e-5
_ATOL4 = 5e-4 if _ON_TPU_HW else 1e-4
import jax.numpy as jnp

from pyroved_tpu.nets import convEncoderNet, fcEncoderNet, sDecoderNet

KEY = jax.random.PRNGKey(0)


def _t(x):
    return torch.tensor(np.asarray(x))


def _copy_dense(tl: tnn.Linear, params):
    with torch.no_grad():
        tl.weight.copy_(_t(params["kernel"]).T)
        if "bias" in params:
            tl.bias.copy_(_t(params["bias"]))


def test_fc_encoder_matches_torch():
    enc = fcEncoderNet((8, 8), latent_dim=3)
    x = np.random.default_rng(0).normal(size=(5, 64)).astype(np.float32)
    variables = enc.init(KEY, jnp.asarray(x))
    p = variables["params"]

    l1, l2 = tnn.Linear(64, 128), tnn.Linear(128, 128)
    mu_l, sig_l = tnn.Linear(128, 3), tnn.Linear(128, 3)
    _copy_dense(l1, p["MLP_0"]["Dense_0"])
    _copy_dense(l2, p["MLP_0"]["Dense_1"])
    _copy_dense(mu_l, p["fc11"])
    _copy_dense(sig_l, p["fc12"])
    with torch.no_grad():
        h = torch.tanh(l2(torch.tanh(l1(_t(x)))))
        mu_ref = mu_l(h).numpy()
        sig_ref = tnn.functional.softplus(sig_l(h)).numpy()

    mu, sig = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=_ATOL)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, atol=_ATOL)


def test_sdecoder_matches_torch_coord_latent():
    """Our broadcast formulation vs the reference's flatten-to-[B*N] loop
    (nets/fc.py:226-237)."""
    dec = sDecoderNet((8, 8))
    rng = np.random.default_rng(1)
    coords = rng.normal(size=(4, 64, 2)).astype(np.float32)
    z = rng.normal(size=(4, 2)).astype(np.float32)
    variables = dec.init(KEY, jnp.asarray(coords), jnp.asarray(z))
    p = variables["params"]

    fc_coord = tnn.Linear(2, 128)
    fc_latent = tnn.Linear(2, 128, bias=False)
    l1, l2 = tnn.Linear(128, 128), tnn.Linear(128, 128)
    out_l = tnn.Linear(128, 1)
    _copy_dense(fc_coord, p["fc_coord"])
    _copy_dense(fc_latent, p["fc_latent"])
    _copy_dense(l1, p["MLP_0"]["Dense_0"])
    _copy_dense(l2, p["MLP_0"]["Dense_1"])
    _copy_dense(out_l, p["out"])
    with torch.no_grad():
        b, n = 4, 64
        hx = fc_coord(_t(coords).reshape(b * n, 2)).reshape(b, n, 128)
        hz = fc_latent(_t(z))
        h = torch.tanh(hx + hz.unsqueeze(1)).reshape(b * n, 128)
        h = torch.tanh(l2(torch.tanh(l1(h))))
        ref = torch.sigmoid(out_l(h)).reshape(b, n).numpy()

    ours = dec.apply(variables, jnp.asarray(coords), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=_ATOL)


def test_conv_encoder_matches_torch():
    """NHWC flax conv tower vs the reference's NCHW torch tower, with kernel
    layout translation (kh,kw,ci,co) -> (co,ci,kh,kw) and flatten-order
    permutation for the dense head."""
    enc = convEncoderNet((16, 16), latent_dim=2, hidden_dim=((4,), (8,)),
                         activation="lrelu")
    rng = np.random.default_rng(2)
    x = rng.normal(size=(3, 16, 16, 1)).astype(np.float32)
    variables = enc.init(KEY, jnp.asarray(x))
    p = variables["params"]["FeatureExtractor_0"]

    c1 = tnn.Conv2d(1, 4, 3, 1, 1)
    c2 = tnn.Conv2d(4, 8, 3, 1, 1)
    with torch.no_grad():
        c1.weight.copy_(_t(p["Conv_0"]["kernel"]).permute(3, 2, 0, 1))
        c1.bias.copy_(_t(p["Conv_0"]["bias"]))
        c2.weight.copy_(_t(p["Conv_1"]["kernel"]).permute(3, 2, 0, 1))
        c2.bias.copy_(_t(p["Conv_1"]["bias"]))
        h = tnn.functional.leaky_relu(c1(_t(x).permute(0, 3, 1, 2)), 0.01)
        h = tnn.functional.max_pool2d(h, 2, 2)
        h = tnn.functional.leaky_relu(c2(h), 0.01)       # [3, 8, 8, 8] NCHW
        feats_torch = h.permute(0, 2, 3, 1).reshape(3, -1)  # back to NHWC order

    dense = variables["params"]["features2latent"]
    enc_out = feats_torch.numpy() @ np.asarray(dense["kernel"]) + np.asarray(dense["bias"])
    mu_ref, sig_raw = np.split(enc_out, 2, axis=-1)
    sig_ref = np.log1p(np.exp(sig_raw))

    mu, sig = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=_ATOL4)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, atol=_ATOL4)


def test_jfc_encoder_matches_torch():
    from pyroved_tpu.nets import jfcEncoderNet
    enc = jfcEncoderNet((8, 8), latent_dim=2, discrete_dim=4)
    x = np.random.default_rng(3).normal(size=(5, 64)).astype(np.float32)
    variables = enc.init(KEY, jnp.asarray(x))
    p = variables["params"]
    l1, l2 = tnn.Linear(64, 128), tnn.Linear(128, 128)
    mu_l, sig_l, cls_l = tnn.Linear(128, 2), tnn.Linear(128, 2), tnn.Linear(128, 4)
    for tl, pp in ((l1, p["MLP_0"]["Dense_0"]), (l2, p["MLP_0"]["Dense_1"]),
                   (mu_l, p["fc11"]), (sig_l, p["fc12"]), (cls_l, p["fc13"])):
        _copy_dense(tl, pp)
    with torch.no_grad():
        h = torch.tanh(l2(torch.tanh(l1(_t(x)))))
        mu_ref = mu_l(h).numpy()
        sig_ref = tnn.functional.softplus(sig_l(h)).numpy()
        alpha_ref = torch.softmax(cls_l(h), dim=-1).numpy()
    mu, sig, alpha = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=_ATOL)
    np.testing.assert_allclose(np.asarray(sig), sig_ref, atol=_ATOL)
    np.testing.assert_allclose(np.asarray(alpha), alpha_ref, atol=_ATOL)


def test_classifier_regressor_match_torch():
    from pyroved_tpu.nets import fcClassifierNet, fcRegressorNet
    x = np.random.default_rng(4).normal(size=(5, 64)).astype(np.float32)

    cls = fcClassifierNet((8, 8), num_classes=3)
    v = cls.init(KEY, jnp.asarray(x))
    l1, l2, out = tnn.Linear(64, 128), tnn.Linear(128, 128), tnn.Linear(128, 3)
    for tl, pp in ((l1, v["params"]["MLP_0"]["Dense_0"]),
                   (l2, v["params"]["MLP_0"]["Dense_1"]),
                   (out, v["params"]["out"])):
        _copy_dense(tl, pp)
    with torch.no_grad():
        ref = torch.softmax(out(torch.tanh(l2(torch.tanh(l1(_t(x)))))), -1).numpy()
    np.testing.assert_allclose(np.asarray(cls.apply(v, jnp.asarray(x))), ref,
                               atol=_ATOL)

    reg = fcRegressorNet((8, 8), c_dim=2)
    v = reg.init(KEY, jnp.asarray(x))
    for tl, pp in ((l1, v["params"]["MLP_0"]["Dense_0"]),
                   (l2, v["params"]["MLP_0"]["Dense_1"])):
        _copy_dense(tl, pp)
    out2 = tnn.Linear(128, 2)
    _copy_dense(out2, v["params"]["out"])
    with torch.no_grad():
        ref = out2(torch.tanh(l2(torch.tanh(l1(_t(x)))))).numpy()
    np.testing.assert_allclose(np.asarray(reg.apply(v, jnp.asarray(x))), ref,
                               atol=_ATOL)


def test_gelu_matches_torch_exact():
    """The registry's gelu is torch ``nn.GELU``'s exact-erf default — the
    flavor the reference wires in (reference ``utils/nn.py:123``) — not
    jax.nn.gelu's tanh approximation (~1e-3 off)."""
    enc = fcEncoderNet((8, 8), latent_dim=3, activation="gelu")
    x = np.random.default_rng(3).normal(size=(5, 64)).astype(np.float32)
    variables = enc.init(KEY, jnp.asarray(x))
    p = variables["params"]

    l1, l2 = tnn.Linear(64, 128), tnn.Linear(128, 128)
    mu_l, sig_l = tnn.Linear(128, 3), tnn.Linear(128, 3)
    _copy_dense(l1, p["MLP_0"]["Dense_0"])
    _copy_dense(l2, p["MLP_0"]["Dense_1"])
    _copy_dense(mu_l, p["fc11"])
    _copy_dense(sig_l, p["fc12"])
    act = tnn.GELU()  # torch default: exact erf
    with torch.no_grad():
        h = act(l2(act(l1(_t(x)))))
        mu_ref = mu_l(h).numpy()

    mu, _ = enc.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=_ATOL)
