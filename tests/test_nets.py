"""Shape and structure tests for fc and conv modules (mirrors the
reference's tests/test_conv.py and net-level checks)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyroved_tpu.nets import (FeatureExtractor, Upsampler, UpsampleBlock,
                              convDecoderNet, convEncoderNet, fcClassifierNet,
                              fcDecoderNet, fcEncoderNet, fcRegressorNet,
                              jfcEncoderNet, sDecoderNet)

KEY = jax.random.PRNGKey(0)


def _init_apply(mod, *args):
    variables = mod.init(KEY, *args)
    return mod.apply(variables, *args)


# ---------------- fc ----------------

@pytest.mark.parametrize("in_dim", [(8,), (8, 8), (8, 8, 2)])
def test_fc_encoder_shapes(in_dim):
    x = jnp.zeros((4,) + in_dim)
    mu, sig = _init_apply(fcEncoderNet(in_dim, latent_dim=3), x)
    assert mu.shape == (4, 3) and sig.shape == (4, 3)
    assert (np.asarray(sig) > 0).all()  # softplus head


def test_fc_encoder_conditional():
    x = jnp.zeros((4, 8, 8))
    y = jnp.zeros((4, 10))
    mu, sig = _init_apply(fcEncoderNet((8, 8), latent_dim=2, c_dim=10), x, y)
    assert mu.shape == (4, 2)


def test_fc_encoder_broadcast_leading_dims():
    # enumeration-style [K, B, D] inputs pass straight through (flat=False analog)
    x = jnp.zeros((3, 4, 64))
    mu, sig = _init_apply(fcEncoderNet((8, 8), latent_dim=2), x)
    assert mu.shape == (3, 4, 2)


def test_jfc_encoder_three_heads():
    x = jnp.zeros((4, 64))
    mu, sig, alpha = _init_apply(jfcEncoderNet((8, 8), latent_dim=2, discrete_dim=5), x)
    assert alpha.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(alpha).sum(-1), 1.0, rtol=1e-5)


def test_fc_decoder_sigmoid_range():
    z = jnp.zeros((4, 2))
    out = _init_apply(fcDecoderNet((8, 8)), z)
    assert out.shape == (4, 64)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_sdecoder_shapes_2d():
    coords = jnp.zeros((4, 64, 2))
    z = jnp.zeros((4, 2))
    out = _init_apply(sDecoderNet((8, 8)), coords, z)
    assert out.shape == (4, 64)


def test_sdecoder_shapes_1d():
    coords = jnp.zeros((4, 16, 1))
    z = jnp.zeros((4, 3))
    out = _init_apply(sDecoderNet((16,)), coords, z)
    assert out.shape == (4, 16)


def test_sdecoder_enumeration_broadcast():
    coords = jnp.zeros((5, 4, 64, 2))
    z = jnp.zeros((5, 4, 2))
    out = _init_apply(sDecoderNet((8, 8)), coords, z)
    assert out.shape == (5, 4, 64)


def test_classifier_softmax():
    x = jnp.zeros((4, 8, 8))
    out = _init_apply(fcClassifierNet((8, 8), num_classes=7), x)
    assert out.shape == (4, 7)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, rtol=1e-5)


def test_regressor_linear_out():
    x = jnp.zeros((4, 8, 8))
    out = _init_apply(fcRegressorNet((8, 8), c_dim=2), x)
    assert out.shape == (4, 2)


def test_dense_torch_init_bounds():
    from pyroved_tpu.nets.fc import Dense
    d = Dense(16)
    v = d.init(KEY, jnp.zeros((1, 64)))
    k = np.asarray(v["params"]["kernel"])
    bound = 1.0 / np.sqrt(64)
    assert (np.abs(k) <= bound).all()
    assert k.std() > bound / 4  # actually spread out, not zeros


# ---------------- conv ----------------

@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_feature_extractor_pooling(ndim):
    spatial = (16,) * ndim
    x = jnp.zeros((2,) + spatial + (1,))
    fe = FeatureExtractor(ndim, ((4,), (8,)), pool_last=False)
    out = _init_apply(fe, x)
    # one pool between the two blocks -> spatial halved once
    assert out.shape == (2,) + tuple(s // 2 for s in spatial) + (8,)


def test_feature_extractor_pool_last():
    x = jnp.zeros((2, 16, 16, 1))
    out = _init_apply(FeatureExtractor(2, ((4,), (8,)), pool_last=True), x)
    assert out.shape == (2, 4, 4, 8)


@pytest.mark.parametrize("ndim,mode", [(1, "bilinear"), (2, "bilinear"), (3, "nearest")])
def test_upsample_block_doubles(ndim, mode):
    spatial = (8,) * ndim
    x = jnp.zeros((2,) + spatial + (4,))
    out = _init_apply(UpsampleBlock(ndim, 2, mode=mode), x)
    assert out.shape == (2,) + tuple(2 * s for s in spatial) + (2,)


def test_upsampler_output_channels():
    x = jnp.zeros((2, 4, 4, 8))
    out = _init_apply(Upsampler(2, ((8,), (4,)), output_channels=3), x)
    assert out.shape == (2, 16, 16, 3)


@pytest.mark.parametrize("in_dim", [(16,), (16, 16)])
def test_conv_encoder_shapes(in_dim):
    x = jnp.zeros((2,) + in_dim + (1,))
    mu, sig = _init_apply(convEncoderNet(in_dim, latent_dim=3), x)
    assert mu.shape == (2, 3) and sig.shape == (2, 3)
    assert (np.asarray(sig) > 0).all()


@pytest.mark.parametrize("out_dim", [(16,), (16, 16)])
def test_conv_decoder_shapes(out_dim):
    z = jnp.zeros((2, 3))
    dec = convDecoderNet(out_dim, latent_dim=3, hidden_dim=((8, 8), (4,)))
    out = _init_apply(dec, z)
    assert out.shape == (2,) + out_dim + (1,)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_conv_encoder_batchnorm_variables():
    x = jnp.zeros((2, 16, 16, 1))
    enc = convEncoderNet((16, 16), latent_dim=2, batchnorm=True)
    variables = enc.init(KEY, x)
    assert "batch_stats" in variables


def test_coord_latent_standalone():
    from pyroved_tpu.nets import coord_latent
    mod = coord_latent(latent_dim=2, out_dim=16)
    coords = jnp.zeros((3, 10, 2))
    z = jnp.zeros((3, 2))
    out = _init_apply(mod, coords, z)
    assert out.shape == (3, 10, 16)


def test_dim_registries():
    from pyroved_tpu.utils import get_bnorm, get_conv, get_maxpool
    import pytest as _pytest
    conv = get_conv(2)(4)
    x = jnp.zeros((1, 8, 8, 2))
    v = conv.init(KEY, x)
    assert conv.apply(v, x).shape == (1, 8, 8, 4)
    pool = get_maxpool(1)
    assert pool(jnp.zeros((1, 8, 2))).shape == (1, 4, 2)
    assert get_bnorm(3) is not None
    with _pytest.raises(KeyError):
        get_conv(4)


def test_feature_extractor_pool_modes():
    """pool='avg'/'stride' (opt-in model changes) must downsample exactly
    like the reference maxpool tower and reject unknown modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from pyroved_tpu.nets.conv import FeatureExtractor
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 1)),
                    jnp.float32)
    shapes = {}
    for pool in ("max", "avg", "stride"):
        net = FeatureExtractor(2, ((8,), (16, 16)), pool=pool)
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        shapes[pool] = out.shape
    assert shapes["max"] == shapes["avg"] == shapes["stride"] == (2, 4, 4, 16)
    with pytest.raises(ValueError, match="pool"):
        FeatureExtractor(2, ((8,),), pool="nope").init(
            jax.random.PRNGKey(0), x)


def test_ved_pool_modes_roundtrip():
    import numpy as np
    from pyroved_tpu.models import VED
    x = np.random.default_rng(0).uniform(0, 1, (4, 16, 16)).astype(np.float32)
    for pool in ("avg", "stride"):
        m = VED((16, 16), (64,), pool=pool)
        z, s = m.encode(x)
        assert z.shape == (4, 2)
        assert m.decode(np.zeros((3, 2), np.float32)).shape == (3, 64)


def test_upsample_block_conv_first_equivalent():
    """The opt-in conv-first UpsampleBlock equals the literal
    resize-then-conv default order with the SAME parameters: a 1x1 conv
    commutes with a linear resize (bitwise for nearest, f32 reassociation
    for bilinear). Measured speed-neutral-to-slower on v5e, so literal is
    the default (docs/PERFORMANCE.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyroved_tpu.nets.conv import UpsampleBlock

    rng = np.random.default_rng(0)
    cases = [
        (2, (2, 7, 9, 5), "bilinear"),
        (2, (2, 8, 8, 3), "nearest"),
        (1, (3, 11, 4), "nearest"),
        (3, (1, 4, 5, 6, 2), "bilinear"),  # 3-D auto-downgrades to nearest
    ]
    for ndim, shape, mode in cases:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        fast = UpsampleBlock(ndim, shape[-1], mode=mode, conv_first=True)
        ref = UpsampleBlock(ndim, shape[-1], mode=mode)  # literal default
        params = fast.init(jax.random.PRNGKey(0), x)
        out_fast = fast.apply(params, x)
        out_ref = ref.apply(params, x)  # same tree: one Conv_0 either way
        assert out_fast.shape == out_ref.shape
        np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                                   atol=3e-6, err_msg=f"{ndim}D {mode}")
        # gradients agree too (both orders are the same linear map)
        g_fast = jax.grad(lambda p: jnp.sum(jnp.sin(fast.apply(p, x))))(params)
        g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_upsampler_conv_first_equivalent():
    """Upsampler's conv-first form (last block conv AND output head slid
    under the final resize) equals the literal reference order with the
    same parameter tree, forward and gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyroved_tpu.nets.conv import Upsampler

    rng = np.random.default_rng(1)
    for ndim, shape, mode in [(2, (2, 4, 4, 8), "bilinear"),
                              (2, (2, 3, 5, 8), "nearest"),
                              (1, (3, 6, 8), "nearest")]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        fast = Upsampler(ndim, output_channels=2, upsampling_mode=mode,
                         conv_first=True)
        ref = Upsampler(ndim, output_channels=2, upsampling_mode=mode)
        params = fast.init(jax.random.PRNGKey(0), x)
        p_ref = ref.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p_ref))  # same tree
        out_fast = fast.apply(params, x)
        out_ref = ref.apply(params, x)
        assert out_fast.shape == out_ref.shape
        np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                                   atol=5e-6, err_msg=f"{ndim}D {mode}")
        g_fast = jax.grad(lambda p: jnp.sum(jnp.sin(fast.apply(p, x))))(params)
        g_ref = jax.grad(lambda p: jnp.sum(jnp.sin(ref.apply(p, x))))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


def test_nearest_upsample_is_gather_free_and_bitwise():
    """Nearest x2 upsampling runs as reshape+broadcast — bitwise-equal to
    jax.image.resize(method='nearest') but without the gather resize
    lowers to (gathers are slow on TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyroved_tpu.nets.conv import _upsample

    rng = np.random.default_rng(2)
    for shape in [(2, 7, 9, 5), (3, 11, 4), (1, 4, 5, 6, 2)]:
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        target = (shape[0],) + tuple(s * 2 for s in shape[1:-1]) + (shape[-1],)
        ref = jax.image.resize(x, target, method="nearest")
        np.testing.assert_array_equal(np.asarray(_upsample(x, 2, "nearest")),
                                      np.asarray(ref))
    hlo = jax.jit(lambda v: _upsample(v, 2, "nearest")).lower(
        jnp.zeros((1, 4, 4, 2))).compile().as_text()
    # match gather OPS ('... = gather(...'), not the '+prefer-no-gather'
    # machine-feature string the compile options embed
    import re
    assert not re.search(r"\bgather\(", hlo)
    ref_hlo = jax.jit(lambda v: jax.image.resize(
        v, (1, 8, 8, 2), method="nearest")).lower(
        jnp.zeros((1, 4, 4, 2))).compile().as_text()
    assert re.search(r"\bgather\(", ref_hlo)  # the path we avoided


def test_upsampler_conv_first_bf16_tolerance():
    """Under dtype=bfloat16 + bilinear, conv-first differs from the literal
    order by ~bf16 eps (the literal order quantizes the interpolation input
    to bf16; conv-first interpolates the f32 head output) — bounded, and
    never worse than bf16 output quantization."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pyroved_tpu.nets.conv import Upsampler

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    fast = Upsampler(2, output_channels=1, dtype=jnp.bfloat16,
                     conv_first=True)
    ref = Upsampler(2, output_channels=1, dtype=jnp.bfloat16)
    params = fast.init(jax.random.PRNGKey(0), x)
    a = np.asarray(fast.apply(params, x), np.float32)
    b = np.asarray(ref.apply(params, x), np.float32)
    scale = np.maximum(np.abs(b), 1e-2)
    assert (np.abs(a - b) <= scale * 2 ** -7).all(), float(np.abs(a - b).max())
