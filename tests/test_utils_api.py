"""Direct coverage of utility API symbols that models only hit indirectly.

Behavioral parity targets are the reference's ``pyroved/utils/nn.py`` and
``pyroved/utils/coord.py`` helpers.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyroved_tpu.infer import dists, elbo
from pyroved_tpu.utils import coord, nn as unn


def test_get_activation_registry():
    x = jnp.asarray([-1.0, 0.0, 2.0])
    assert unn.get_activation(None) is None
    np.testing.assert_allclose(unn.get_activation("relu")(x), [0.0, 0.0, 2.0])
    # TPU evaluates tanh in hardware (slightly different rounding than
    # numpy's libm); the registry contract is "IS tanh", not bit-equality
    import jax
    tanh_tol = 5e-5 if jax.devices()[0].platform == "tpu" else 1e-7
    np.testing.assert_allclose(unn.get_activation("tanh")(x), np.tanh(x),
                               rtol=tanh_tol, atol=tanh_tol)
    # lrelu uses the reference's default 0.01 slope
    np.testing.assert_allclose(unn.get_activation("lrelu")(x)[0], -0.01,
                               rtol=1e-6)
    with pytest.raises(KeyError):
        unn.get_activation("swish")


def test_to_onehot_and_range_check():
    oh = unn.to_onehot(np.array([0, 2, 1]), 3)
    np.testing.assert_allclose(oh, np.eye(3)[[0, 2, 1]])
    with pytest.raises(AssertionError):
        unn.to_onehot(np.array([0, 3]), 3)
    with pytest.raises(AssertionError):
        unn.to_onehot(np.array([-1, 0]), 3)


def test_to_onehot_jittable_and_empty():
    # traced input: validation is skipped and the op stays jittable
    out = jax.jit(lambda i: unn.to_onehot(i, 4))(jnp.asarray([1, 3]))
    np.testing.assert_allclose(out, np.eye(4)[[1, 3]])
    # empty input: no crash, empty one-hot back
    assert unn.to_onehot(np.array([], np.int32), 3).shape == (0, 3)


def test_set_deterministic_mode_reproducible():
    k1, k2 = unn.set_deterministic_mode(42), unn.set_deterministic_mode(42)
    a = jax.random.normal(k1, (4,))
    b = jax.random.normal(k2, (4,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_as_numpy_coercions():
    import torch
    t = torch.arange(3, dtype=torch.float32)
    j = jnp.arange(3, dtype=jnp.float32)
    for x in (t, j, [0.0, 1.0, 2.0]):
        out = unn.as_numpy(x)
        assert isinstance(out, np.ndarray)
        np.testing.assert_allclose(out, [0.0, 1.0, 2.0])


def test_concat_features_and_concat_module():
    a = jnp.ones((5, 3))
    b = jnp.ones((1, 2))  # broadcasts over the batch
    out = unn.concat_features([a, b])
    assert out.shape == (5, 5)
    # single array passes through
    assert unn.concat_features(a) is a
    # >=4-D inputs are flattened to 2-D first (reference Concat semantics)
    img = jnp.ones((5, 2, 2, 1))
    out = unn.concat_features([img, a])
    assert out.shape == (5, 7)
    assert unn.Concat()( [a, b]).shape == (5, 5)


def test_grid2xy_imcoordgrid_corners():
    g = coord.imcoordgrid((3, 3))
    assert g.shape == (9, 2)
    # first point: xx=-1 (left), yy=1 (top); last point: xx=1, yy=-1
    np.testing.assert_allclose(g[0], [-1.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(g[-1], [1.0, -1.0], atol=1e-7)
    x0, x1 = jnp.meshgrid(jnp.arange(2.0), jnp.arange(2.0), indexing="ij")
    assert coord.grid2xy(x0, x1).shape == (4, 2)


def test_rotate_and_scale_coordinates():
    pts = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])  # [1, 2, 2]
    # row-vector convention coord @ [[c, s], [-s, c]]: (1,0) -> (cos, sin)
    rot = coord.rotate_coordinates(pts, jnp.asarray([math.pi / 2]))
    np.testing.assert_allclose(np.asarray(rot[0, 0]), [0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rot[0, 1]), [-1.0, 0.0], atol=1e-6)
    sc = coord.scale_coordinates(pts, jnp.asarray([2.0]))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(pts) * 2.0)


def test_std_normal_log_prob_closed_form():
    x = jnp.asarray([0.0, 1.5, -2.0])
    expect = -0.5 * np.asarray(x) ** 2 - 0.5 * math.log(2 * math.pi)
    np.testing.assert_allclose(dists.std_normal_log_prob(x), expect, atol=1e-6)


def test_one_hot_categorical_sample_valid():
    probs = jnp.asarray([[0.0, 1.0, 0.0]] * 4)
    s = dists.one_hot_categorical_sample(jax.random.PRNGKey(0), probs)
    np.testing.assert_allclose(np.asarray(s), np.eye(3)[[1, 1, 1, 1]])


def test_normal_latent_site_analytic_and_beta():
    rng = jax.random.PRNGKey(0)
    loc = jnp.zeros((2, 3)) + 0.5
    scale = jnp.ones((2, 3)) * 0.7
    z, e1 = elbo.normal_latent_site(rng, loc, scale, beta=1.0, kl="analytic")
    assert z.shape == (2, 3)
    kl = np.sum(np.asarray(dists.normal_kl(loc, scale)), -1)
    np.testing.assert_allclose(np.asarray(e1), -kl, atol=1e-6)
    _, e2 = elbo.normal_latent_site(rng, loc, scale, beta=2.0, kl="analytic")
    np.testing.assert_allclose(np.asarray(e2), 2 * np.asarray(e1), atol=1e-6)
    # mc estimator: same sample (same rng), finite, right shape
    _, emc = elbo.normal_latent_site(rng, loc, scale, kl="mc")
    assert emc.shape == (2,) and bool(jnp.all(jnp.isfinite(emc)))


def test_obs_site_bernoulli_sum_over_event():
    om = dists.get_sampler("bernoulli")
    x = jnp.asarray([[1.0, 0.0]])
    loc = jnp.asarray([[0.8, 0.3]])
    expect = math.log(0.8) + math.log(0.7)
    import jax
    tol = 1e-4 if jax.devices()[0].platform == "tpu" else 1e-5
    np.testing.assert_allclose(float(elbo.obs_site(om, x, loc)[0]), expect,
                               rtol=tol)


def test_gp_params_structure():
    from pyroved_tpu.utils.gp import GPParams
    p = GPParams(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    assert p.log_variance.shape == ()


def test_enable_compilation_cache(tmp_path):
    from pyroved_tpu.utils.profiling import enable_compilation_cache
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_native_get_lib_contract():
    from pyroved_tpu import native
    lib = native.get_lib()
    assert lib is None or hasattr(lib, "pvt_shuffle_indices")
