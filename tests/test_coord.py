"""Coordinate-grid semantics parity tests (vs the reference's documented
conventions in pyroved/utils/coord.py)."""
import numpy as np
import pytest

from pyroved_tpu.utils import (generate_grid, generate_latent_grid,
                               generate_latent_grid_traversal,
                               transform_coordinates)


def test_generate_grid_1d_descending():
    g = np.asarray(generate_grid((5,)))
    assert g.shape == (5, 1)
    np.testing.assert_allclose(g[:, 0], np.linspace(1, -1, 5), rtol=1e-6)


def test_generate_grid_2d_sign_conventions():
    g = np.asarray(generate_grid((3, 4)))
    assert g.shape == (12, 2)
    # xx ascends -1..1 (slow axis), yy descends 1..-1 (fast axis)
    np.testing.assert_allclose(g[:4, 0], -1.0, atol=1e-6)
    np.testing.assert_allclose(g[-4:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(g[:4, 1], np.linspace(1, -1, 4), atol=1e-6)


def test_generate_grid_3d_raises():
    with pytest.raises(NotImplementedError):
        generate_grid((2, 2, 2))


def test_transform_1d_translation_only():
    g = np.asarray(generate_grid((7,)))[None]  # [1, 7, 1]
    out = np.asarray(transform_coordinates(g, 0.5, 0.25, 2.0))
    np.testing.assert_allclose(out, g + 0.25, rtol=1e-6)


def test_transform_2d_rotation_matches_manual():
    g = np.asarray(generate_grid((4, 4)))[None]  # [1, 16, 2]
    phi = np.array([0.3], np.float32)
    out = np.asarray(transform_coordinates(g, phi, 0.0, 1.0))
    c, s = np.cos(0.3), np.sin(0.3)
    rot = np.array([[c, s], [-s, c]], np.float32)  # reference row order
    np.testing.assert_allclose(out[0], g[0] @ rot, atol=1e-5)


def test_transform_2d_scale_translate():
    g = np.asarray(generate_grid((4, 4)))[None]
    out = np.asarray(transform_coordinates(
        g, np.zeros(1, np.float32), np.full((1, 1, 2), 0.1, np.float32),
        np.array([1.5], np.float32)))
    np.testing.assert_allclose(out[0], g[0] * 1.5 + 0.1, atol=1e-5)


def test_transform_batched_per_sample_angles():
    g = np.broadcast_to(np.asarray(generate_grid((4, 4))), (3, 16, 2))
    phi = np.array([0.0, 0.5, -0.5], np.float32)
    out = np.asarray(transform_coordinates(g, phi, 0.0, 1.0))
    np.testing.assert_allclose(out[0], g[0], atol=1e-6)
    assert not np.allclose(out[1], g[1])
    # opposite angles give mirrored transforms
    c, s = np.cos(0.5), np.sin(0.5)
    np.testing.assert_allclose(
        out[1], g[1] @ np.array([[c, s], [-s, c]], np.float32), atol=1e-5)


def test_generate_latent_grid_default_bounds():
    z, (gx, gy) = generate_latent_grid(5)
    z = np.asarray(z)
    assert z.shape == (25, 2)
    np.testing.assert_allclose(np.asarray(gx)[0], _norm_ppf(0.95), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy)[0], _norm_ppf(0.05), atol=1e-4)
    # row-major: first d entries share gx[0]
    np.testing.assert_allclose(z[:5, 0], np.asarray(gx)[0], atol=1e-5)
    np.testing.assert_allclose(z[:5, 1], np.asarray(gy), atol=1e-5)


def test_generate_latent_grid_custom_bounds():
    z, (gx, gy) = generate_latent_grid(3, z_coord=[3.0, -3.0, -2.0, 2.0])
    np.testing.assert_allclose(np.asarray(gx), np.linspace(-3, 3, 3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy), np.linspace(-2, 2, 3), atol=1e-6)


def test_latent_grid_traversal_shapes():
    cont, disc = generate_latent_grid_traversal(6, 2, 3, 0, 0.0, 36)
    assert np.asarray(cont).shape == (36, 2)
    assert np.asarray(disc).shape == (36, 3)
    # discrete codes tile one-hot classes
    assert np.asarray(disc).sum() == 36


def _norm_ppf(q):
    from statistics import NormalDist
    return NormalDist().inv_cdf(q)
