"""iVAE structure, invariance bookkeeping, and shape round-trip tests
(mirrors reference tests/test_models.py patterns)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyroved_tpu.models import iVAE

DATA_2D = (8, 8)
DATA_1D = (16,)


@pytest.mark.parametrize("invariances,expected_coord", [
    (None, 0), (["r"], 1), (["t"], 2), (["s"], 1),
    (["r", "t"], 3), (["r", "t", "s"], 4),
])
def test_coord_counts_2d(invariances, expected_coord):
    m = iVAE(DATA_2D, latent_dim=2, invariances=invariances)
    assert m.coord == expected_coord
    assert m.z_dim == 2 + expected_coord


def test_1d_rejects_non_translation():
    with pytest.raises(ValueError):
        iVAE(DATA_1D, latent_dim=2, invariances=["r"])
    with pytest.raises(ValueError):
        iVAE(DATA_1D, latent_dim=2, invariances=["t", "s"])


@pytest.mark.parametrize("invariances", [["r"], ["t"], ["s"], ["r", "t", "s"]])
def test_split_latent_parts(invariances):
    m = iVAE(DATA_2D, latent_dim=2, invariances=invariances)
    z = jnp.arange(4 * m.z_dim, dtype=jnp.float32).reshape(4, m.z_dim)
    phi, dx, sc, zc = m.split_latent(z)
    assert zc.shape == (4, 2)
    assert phi.shape == (4,)
    assert dx.shape == (4, 2)
    assert sc.shape == (4,)
    if "r" in invariances:
        np.testing.assert_allclose(np.asarray(phi), np.asarray(z[:, 0]))
    if "s" in invariances:
        assert not np.allclose(np.asarray(sc), 1.0)


def test_split_latent_1d():
    m = iVAE(DATA_1D, latent_dim=2, invariances=["t"])
    z = jnp.ones((4, 3))
    phi, dx, sc, zc = m.split_latent(z)
    assert phi is None and sc is None
    assert dx.shape == (4, 1) and zc.shape == (4, 2)


@pytest.mark.parametrize("invariances", [None, ["r"], ["r", "t"], ["r", "t", "s"]])
def test_loss_finite_2d(invariances):
    m = iVAE(DATA_2D, latent_dim=2, invariances=invariances)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (6,) + DATA_2D), jnp.float32)
    loss = m.loss_fn(m.params, jax.random.PRNGKey(0), (x,), jnp.asarray(1.0))
    assert loss.shape == (6,)
    assert np.isfinite(np.asarray(loss)).all()


def test_loss_conditional():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], c_dim=3)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (6,) + DATA_2D), jnp.float32)
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 0, 1, 2]), 3)
    loss = m.loss_fn(m.params, jax.random.PRNGKey(0), (x, y), jnp.asarray(1.0))
    assert np.isfinite(np.asarray(loss)).all()


@pytest.mark.parametrize("sampler", ["bernoulli", "continuous_bernoulli", "gaussian"])
def test_sampler_dispatch_loss(sampler):
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], sampler_d=sampler)
    assert m.sampler_d.name == sampler
    x = jnp.asarray(np.random.default_rng(0).uniform(0.01, 0.99, (4,) + DATA_2D), jnp.float32)
    loss = m.loss_fn(m.params, jax.random.PRNGKey(0), (x,), jnp.asarray(1.0))
    assert np.isfinite(np.asarray(loss)).all()


def test_beta_scaling_changes_loss():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], kl="analytic")
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4,) + DATA_2D), jnp.float32)
    l1 = m.loss_fn(m.params, jax.random.PRNGKey(0), (x,), jnp.asarray(1.0))
    l2 = m.loss_fn(m.params, jax.random.PRNGKey(0), (x,), jnp.asarray(4.0))
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


@pytest.mark.parametrize("invariances", [None, ["r"], ["r", "t", "s"]])
def test_encode_decode_roundtrip_2d(invariances):
    m = iVAE(DATA_2D, latent_dim=2, invariances=invariances)
    x = np.random.default_rng(0).uniform(0, 1, (10,) + DATA_2D).astype(np.float32)
    z_loc, z_scale = m.encode(x)
    assert z_loc.shape == (10, m.z_dim)
    assert (np.asarray(z_scale) > 0).all()
    dec = m.decode(np.zeros((5, 2), np.float32))
    assert dec.shape == (5,) + DATA_2D


def test_encode_decode_roundtrip_1d():
    m = iVAE(DATA_1D, latent_dim=3, invariances=["t"])
    x = np.random.default_rng(0).uniform(0, 1, (7,) + DATA_1D).astype(np.float32)
    z_loc, z_scale = m.encode(x)
    assert z_loc.shape == (7, 4)
    dec = m.decode(np.zeros((3, 3), np.float32))
    assert dec.shape == (3,) + DATA_1D


def test_decode_fixed_angle():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    z = np.zeros((2, 2), np.float32)
    d0 = np.asarray(m.decode(z))
    d1 = np.asarray(m.decode(z, angle=1.0))
    assert d0.shape == d1.shape
    assert not np.allclose(d0, d1)


def test_manifold2d_shapes():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    loc = m.manifold2d(3, plot=False)
    assert loc.shape == (9,) + DATA_2D


def test_manifold2d_high_latent_dim():
    """latent_dim > 2 sweeps a selected plane (extension; the reference
    crashes for any latent_dim != 2)."""
    m = iVAE(DATA_2D, latent_dim=4, invariances=["r"])
    loc = m.manifold2d(3, plot=False)  # default plane (0, 1), rest at 0
    assert loc.shape == (9,) + DATA_2D
    loc2 = m.manifold2d(3, plot=False, which_dims=(2, 3))
    assert loc2.shape == (9,) + DATA_2D
    assert not np.allclose(np.asarray(loc), np.asarray(loc2))
    zf = np.asarray([0.0, 0.0, 1.5, -1.5], np.float32)
    loc3 = m.manifold2d(3, plot=False, z_fixed=zf)
    assert not np.allclose(np.asarray(loc), np.asarray(loc3))
    with pytest.raises(ValueError):
        m.manifold2d(3, plot=False, which_dims=(0, 9))
    with pytest.raises(ValueError):
        m.manifold2d(3, plot=False, z_fixed=np.zeros(3, np.float32))


def test_manifold2d_high_latent_dim_other_models():
    from pyroved_tpu.models import VED, jiVAE, ss_reg_iVAE, ssiVAE
    j = jiVAE(DATA_2D, latent_dim=3, discrete_dim=3, invariances=["t"])
    assert j.manifold2d(2, plot=False, which_dims=(0, 2)).shape == (4,) + DATA_2D
    s = ssiVAE(DATA_2D, latent_dim=3, num_classes=3)
    assert s.manifold2d(2, plot=False, which_dims=(1, 2)).shape == (4,) + DATA_2D
    r = ss_reg_iVAE(DATA_2D, latent_dim=3, reg_dim=1)
    assert r.manifold2d(2, np.zeros(1, np.float32),
                        plot=False).shape == (4,) + DATA_2D
    v = VED(DATA_2D, (16,), latent_dim=3)
    assert v.manifold2d(2, plot=False, which_dims=(0, 2)).shape == (4, 16)


def test_multichannel_spatial_2d():
    """channels>1 with invariances — the generalization the reference left
    as a TODO (its sDecoderNet is single-channel, nets/fc.py:186)."""
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], channels=3)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (6,) + DATA_2D + (3,)).astype(np.float32)
    loss = m.loss_fn(m.params, jax.random.PRNGKey(0), (jnp.asarray(x),),
                     jnp.asarray(1.0))
    assert loss.shape == (6,) and np.isfinite(np.asarray(loss)).all()
    z_loc, z_scale = m.encode(x)
    assert z_loc.shape == (6, 3)
    dec = m.decode(np.zeros((4, 2), np.float32))
    assert dec.shape == (4,) + DATA_2D + (3,)
    man = m.manifold2d(3, plot=False)
    assert man.shape == (9,) + DATA_2D + (3,)
    rec = m.reconstruct(x)
    assert rec.shape == x.shape
    # short training run decreases the loss
    import pyroved_tpu as pv
    loader = pv.utils.init_dataloader(x.repeat(20, axis=0), batch_size=40)
    tr = pv.trainers.SVItrainer(m)
    tr.run(loader, 4)
    lh = tr.loss_history["training_loss"]
    assert lh[-1] < lh[0] and all(np.isfinite(v) for v in lh)


def test_multichannel_fused_matches_xla(monkeypatch):
    """With the kernel forced on (interpret mode), a channels=3 model's
    loss must match the XLA decoder path exactly."""
    import types

    import pyroved_tpu.ops.spatial_decoder as sd
    monkeypatch.setattr(sd, "INTERPRET", True)
    monkeypatch.setattr(sd, "BF16_MATMUL", False)
    monkeypatch.setattr(sd, "FUSED_MIN_BNH", 0)  # tiny test shapes
    monkeypatch.setattr(sd.jax, "devices",
                        lambda: [types.SimpleNamespace(platform="tpu", device_kind="TPU v5 lite")])
    x = np.random.default_rng(0).uniform(0, 1, (4,) + DATA_2D + (3,)).astype(np.float32)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], channels=3, fused=False)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], channels=3)
    assert not m1._fused and m2._fused
    m2.params = m1.params
    l1 = m1.loss_fn(m1.params, jax.random.PRNGKey(0), (jnp.asarray(x),),
                    jnp.asarray(1.0))
    l2 = m2.loss_fn(m2.params, jax.random.PRNGKey(0), (jnp.asarray(x),),
                    jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)


@pytest.mark.parametrize("act", ["lrelu", "softplus", "gelu"])
def test_nondefault_activation_fused_matches_xla(act, monkeypatch):
    """lrelu/softplus/gelu decoder stacks (the full reference
    ``utils/nn.py:121-123`` activation menu) pass the fusion gate; the
    kernel's loss must match the XLA module path exactly (f32 interpret
    mode; gelu's in-kernel polynomial erf is within 1.5e-7 of exact)."""
    import types

    import pyroved_tpu.ops.spatial_decoder as sd
    monkeypatch.setattr(sd, "INTERPRET", True)
    monkeypatch.setattr(sd, "BF16_MATMUL", False)
    monkeypatch.setattr(sd, "FUSED_MIN_BNH", 0)  # tiny test shapes
    monkeypatch.setattr(sd.jax, "devices",
                        lambda: [types.SimpleNamespace(platform="tpu", device_kind="TPU v5 lite")])
    x = np.random.default_rng(0).uniform(0, 1, (4,) + DATA_2D).astype(np.float32)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], activation=act,
              fused=False)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], activation=act)
    assert not m1._fused and m2._fused
    m2.params = m1.params
    l1 = m1.loss_fn(m1.params, jax.random.PRNGKey(0), (jnp.asarray(x),),
                    jnp.asarray(1.0))
    l2 = m2.loss_fn(m2.params, jax.random.PRNGKey(0), (jnp.asarray(x),),
                    jnp.asarray(1.0))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
    # gradients through the custom VJP must match XLA autodiff too
    def total(model):
        return lambda p: jnp.sum(model.loss_fn(
            p, jax.random.PRNGKey(0), (jnp.asarray(x),), jnp.asarray(1.0)))
    g1 = jax.grad(total(m1))(m1.params)
    g2 = jax.grad(total(m2))(m2.params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_multichannel_set_encoder():
    from pyroved_tpu.nets.fc import fcEncoderNet
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], channels=3)
    m.set_encoder(fcEncoderNet(DATA_2D + (3,), m.z_dim, softplus_out=True))
    x = np.random.default_rng(0).uniform(0, 1, (4,) + DATA_2D + (3,)).astype(np.float32)
    z_loc, _ = m.encode(x)
    assert z_loc.shape == (4, 3)


def test_multichannel_spatial_1d():
    m = iVAE((24,), latent_dim=2, invariances=["t"], channels=2)
    dec = m.decode(np.zeros((4, 2), np.float32))
    assert dec.shape == (4, 24, 2)
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (5, 24, 2)).astype(np.float32)
    z_loc, _ = m.encode(x)
    assert z_loc.shape == (5, 3)


def test_manifold2d_conditional_requires_y():
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, c_dim=4)
    with pytest.raises(ValueError):
        m.manifold2d(3, plot=False)
    loc = m.manifold2d(3, y=np.eye(4, dtype=np.float32)[0], plot=False)
    assert loc.shape == (9,) + DATA_2D


def test_save_load_weights(tmp_path):
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    x = np.random.default_rng(0).uniform(0, 1, (4,) + DATA_2D).astype(np.float32)
    z0 = np.asarray(m.encode(x)[0])
    path = str(tmp_path / "weights")
    m.save_weights(path)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=99)
    assert not np.allclose(np.asarray(m2.encode(x)[0]), z0)
    m2.load_weights(path)
    np.testing.assert_allclose(np.asarray(m2.encode(x)[0]), z0, rtol=1e-6)


def test_vanilla_vae_uses_fc_decoder():
    from pyroved_tpu.nets import fcDecoderNet, sDecoderNet
    m0 = iVAE(DATA_2D, latent_dim=2, invariances=None)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    assert isinstance(m0.decoder_net, fcDecoderNet)
    assert isinstance(m1.decoder_net, sDecoderNet)


def test_set_encoder_decoder_injection():
    from pyroved_tpu.nets import fcDecoderNet, fcEncoderNet
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    m.set_encoder(fcEncoderNet(DATA_2D, latent_dim=3, hidden_dim=(64,)))
    m.set_decoder(fcDecoderNet(DATA_2D, hidden_dim=(64,)))
    assert m._fused is False
    x = jnp.zeros((2, 64))
    mu, sig = m.encoder_net.apply({"params": m.params["encoder_z"]}, x)
    assert mu.shape == (2, 3)


def test_encode_chunked_batch_size():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    x = np.random.default_rng(0).uniform(0, 1, (23,) + DATA_2D).astype(np.float32)
    z_full, s_full = m.encode(x)
    z_chunk, s_chunk = m.encode(x, batch_size=8)
    np.testing.assert_allclose(np.asarray(z_full), np.asarray(z_chunk), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_full), np.asarray(s_chunk), atol=1e-5)


def test_num_particles_elbo():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (6,) + DATA_2D), jnp.float32)
    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    m5 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], num_particles=5)
    m5.params = m1.params
    l1 = m1.loss_fn(m1.params, jax.random.PRNGKey(0), (x,), jnp.asarray(1.0))
    l5 = m5.loss_fn(m1.params, jax.random.PRNGKey(0), (x,), jnp.asarray(1.0))
    assert l5.shape == (6,)
    assert np.isfinite(np.asarray(l5)).all()
    # multi-particle estimates have lower variance across seeds
    def spread(m, n=10):
        vals = [float(m.loss_fn(m1.params, jax.random.PRNGKey(s), (x,),
                                jnp.asarray(1.0)).mean()) for s in range(n)]
        return np.std(vals)
    assert spread(m5) < spread(m1)


@pytest.mark.parametrize("invariances,z_dim,coords_shape", [
    (None, 2, None), (["r"], 3, (6, 64, 2)), (["r", "t", "s"], 6, (6, 64, 2)),
])
def test_trace_site_shapes(invariances, z_dim, coords_shape):
    """Site-shape assertions mirroring the reference's trace-introspection
    tests (tests/test_models.py:101-142)."""
    m = iVAE(DATA_2D, latent_dim=2, invariances=invariances)
    x = np.random.default_rng(0).uniform(0, 1, (6,) + DATA_2D).astype(np.float32)
    t = m.trace(jax.random.PRNGKey(0), (x,))
    assert t["latent"]["value"].shape == (6, z_dim)
    assert t["latent"]["loc"].shape == (6, z_dim)
    assert (np.asarray(t["latent"]["scale"]) > 0).all()  # Normal site
    assert t["latent"]["value"].dtype == jnp.float32
    if coords_shape is None:
        assert t["coords"] is None
    else:
        assert t["coords"].shape == coords_shape
        assert t["transform"]["phi"].shape == (6,)
    loc = np.asarray(t["obs"]["loc"]).reshape(6, -1)
    assert loc.shape == (6, 64)
    assert (loc >= 0).all() and (loc <= 1).all()  # Bernoulli obs site
    assert t["recon_logp"].shape == (6,)
    assert np.isfinite(np.asarray(t["recon_logp"])).all()


def test_trace_consistent_with_loss():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"], fused=False)
    x = np.random.default_rng(0).uniform(0, 1, (4,) + DATA_2D).astype(np.float32)
    rng = jax.random.PRNGKey(5)
    t = m.trace(rng, (x,))
    loss = m.loss_fn(m.params, rng, (jnp.asarray(x),), jnp.asarray(1.0))
    np.testing.assert_allclose(
        np.asarray(-(t["recon_logp"] + t["latent_term"])), np.asarray(loss),
        rtol=1e-5)


def test_reconstruct_roundtrip():
    m = iVAE(DATA_2D, latent_dim=2, invariances=["r"])
    x = np.random.default_rng(0).uniform(0, 1, (6,) + DATA_2D).astype(np.float32)
    rec = m.reconstruct(x)
    assert rec.shape == (6,) + DATA_2D
    assert (np.asarray(rec) >= 0).all() and (np.asarray(rec) <= 1).all()
    # re-posed reconstruction differs
    rec_rot = m.reconstruct(x, angle=1.0)
    assert not np.allclose(np.asarray(rec), np.asarray(rec_rot))


def test_trace_1d():
    m = iVAE(DATA_1D, latent_dim=2, invariances=["t"])
    x = np.random.default_rng(0).uniform(0, 1, (4,) + DATA_1D).astype(np.float32)
    t = m.trace(jax.random.PRNGKey(0), (x,))
    assert t["latent"]["value"].shape == (4, 3)
    assert t["coords"].shape == (4, 16, 1)
    # 1-D: translation only — rotation slot is the identity (zeros)
    np.testing.assert_allclose(np.asarray(t["transform"]["phi"]), 0.0)
    assert t["transform"]["dx"].shape == (4, 1)
