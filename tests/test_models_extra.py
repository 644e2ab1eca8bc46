"""jiVAE / ssiVAE / ss_reg_iVAE / VED structure and shape tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyroved_tpu.models import VED, jiVAE, ss_reg_iVAE, ssiVAE

DATA_2D = (8, 8)
RNG = jax.random.PRNGKey(0)


def _imgs(n=6):
    return jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (n,) + DATA_2D), jnp.float32)


# ---------------- jiVAE ----------------

@pytest.mark.parametrize("invariances", [None, ["r"], ["r", "t"]])
def test_jivae_loss_finite(invariances):
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=4, invariances=invariances)
    loss = m.loss_fn(m.params, RNG, (_imgs(),), m.prep_beta(1.0))
    assert loss.shape == (6,)
    assert np.isfinite(np.asarray(loss)).all()


def test_jivae_prep_beta():
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3)
    assert m.prep_beta(2.0).shape == (2,)
    np.testing.assert_allclose(np.asarray(m.prep_beta([3.0, 1.0])), [3.0, 1.0])


def test_jivae_encode_classes():
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=4, invariances=["r"])
    z_loc, z_scale, cls = m.encode(_imgs(5))
    assert z_loc.shape == (5, 3) and z_scale.shape == (5, 3)
    assert cls.shape == (5,)
    _, _, probs = m.encode(_imgs(5), logits=True)
    assert probs.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_jivae_decode_and_manifolds():
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3, invariances=["r"])
    z = np.zeros((4, 2), np.float32)
    y = np.eye(3, dtype=np.float32)[[0, 1, 2, 0]]
    out = m.decode(z, y)
    assert out.shape == (4,) + DATA_2D
    loc = m.manifold2d(3, disc_idx=1, plot=False)
    assert loc.shape == (9,) + DATA_2D
    trav = m.manifold_traversal(3, cont_idx=0, plot=False)
    assert trav.shape == (9,) + DATA_2D


def test_jivae_enumeration_matches_manual_average():
    """E_q(k)[log p(x|z,k)] must equal the alpha-weighted per-class decode."""
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3, invariances=None,
              kl="analytic")
    x = _imgs(4)
    # beta=0 kills latent and discrete terms except the recon expectation
    loss0 = np.asarray(m.loss_fn(m.params, RNG, (x,), m.prep_beta(0.0)))
    # manual: encode, sample z with same rng path, decode each class
    from pyroved_tpu.infer.dists import normal_sample, bernoulli_log_prob
    xf = x.reshape(4, -1)
    mu, sig, alpha = m.encoder_net.apply({"params": m.params["encoder_z"]}, xf)
    z = normal_sample(RNG, mu, sig)
    recon = np.zeros(4)
    for k in range(3):
        onehot = jnp.broadcast_to(jnp.eye(3)[k], (4, 3))
        zk = jnp.concatenate([z, onehot], -1)
        loc = m.decoder_net.apply({"params": m.params["decoder"]}, zk)
        lp = np.asarray(jnp.sum(bernoulli_log_prob(xf, loc), -1))
        recon += np.asarray(alpha)[:, k] * lp
    np.testing.assert_allclose(loss0, -recon, rtol=1e-4)


# ---------------- ssiVAE ----------------

@pytest.mark.parametrize("invariances", [None, ["r"]])
def test_ssivae_loss_unsup_and_sup(invariances):
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, invariances=invariances)
    x = _imgs()
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 0, 1, 2]), 3)
    l_unsup = m.loss_fn(m.params, RNG, (x,), jnp.asarray(1.0))
    l_sup = m.loss_fn(m.params, RNG, (x, y), jnp.asarray(1.0))
    assert l_unsup.shape == (6,) and l_sup.shape == (6,)
    assert np.isfinite(np.asarray(l_unsup)).all()
    assert np.isfinite(np.asarray(l_sup)).all()


def test_ssivae_aux_loss():
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3)
    x = _imgs()
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 0, 1, 2]), 3)
    aux = np.asarray(m.aux_loss_fn(m.params, RNG, (x, y), jnp.asarray(20.0)))
    assert aux.shape == (6,)
    assert (aux > 0).all()  # -20*log q(y|x) > 0
    zero = np.asarray(m.aux_loss_fn(m.params, RNG, (x,), jnp.asarray(20.0)))
    np.testing.assert_allclose(zero, 0.0)


def test_ssivae_classifier_and_encode():
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=4, invariances=["r"])
    pred = m.classifier(_imgs(5))
    assert pred.shape == (5,)
    z_loc, z_scale, y_pred = m.encode(_imgs(5))
    assert z_loc.shape == (5, 3)
    np.testing.assert_array_equal(np.asarray(y_pred), np.asarray(pred))
    # with provided integer labels
    z_loc2, _, y2 = m.encode(_imgs(5), y=np.asarray([1, 2, 3, 0, 1]))
    np.testing.assert_array_equal(np.asarray(y2), [1, 2, 3, 0, 1])


def test_ssivae_manifolds():
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, invariances=["r"])
    loc = m.manifold2d(3, plot=False, label=2)
    assert loc.shape == (9,) + DATA_2D
    trav = m.manifold_traversal(3, cont_idx=1, plot=False)
    assert trav.shape == (9,) + DATA_2D


# ---------------- ss_reg_iVAE ----------------

def test_ss_reg_loss_and_aux():
    m = ss_reg_iVAE(DATA_2D, latent_dim=2, reg_dim=1, invariances=["r"])
    x = _imgs()
    y = jnp.asarray(np.random.default_rng(1).normal(size=(6, 1)), jnp.float32)
    l_unsup = m.loss_fn(m.params, RNG, (x,), jnp.asarray(1.0))
    l_sup = m.loss_fn(m.params, RNG, (x, y), jnp.asarray(1.0))
    assert np.isfinite(np.asarray(l_unsup)).all()
    assert np.isfinite(np.asarray(l_sup)).all()
    aux = np.asarray(m.aux_loss_fn(m.params, RNG, (x, y), jnp.asarray(50.0)))
    assert aux.shape == (6,)


def test_ss_reg_regressor_encode_decode():
    m = ss_reg_iVAE(DATA_2D, latent_dim=2, reg_dim=2)
    pred = m.regressor(_imgs(5))
    assert pred.shape == (5, 2)
    z_loc, z_scale, y = m.encode(_imgs(5))
    assert z_loc.shape == (5, 2) and y.shape == (5, 2)
    out = m.decode(np.zeros((3, 2), np.float32), np.zeros((3, 2), np.float32))
    assert out.shape == (3,) + DATA_2D
    loc = m.manifold2d(3, y=np.zeros(2, np.float32), plot=False)
    assert loc.shape == (9,) + DATA_2D


def test_ss_reg_default_sigma():
    m = ss_reg_iVAE(DATA_2D, latent_dim=2, reg_dim=1)
    assert m.reg_sig == 0.5
    m2 = ss_reg_iVAE(DATA_2D, latent_dim=2, reg_dim=1, regressor_sig=0.1)
    assert m2.reg_sig == 0.1


def test_multichannel_family():
    """channels= extends to every sDecoder model family."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (4,) + DATA_2D + (3,)), jnp.float32)

    j = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3, invariances=["r"],
              channels=3)
    loss = j.loss_fn(j.params, RNG, (x,), j.prep_beta(1.0))
    assert loss.shape == (4,) and np.isfinite(np.asarray(loss)).all()
    dec = j.decode(np.zeros((2, 2), np.float32), np.eye(3, dtype=np.float32)[:2])
    assert dec.shape == (2,) + DATA_2D + (3,)

    s = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, invariances=["r"],
               channels=3)
    for b in [(x,), (x, jax.nn.one_hot(jnp.asarray([0, 1, 2, 0]), 3))]:
        loss = s.loss_fn(s.params, RNG, b, jnp.asarray(1.0))
        assert np.isfinite(np.asarray(loss)).all()
    assert s.classifier(np.asarray(x)).shape == (4,)

    r = ss_reg_iVAE(DATA_2D, latent_dim=2, reg_dim=1, invariances=["t"],
                    channels=2)
    x2 = jnp.asarray(rng.uniform(0, 1, (4,) + DATA_2D + (2,)), jnp.float32)
    loss = r.loss_fn(r.params, RNG, (x2,), jnp.asarray(1.0))
    assert np.isfinite(np.asarray(loss)).all()
    assert r.manifold2d(2, y=np.zeros(1, np.float32),
                        plot=False).shape == (4,) + DATA_2D + (2,)


# ---------------- VED ----------------

@pytest.mark.parametrize("in_dim,out_dim", [
    ((16, 16), (32,)),   # im2spec
    ((32,), (16, 16)),   # spec2im
    ((16, 16), (16, 16)),
    ((32,), (32,)),
])
def test_ved_loss_and_predict(in_dim, out_dim):
    m = VED(in_dim, out_dim, latent_dim=2,
            hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (4,) + in_dim).astype(np.float32)
    y = rng.uniform(0, 1, (4,) + out_dim).astype(np.float32)
    loss = m.loss_fn(m.params, RNG, (jnp.asarray(x), jnp.asarray(y)), jnp.asarray(1.0))
    assert loss.shape == (4,)
    assert np.isfinite(np.asarray(loss)).all()
    mean, std = m.predict(x, num_samples=5)
    assert mean.shape == (4,) + out_dim
    assert std.shape == (4,) + out_dim
    assert (np.asarray(std) >= 0).all()


def test_ved_fit_with_test_pairs():
    """VED.fit(test_data=(X, y)) rides the fused run-with-eval path:
    per-epoch test losses recorded without a per-epoch host loop."""
    m = VED((16, 16), (32,), latent_dim=2,
            hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (16, 16, 16)).astype(np.float32)
    y = rng.uniform(0, 1, (16, 32)).astype(np.float32)
    xt = rng.uniform(0, 1, (8, 16, 16)).astype(np.float32)
    yt = rng.uniform(0, 1, (8, 32)).astype(np.float32)
    tr = m.fit(x, y, test_data=(xt, yt), epochs=3, batch_size=8)
    assert len(tr.loss_history["training_loss"]) == 3
    assert len(tr.loss_history["test_loss"]) == 3
    assert all(np.isfinite(v) for v in tr.loss_history["test_loss"])


def test_ved_bf16_compute_mode():
    """compute_dtype='bfloat16' runs the conv towers in bf16 (1.58x on the
    256x256 stretch config, measured on v5e) while params and the
    latent/obs heads stay f32; training must track the f32 run closely."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (64, 16, 16)).astype(np.float32)
    y = rng.uniform(0, 1, (64, 32)).astype(np.float32)
    final = {}
    for cd in ("float32", "bfloat16"):
        m = VED((16, 16), (32,), latent_dim=2, seed=1, compute_dtype=cd,
                hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
        # params are f32 regardless of compute dtype
        assert all(np.asarray(l).dtype == np.float32
                   for l in jax.tree_util.tree_leaves(m.params))
        import pyroved_tpu as pv
        loader = pv.utils.init_dataloader(x, y, batch_size=32)
        tr = pv.trainers.SVItrainer(m)
        for _ in range(5):
            tr.step(loader)
        final[cd] = tr.loss_history["training_loss"][-1]
    assert abs(final["float32"] - final["bfloat16"]) / abs(final["float32"]) < 0.01
    with pytest.raises(ValueError, match="compute_dtype"):
        VED((16, 16), (32,), compute_dtype="float16")


def test_ved_encode_decode_manifold():
    m = VED((16, 16), (32,), latent_dim=2,
            hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
    x = np.random.default_rng(0).uniform(0, 1, (5, 16, 16)).astype(np.float32)
    z_loc, z_scale = m.encode(x)
    assert z_loc.shape == (5, 2)
    dec = m.decode(np.zeros((2, 2), np.float32))
    assert dec.shape == (2, 32)
    loc = m.manifold2d(2, plot=False)
    assert loc.shape == (4, 32)


def test_ved_predict_num_samples_not_cached_stale():
    m = VED((16, 16), (32,), latent_dim=2,
            hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
    x = np.random.default_rng(0).uniform(0, 1, (3, 16, 16)).astype(np.float32)
    m.predict(x, num_samples=4)
    mean, std = m.predict(x, num_samples=16)  # must NOT reuse the 4-sample jit
    assert 4 in m._predict_jit and 16 in m._predict_jit
    assert mean.shape == (3, 32)


def test_ved_num_particles():
    m = VED((16, 16), (32,), latent_dim=2, num_particles=4,
            hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (3, 16, 16)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (3, 32)), jnp.float32)
    loss = m.loss_fn(m.params, RNG, (x, y), jnp.asarray(1.0))
    assert loss.shape == (3,)
    assert np.isfinite(np.asarray(loss)).all()


@pytest.mark.parametrize("make", [
    lambda **kw: jiVAE(DATA_2D, latent_dim=2, discrete_dim=3,
                       invariances=["r"], **kw),
    lambda **kw: ssiVAE(DATA_2D, latent_dim=2, num_classes=3,
                        invariances=["r"], **kw),
    lambda **kw: ss_reg_iVAE(DATA_2D, latent_dim=2, reg_dim=1,
                             invariances=["r"], **kw),
])
def test_num_particles_all_models(make):
    m1 = make()
    mp = make(num_particles=4)
    mp.params = m1.params
    x = _imgs(4)
    beta = m1.prep_beta(1.0) if hasattr(m1, "prep_beta") else jnp.asarray(1.0)
    lp = mp.loss_fn(m1.params, RNG, (x,), beta)
    assert lp.shape == (4,)
    assert np.isfinite(np.asarray(lp)).all()

    def spread(m, n=8):
        return np.std([float(m.loss_fn(m1.params, jax.random.PRNGKey(s),
                                       (x,), beta).mean()) for s in range(n)])
    assert spread(mp) < spread(m1)


def test_ssivae_enum_trace_shapes():
    """Enumeration-expanded site shapes (K, B, .) like Pyro's parallel
    enumeration (reference tests/test_models.py:193-208)."""
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=4, invariances=["r"])
    x = _imgs(5)
    t = m.trace(RNG, (x,))
    assert t["y"]["probs"].shape == (5, 4)
    assert t["y"]["enumerated"].shape == (4, 5, 4)
    assert t["z"]["value"].shape == (4, 5, 3)   # [K, B, z_dim]
    assert (np.asarray(t["z"]["scale"]) > 0).all()
    assert t["branch_elbo"].shape == (4, 5)
    assert np.isfinite(np.asarray(t["branch_elbo"])).all()


def test_jivae_trainer_beta_pair_eval():
    from pyroved_tpu.trainers import SVItrainer
    from pyroved_tpu.utils import init_dataloader
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3, invariances=["r"])
    loader = init_dataloader(np.asarray(_imgs(32)), batch_size=16)
    tr = SVItrainer(m)
    tr.step(loader, loader, scale_factor=[3.0, 1.0])
    assert np.isfinite(tr.loss_history["training_loss"][0])
    assert np.isfinite(tr.loss_history["test_loss"][0])


def test_ssivae_classifier_chunked():
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3)
    x = _imgs(23)
    full = np.asarray(m.classifier(x))
    chunked = np.asarray(m.classifier(x, batch_size=8))
    np.testing.assert_array_equal(full, chunked)


def test_jivae_trace_sites():
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3, invariances=["r"])
    x = _imgs(4)
    t = m.trace(RNG, (x,))
    assert t["latent_cont"]["value"].shape == (4, 3)
    assert (np.asarray(t["latent_cont"]["scale"]) > 0).all()
    assert t["latent_disc"]["probs"].shape == (4, 3)
    np.testing.assert_allclose(np.asarray(t["latent_disc"]["probs"]).sum(-1),
                               1.0, rtol=1e-5)
    assert t["latent_disc"]["enumerated"].shape == (3, 4, 3)
    # full program depth (parity with iVAE.trace): transform, coords, obs,
    # per-branch + expected recon, and both ELBO terms
    assert t["transform"]["phi"].shape == (4,)
    assert t["coords"].shape == (4, 64, 2)
    assert t["obs"]["loc"].shape == (3, 4, 64)   # K enumerated branches
    assert t["recon_logp_k"].shape == (3, 4)
    assert t["recon_logp"].shape == (4,)
    assert t["disc_term"].shape == (4,)
    # the trace must reproduce loss_fn exactly (same rng)
    loss = np.asarray(m.loss_fn(m.params, RNG, (x,), m.prep_beta(1.0)))
    recon = np.asarray(t["recon_logp"])
    lat = np.asarray(t["latent_term"])
    disc = np.asarray(t["disc_term"])
    np.testing.assert_allclose(loss, -(recon + lat + disc), rtol=1e-5)


def test_jivae_trace_no_invariances():
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=3)
    t = m.trace(RNG, (_imgs(4),))
    assert t["coords"] is None and t["transform"]["phi"] is None
    assert t["obs"]["loc"].shape[0] == 3


def test_jivae_shared_enum_decode_matches_module_all_activations():
    """The shared-coords enumerated decode must agree with the true
    decoder module for EVERY reference activation (all five now ride the
    shared-head path; the fallback guard remains for injected custom
    activations — round-3 review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyroved_tpu.models import jiVAE
    for act in ("tanh", "relu", "softplus", "lrelu", "gelu"):
        m = jiVAE((8, 8), latent_dim=2, discrete_dim=3, invariances=["r"],
                  activation=act, seed=4)
        z = jnp.asarray(
            np.random.default_rng(0).normal(size=(5, m.z_dim)), jnp.float32)
        coords, _ = m.transformed_grid(z)
        K = m.discrete_dim
        eye = jnp.eye(K, dtype=jnp.float32)
        _, _, _, zc = m.split_latent_full(z)
        zc_k = jnp.concatenate([
            jnp.broadcast_to(zc, (K,) + zc.shape),
            jnp.broadcast_to(eye[:, None, :], (K, 5, K))], axis=-1)
        shared = m._enum_decode_xla_shared(m.params, coords, zc_k)
        coords_k = jnp.broadcast_to(coords, (K,) + coords.shape)
        ref = m.decoder_net.apply({"params": m.params["decoder"]},
                                  coords_k, zc_k)
        np.testing.assert_allclose(np.asarray(shared), np.asarray(ref),
                                   atol=1e-5, err_msg=f"activation={act}")


def test_jivae_shared_enum_decode_gates_on_padding(monkeypatch):
    """Hidden widths that ``_padded_sdecoder_weights`` would zero-pad must
    NOT take the shared-coords enumerated decode: the shared head saves
    only ~2% while the padded [K, B, N, Hmax] matmuls cost up to ~3x the
    MACs (round-3 review finding). Aligned equal widths keep it."""
    import pyroved_tpu.ops.spatial_decoder as sd

    def setup(hidden):
        m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=2, invariances=["r"],
                  hidden_dim_d=hidden, seed=3)
        z = jnp.asarray(
            np.random.default_rng(1).normal(size=(4, m.z_dim)), jnp.float32)
        coords, _ = m.transformed_grid(z)
        _, _, _, zc = m.split_latent_full(z)
        eye = jnp.eye(2, dtype=jnp.float32)
        zc_k = jnp.concatenate([
            jnp.broadcast_to(zc, (2,) + zc.shape),
            jnp.broadcast_to(eye[:, None, :], (2, 4, 2))], axis=-1)
        return m, coords, zc_k

    calls = []
    orig = sd._padded_sdecoder_weights
    monkeypatch.setattr(sd, "_padded_sdecoder_weights",
                        lambda p: calls.append(1) or orig(p))

    for hidden, expect_shared in (((96, 96), False),    # unaligned: pad
                                  ((256, 128), False),  # unequal: pad
                                  ((128, 128), True)):  # aligned: shared
        calls.clear()
        m, coords, zc_k = setup(hidden)
        out = m._enum_decode_xla_shared(m.params, coords, zc_k)
        coords_k = jnp.broadcast_to(coords, (2,) + coords.shape)
        ref = m.decoder_net.apply({"params": m.params["decoder"]},
                                  coords_k, zc_k)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=f"hidden={hidden}")
        assert bool(calls) == expect_shared, f"hidden={hidden}"


def test_ved_conv_first_kwarg():
    """VED(conv_first=False) restores the literal reference upsampler order
    (1x1 convs after each resize); the default commuted form decodes the
    same output with the same parameter tree."""
    rng = np.random.default_rng(4)
    z = rng.normal(size=(3, 2)).astype(np.float32)
    models = {}
    for cf in (True, False):
        m = VED((16, 16), (32, 32), latent_dim=2, seed=1, conv_first=cf,
                hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
        assert m.decoder_net.conv_first is cf
        models[cf] = m
    assert (jax.tree_util.tree_structure(models[True].params)
            == jax.tree_util.tree_structure(models[False].params))
    out_fast = models[True].decode(z)
    out_ref = models[False].decoder_net.apply(
        {"params": models[True].params["decoder"]}, z)
    np.testing.assert_allclose(np.asarray(out_fast).reshape(3, -1),
                               np.asarray(out_ref).reshape(3, -1), atol=5e-6)


# ---------------- enum_topk truncated enumeration ----------------

@pytest.mark.parametrize("invariances", [None, ["r"]])
def test_jivae_enum_topk_full_k_matches_exact(invariances):
    """enum_topk == K is the exact expectation: jiVAE shares one z across
    the enumerated branches, so sorting branches by probability only
    reorders the alpha-weighted sum (f32 reassociation level)."""
    kw = dict(latent_dim=2, discrete_dim=4, invariances=invariances,
              seed=1)
    m_exact = jiVAE(DATA_2D, **kw)
    m_topk = jiVAE(DATA_2D, enum_topk=4, **kw)
    x = _imgs(5)
    beta = m_exact.prep_beta(1.0)
    l_exact = np.asarray(m_exact.loss_fn(m_exact.params, RNG, (x,), beta))
    l_topk = np.asarray(m_topk.loss_fn(m_topk.params, RNG, (x,), beta))
    np.testing.assert_allclose(l_topk, l_exact, rtol=2e-5)


def test_jivae_enum_topk_truncated_shapes_and_grad():
    m = jiVAE(DATA_2D, latent_dim=2, discrete_dim=6, enum_topk=2, seed=1)
    x = _imgs(4)
    beta = m.prep_beta(1.0)
    loss = m.loss_fn(m.params, RNG, (x,), beta)
    assert loss.shape == (4,)
    assert np.isfinite(np.asarray(loss)).all()
    g = jax.grad(lambda p: jnp.mean(m.loss_fn(p, RNG, (x,), beta)))(m.params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    # the classifier itself must receive gradient through the top-k weights
    enc_grads = jax.tree_util.tree_leaves(g["encoder_z"])
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in enc_grads)


def test_jivae_enum_topk_gap_shrinks_with_concentration():
    """When q(k|x) concentrates on one class, the k=1 truncation converges
    to the exact expectation (the renormalized tail it drops carries
    vanishing weight)."""
    def with_alpha(model, conc):
        """Wrap the encoder so alpha is a fixed mixture of uniform and
        one-hot at concentration ``conc``."""
        orig_apply = model.encoder_net.apply

        def apply(variables, xf):
            mu, sig, alpha = orig_apply(variables, xf)
            onehot = jnp.zeros_like(alpha).at[:, 0].set(1.0)
            uni = jnp.full_like(alpha, 1.0 / alpha.shape[-1])
            return mu, sig, conc * onehot + (1 - conc) * uni
        model.encoder_net.apply = apply

    x = _imgs(4)
    beta = jnp.asarray([1.0, 1.0], jnp.float32)
    gaps = []
    for conc in (0.5, 0.99, 0.999999):
        m_e = jiVAE(DATA_2D, latent_dim=2, discrete_dim=4, seed=1,
                    invariances=None)
        m_1 = jiVAE(DATA_2D, latent_dim=2, discrete_dim=4, seed=1,
                    invariances=None, enum_topk=1)
        with_alpha(m_e, conc)
        with_alpha(m_1, conc)
        l_e = np.asarray(m_e.loss_fn(m_e.params, RNG, (x,), beta))
        l_1 = np.asarray(m_1.loss_fn(m_1.params, RNG, (x,), beta))
        gaps.append(np.abs(l_e - l_1).max())
    assert gaps[1] < gaps[0]
    assert gaps[2] < 1e-3


def test_ssivae_enum_topk_full_k_matches_exact_zero_noise():
    """With the reparameterization noise pinned to zero, enum_topk == K
    reproduces the exact unlabeled ELBO (branch order is the only
    difference; each branch's z depends only on its own (x, y_k))."""
    import pyroved_tpu.models.ssivae as ssivae_mod
    kw = dict(latent_dim=2, num_classes=4, invariances=None, seed=1)
    m_exact = ssiVAE(DATA_2D, **kw)
    m_topk = ssiVAE(DATA_2D, enum_topk=4, **kw)
    x = _imgs(5)
    orig = ssivae_mod.normal_sample
    ssivae_mod.normal_sample = lambda rng, mu, sig: mu
    try:
        l_exact = np.asarray(
            m_exact.loss_fn(m_exact.params, RNG, (x,), jnp.asarray(1.0)))
        l_topk = np.asarray(
            m_topk.loss_fn(m_topk.params, RNG, (x,), jnp.asarray(1.0)))
    finally:
        ssivae_mod.normal_sample = orig
    np.testing.assert_allclose(l_topk, l_exact, rtol=2e-5)


def test_ssivae_enum_topk_truncated_shapes_and_labeled_unchanged():
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=5, enum_topk=2, seed=1)
    m_ref = ssiVAE(DATA_2D, latent_dim=2, num_classes=5, seed=1)
    x = _imgs(4)
    y = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 5)
    l_unsup = m.loss_fn(m.params, RNG, (x,), jnp.asarray(1.0))
    assert l_unsup.shape == (4,)
    assert np.isfinite(np.asarray(l_unsup)).all()
    # the labeled path never enumerates: bitwise-identical to untruncated
    np.testing.assert_array_equal(
        np.asarray(m.loss_fn(m.params, RNG, (x, y), jnp.asarray(1.0))),
        np.asarray(m_ref.loss_fn(m_ref.params, RNG, (x, y), jnp.asarray(1.0))))


def test_enum_topk_validation():
    with pytest.raises(ValueError, match="enum_topk"):
        jiVAE(DATA_2D, latent_dim=2, discrete_dim=3, enum_topk=4)
    with pytest.raises(ValueError, match="enum_topk"):
        ssiVAE(DATA_2D, latent_dim=2, num_classes=3, enum_topk=-1)
    # 0 / None disable cleanly
    assert jiVAE(DATA_2D, latent_dim=2, discrete_dim=3,
                 enum_topk=0).enum_topk == 0
    assert ssiVAE(DATA_2D, latent_dim=2, num_classes=3,
                  enum_topk=None).enum_topk == 0


# ---------------------------------------------------------------------------
# fit(data_scale=): raw-integer convenience (round 4)
# ---------------------------------------------------------------------------

def test_fit_data_scale_matches_prenormalized():
    """fit(u8, data_scale=1/255) trains identically to fit(u8/255.) and
    keeps the dataset uint8-resident (visible via the trainer's loaders
    only indirectly — we assert the parameter trajectory)."""
    from pyroved_tpu.models import iVAE
    rng = np.random.default_rng(11)
    u8 = rng.integers(0, 256, (40,) + DATA_2D).astype(np.uint8)
    f32 = u8.astype(np.float32) * np.float32(1 / 255.0)

    m1 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=3)
    t1 = m1.fit(f32, epochs=2, batch_size=20, seed=5)
    m2 = iVAE(DATA_2D, latent_dim=2, invariances=["r"], seed=3)
    t2 = m2.fit(u8, epochs=2, batch_size=20, seed=5, data_scale=1 / 255.0)
    np.testing.assert_allclose(t1.loss_history["training_loss"],
                               t2.loss_history["training_loss"], rtol=1e-6)
    # few-ULP tolerance: the scale program fuses the convert+multiply into
    # downstream FMAs, so isolated elements round differently
    for a, b in zip(jax.tree_util.tree_leaves(m1.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=5e-7)


def test_fit_integer_data_without_scale_rejected():
    from pyroved_tpu.models import iVAE
    u8 = np.zeros((16,) + DATA_2D, np.uint8)
    m = iVAE(DATA_2D, latent_dim=2, invariances=None, seed=0)
    with pytest.raises(ValueError, match="data_scale"):
        m.fit(u8, epochs=1, batch_size=8)


def test_ssivae_fit_data_scale():
    rng = np.random.default_rng(12)
    u8u = rng.integers(0, 256, (32,) + DATA_2D).astype(np.uint8)
    u8l = rng.integers(0, 256, (12,) + DATA_2D).astype(np.uint8)
    yl = rng.integers(0, 3, 12)
    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, seed=1)
    t = m.fit(u8u, (u8l, yl), epochs=2, batch_size=8,
              data_scale=1 / 255.0)
    assert np.isfinite(t.history["training_loss"]).all()
    with pytest.raises(ValueError, match="data_scale"):
        m.fit(u8u, (u8l, yl), epochs=1, batch_size=8)


def test_ssivae_set_classifier_resets_guide_probs_cache():
    """set_classifier must drop the guide_probs trace too: a replacement
    net with the SAME param structure would otherwise replay the old
    module's cached computation (jit keys on arg structure)."""
    import flax.linen as fnn

    class _NegatedSoftmax(fnn.Module):
        num_classes: int = 3

        @fnn.compact
        def __call__(self, x):
            h = fnn.Dense(16)(jnp.tanh(fnn.Dense(16)(x)))
            # deliberately different head math, same param structure
            return jax.nn.softmax(-fnn.Dense(self.num_classes)(h), -1)

    class _PlainSoftmax(fnn.Module):
        num_classes: int = 3

        @fnn.compact
        def __call__(self, x):
            h = fnn.Dense(16)(jnp.tanh(fnn.Dense(16)(x)))
            return jax.nn.softmax(fnn.Dense(self.num_classes)(h), -1)

    m = ssiVAE(DATA_2D, latent_dim=2, num_classes=3, invariances=["r"])
    x = _imgs(6)
    m.set_classifier(_PlainSoftmax())
    saved = m.params["encoder_y"]
    p_plain = np.asarray(m.guide_probs(x))
    m.set_classifier(_NegatedSoftmax())
    # identical weights AND identical param structure: with a stale jit
    # trace the two calls would return bit-identical outputs
    m.params["encoder_y"] = saved
    p_neg = np.asarray(m.guide_probs(x))
    assert not np.allclose(p_plain, p_neg)
    np.testing.assert_allclose(p_plain.sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(p_neg.sum(-1), 1.0, rtol=1e-5)
