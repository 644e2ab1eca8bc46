"""Pixel-axis partitioned TRAINING (VERDICT r4 item 1).

The SURVEY section 5 sequence-parallel analogue: partitioning the spatial
decoder's H*W pixel axis. Two variants, both exact (the observation
log-density factorizes over pixels):

* ``pixel_chunks=k`` — in-device ``lax.scan`` over grid tiles with
  per-tile remat, bounding the [B, N, H] working set on ONE chip.
* ``parallel.shard_pixels(model, mesh, axis)`` — ``shard_map`` over a mesh
  axis with ``psum`` on the recon term (weight grads psum via transpose).

These tests pin numerics (loss AND grads equal to the full-grid path),
training smoke for every spatial model family, non-dividing pixel counts
(padding + mask), and composition with data-parallel meshes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from pyroved_tpu.models import iVAE, jiVAE, ss_reg_iVAE, ssiVAE
from pyroved_tpu.parallel import shard_pixels
from pyroved_tpu.trainers import SVItrainer
from pyroved_tpu.utils.data import init_dataloader

jax.config.update("jax_enable_x64", False)


def _tree_allclose(a, b, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=1e-4)


def _loss_and_grads(model, batch, beta=1.0):
    rng = jax.random.PRNGKey(7)
    beta = (model.prep_beta(beta) if hasattr(model, "prep_beta")
            else jnp.asarray(beta, jnp.float32))

    def scalar(p):
        return jnp.sum(model.loss_fn(p, rng, batch, beta))

    return jax.value_and_grad(scalar)(model.params)


def _pixel_mesh(n=4, extra=None):
    devs = jax.devices()[:n if extra is None else n * extra]
    if extra is None:
        return Mesh(np.array(devs).reshape(n), ("pixels",))
    return Mesh(np.array(devs).reshape(extra, n), ("data", "pixels"))


# ---------------------------------------------------------------------------
# numerics: chunked == full-grid, loss and grads
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("invariances", [["r"], ["r", "t", "s"], None])
def test_ivae_pixel_chunks_loss_and_grads_match(invariances):
    if invariances is None:
        with pytest.raises(ValueError):
            iVAE((8, 8), 2, None, pixel_chunks=3, seed=0)
        return
    x = jax.random.uniform(jax.random.PRNGKey(0), (6, 8, 8))
    ref = iVAE((8, 8), 2, invariances, seed=0)
    # 64 pixels, 3 chunks: non-dividing -> exercises padding + mask
    chk = iVAE((8, 8), 2, invariances, pixel_chunks=3, seed=0)
    l0, g0 = _loss_and_grads(ref, (x,))
    l1, g1 = _loss_and_grads(chk, (x,))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _tree_allclose(g0, g1, atol=1e-4)


def test_ivae_pixel_chunks_1d():
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 24))
    ref = iVAE((24,), 2, ["t"], seed=0)
    chk = iVAE((24,), 2, ["t"], pixel_chunks=4, seed=0)
    l0, g0 = _loss_and_grads(ref, (x,))
    l1, g1 = _loss_and_grads(chk, (x,))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _tree_allclose(g0, g1, atol=1e-4)


def test_ivae_pixel_chunks_particles_and_conditional():
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 8))
    y = jax.nn.one_hot(jnp.array([0, 1, 2, 0]), 3).astype(jnp.float32)
    ref = iVAE((8, 8), 2, ["r"], c_dim=3, num_particles=3, seed=0)
    chk = iVAE((8, 8), 2, ["r"], c_dim=3, num_particles=3, pixel_chunks=2,
               seed=0)
    l0, _ = _loss_and_grads(ref, (x, y))
    l1, _ = _loss_and_grads(chk, (x, y))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)


def test_ivae_pixel_chunks_multichannel():
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 8, 8, 3))
    ref = iVAE((8, 8), 2, ["r"], channels=3, seed=0)
    chk = iVAE((8, 8), 2, ["r"], channels=3, pixel_chunks=3, seed=0)
    l0, g0 = _loss_and_grads(ref, (x,))
    l1, g1 = _loss_and_grads(chk, (x,))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _tree_allclose(g0, g1, atol=1e-4)


def test_jivae_pixel_chunks_matches():
    x = jax.random.uniform(jax.random.PRNGKey(4), (5, 8, 8))
    ref = jiVAE((8, 8), 2, 4, ["r"], seed=0)
    chk = jiVAE((8, 8), 2, 4, ["r"], pixel_chunks=3, seed=0)
    l0, g0 = _loss_and_grads(ref, (x,), beta=[1.0, 0.5])
    l1, g1 = _loss_and_grads(chk, (x,), beta=[1.0, 0.5])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _tree_allclose(g0, g1, atol=1e-4)


def test_jivae_pixel_chunks_enum_topk_matches():
    x = jax.random.uniform(jax.random.PRNGKey(5), (5, 8, 8))
    ref = jiVAE((8, 8), 2, 5, ["r"], enum_topk=2, seed=0)
    chk = jiVAE((8, 8), 2, 5, ["r"], enum_topk=2, pixel_chunks=2, seed=0)
    l0, _ = _loss_and_grads(ref, (x,))
    l1, _ = _loss_and_grads(chk, (x,))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)


@pytest.mark.parametrize("labeled", [False, True])
def test_ssivae_pixel_chunks_matches(labeled):
    x = jax.random.uniform(jax.random.PRNGKey(6), (5, 8, 8))
    batch = (x,)
    if labeled:
        batch = (x, jax.nn.one_hot(jnp.array([0, 1, 2, 0, 1]), 3).astype(jnp.float32))
    ref = ssiVAE((8, 8), 2, 3, ["r"], seed=0)
    chk = ssiVAE((8, 8), 2, 3, ["r"], pixel_chunks=3, seed=0)
    l0, g0 = _loss_and_grads(ref, batch)
    l1, g1 = _loss_and_grads(chk, batch)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _tree_allclose(g0, g1, atol=1e-4)


def test_ss_reg_pixel_chunks_matches():
    x = jax.random.uniform(jax.random.PRNGKey(8), (5, 8, 8))
    y = jax.random.normal(jax.random.PRNGKey(9), (5, 2))
    ref = ss_reg_iVAE((8, 8), 2, 2, ["r"], seed=0)
    chk = ss_reg_iVAE((8, 8), 2, 2, ["r"], pixel_chunks=2, seed=0)
    for batch in [(x,), (x, y)]:
        l0, _ = _loss_and_grads(ref, batch)
        l1, _ = _loss_and_grads(chk, batch)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)


# ---------------------------------------------------------------------------
# numerics: sharded == full-grid (CPU mesh)
# ---------------------------------------------------------------------------
@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
@pytest.mark.parametrize("invariances", [["r"], ["r", "t", "s"]])
def test_ivae_shard_pixels_loss_and_grads_match(invariances):
    x = jax.random.uniform(jax.random.PRNGKey(0), (6, 9, 9))  # 81 % 4 != 0
    ref = iVAE((9, 9), 2, invariances, seed=0)
    shd = iVAE((9, 9), 2, invariances, seed=0)
    shard_pixels(shd, _pixel_mesh(4))
    l0, g0 = _loss_and_grads(ref, (x,))
    l1, g1 = _loss_and_grads(shd, (x,))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    _tree_allclose(g0, g1, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_shard_pixels_all_families_match():
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (4, 8, 8))
    mesh = _pixel_mesh(4)
    pairs = [
        (jiVAE((8, 8), 2, 3, ["r"], seed=0),
         jiVAE((8, 8), 2, 3, ["r"], seed=0), (x,)),
        (ssiVAE((8, 8), 2, 3, ["r"], seed=0),
         ssiVAE((8, 8), 2, 3, ["r"], seed=0), (x,)),
        (ss_reg_iVAE((8, 8), 2, 1, ["r"], seed=0),
         ss_reg_iVAE((8, 8), 2, 1, ["r"], seed=0), (x,)),
    ]
    for ref, shd, batch in pairs:
        shard_pixels(shd, mesh)
        l0, _ = _loss_and_grads(ref, batch)
        l1, _ = _loss_and_grads(shd, batch)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5,
                                   err_msg=type(ref).__name__)


def test_shard_pixels_validation():
    m = iVAE((8, 8), 2, ["r"], seed=0)
    with pytest.raises(ValueError):
        shard_pixels(m, _pixel_mesh(2), axis="nope")
    plain = iVAE((8, 8), 2, None, seed=0)
    with pytest.raises(ValueError):
        shard_pixels(plain, _pixel_mesh(2))
    shard_pixels(m, _pixel_mesh(2))
    assert m._pixel_mode() == "shard"
    shard_pixels(m, None)
    assert m._pixel_mode() is None


# ---------------------------------------------------------------------------
# training end-to-end
# ---------------------------------------------------------------------------
def test_pixel_chunks_training_matches_trajectory():
    """fit() with pixel_chunks reproduces the full-grid parameter
    trajectory (same PRNG chain; f32 tolerance)."""
    X = np.random.RandomState(0).rand(40, 8, 8).astype(np.float32)
    ref = iVAE((8, 8), 2, ["r", "t"], seed=0)
    chk = iVAE((8, 8), 2, ["r", "t"], pixel_chunks=4, seed=0)
    t0 = ref.fit(X, epochs=3, batch_size=10)
    t1 = chk.fit(X, epochs=3, batch_size=10)
    np.testing.assert_allclose(t0.loss_history["training_loss"],
                               t1.loss_history["training_loss"], rtol=2e-4)
    _tree_allclose(ref.params, chk.params, atol=2e-3)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_shard_pixels_training_green():
    X = np.random.RandomState(1).rand(30, 9, 9).astype(np.float32)
    m = iVAE((9, 9), 2, ["r"], seed=0)
    shard_pixels(m, _pixel_mesh(4))
    trainer = m.fit(X, epochs=2, batch_size=10)
    losses = trainer.loss_history["training_loss"]
    assert len(losses) == 2 and all(np.isfinite(losses))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs >= 8 devices")
def test_shard_pixels_composes_with_data_parallel():
    """'data' x 'pixels' mesh: the trainer shards the batch over 'data'
    while the recon term shard_maps over 'pixels'."""
    mesh = _pixel_mesh(4, extra=2)
    X = np.random.RandomState(2).rand(32, 8, 8).astype(np.float32)
    ref = iVAE((8, 8), 2, ["r"], seed=0)
    m = iVAE((8, 8), 2, ["r"], seed=0)
    shard_pixels(m, mesh)
    t0 = ref.fit(X, epochs=2, batch_size=8)
    t1 = m.fit(X, epochs=2, batch_size=8, mesh=mesh)
    np.testing.assert_allclose(t0.loss_history["training_loss"],
                               t1.loss_history["training_loss"], rtol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_shard_pixels_fused_kernel_interpret_matches():
    """The sharded path routes per-shard decodes through the SAME
    fused/XLA gate as every other training path; force the Pallas kernel
    (interpret mode on CPU, gate thresholds zeroed) and pin equality with
    the unsharded loss — the multi-chip analogue of the dryrun's
    fused-under-GSPMD check."""
    import pyroved_tpu.ops.spatial_decoder as sd
    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 8, 8))
    ref = iVAE((8, 8), 2, ["r", "t"], seed=0)
    shd = iVAE((8, 8), 2, ["r", "t"], seed=0)
    shard_pixels(shd, _pixel_mesh(4))
    l0, _ = _loss_and_grads(ref, (x,))
    old_interp, old_min = sd.INTERPRET, sd.FUSED_MIN_BNH
    sd.INTERPRET = True
    sd.FUSED_MIN_BNH = 0
    shd._fused = True  # platform gate is off on CPU; force the kernel
    try:
        l1, g1 = _loss_and_grads(shd, (x,))
    finally:
        sd.INTERPRET = old_interp
        sd.FUSED_MIN_BNH = old_min
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-4)
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(g1))


def test_pixel_chunks_composes_with_trainer_remat():
    X = np.random.RandomState(3).rand(20, 8, 8).astype(np.float32)
    m = iVAE((8, 8), 2, ["r"], pixel_chunks=2, seed=0)
    loader = init_dataloader(X, batch_size=10)
    tr = SVItrainer(m, remat=True)
    tr.step(loader)
    assert np.isfinite(tr.loss_history["training_loss"][0])


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_shard_pixels_flip_after_compile_retraces():
    """Enabling (or disabling) pixel sharding AFTER a trainer compiled
    must retrace its step functions — the pixel mode is a Python
    attribute the jit cache cannot see, so without a rebuild-gate entry
    the stale full-grid trace would keep running (and OOM exactly where
    sharding was meant to prevent it)."""
    X = np.random.RandomState(5).rand(30, 8, 8).astype(np.float32)
    m = iVAE((8, 8), 2, ["r"], seed=0)
    t = SVItrainer(m, seed=1)
    loader = init_dataloader(X, batch_size=10, seed=1)
    t.run(loader, 1)
    full_fn = t._train_epoch_jit
    assert t._built_gate[1][0] is None
    shard_pixels(m, _pixel_mesh(4))
    losses = t.run(loader, 1)
    assert np.isfinite(losses).all()
    assert t._train_epoch_jit is not full_fn  # retraced for the flip
    assert t._built_gate[1][0] == "shard"
    shard_pixels(m, None)
    t.run(loader, 1)
    assert t._built_gate[1][0] is None  # and back off again


def test_pixel_chunks_flip_after_compile_retraces():
    """Same staleness rule for the in-device variant: setting
    model.pixel_chunks after a compile must rebuild the step."""
    X = np.random.RandomState(6).rand(30, 8, 8).astype(np.float32)
    m = iVAE((8, 8), 2, ["r"], seed=0)
    t = SVItrainer(m, seed=1)
    loader = init_dataloader(X, batch_size=10, seed=1)
    t.run(loader, 1)
    assert t._built_gate[1][0] is None
    m.pixel_chunks = 4
    losses = t.run(loader, 1)
    assert np.isfinite(losses).all()
    assert t._built_gate[1][0] == "chunk"
