"""bf16 wire + residency for FLOAT sources (VERDICT r4 item 3) and the
round-4 ADVICE guard fixes.

``DataLoader(store_dtype="bfloat16")`` extends the narrow-dtype machinery
(``scale=`` for integer sources) to float-native datasets: the host copy,
the wire, and the device residency all carry 2 bytes/element, with the f32
upcast fused into the training scan.
"""
import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from pyroved_tpu.models import iVAE, ssiVAE
from pyroved_tpu.trainers import SVItrainer
from pyroved_tpu.utils.data import DataLoader, init_dataloader


def _train(loader, epochs=2, seed=3):
    m = iVAE((8, 8), 2, ["r"], seed=0)
    tr = SVItrainer(m, seed=seed)
    tr.run(loader, epochs)
    return tr.loss_history["training_loss"], m.params


def test_store_dtype_bf16_matches_precast_training():
    """Training via store_dtype="bfloat16" must be IDENTICAL to training on
    the pre-cast (bf16 -> f32) data: same stored values, same upcast."""
    X = np.random.RandomState(0).rand(60, 8, 8).astype(np.float32)
    X_pre = np.asarray(X.astype(ml_dtypes.bfloat16), np.float32)
    l_ref, p_ref = _train(init_dataloader(X_pre, batch_size=20))
    l_bf, p_bf = _train(init_dataloader(X, batch_size=20,
                                        store_dtype="bfloat16"))
    np.testing.assert_allclose(l_ref, l_bf, rtol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_bf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6)


def test_store_dtype_residency_is_narrow():
    X = np.random.RandomState(1).rand(30, 8, 8).astype(np.float32)
    dl = init_dataloader(X, batch_size=10, store_dtype="bfloat16")
    assert dl.device_arrays[0].dtype == jnp.bfloat16
    assert dl.scale == (1.0,)
    # iteration still yields normalized f32 batches
    (b,) = next(iter(dl))
    assert b.dtype == jnp.float32


def test_store_dtype_streaming_paths_match():
    X = np.random.RandomState(2).rand(50, 8, 8).astype(np.float32)
    X_pre = np.asarray(X.astype(ml_dtypes.bfloat16), np.float32)
    l_ref, _ = _train(init_dataloader(X_pre, batch_size=10))
    l_str, _ = _train(init_dataloader(X, batch_size=10,
                                      store_dtype="bfloat16",
                                      device_resident=False))
    l_chk, _ = _train(init_dataloader(X, batch_size=10,
                                      store_dtype="bfloat16",
                                      device_resident=False,
                                      stream_chunks=2))
    np.testing.assert_allclose(l_ref, l_str, rtol=2e-5)
    np.testing.assert_allclose(l_ref, l_chk, rtol=2e-5)


def test_store_dtype_composes_with_scale():
    """An f32 source that ALSO needs normalizing: store_dtype narrows it,
    scale still applies on device."""
    X = (np.random.RandomState(3).rand(40, 8, 8) * 255).astype(np.float32)
    X_pre = np.asarray(X.astype(ml_dtypes.bfloat16), np.float32) / 255.0
    l_ref, _ = _train(init_dataloader(X_pre, batch_size=10))
    l_bf, _ = _train(init_dataloader(X, batch_size=10, scale=1 / 255.0,
                                     store_dtype="bfloat16"))
    np.testing.assert_allclose(l_ref, l_bf, rtol=2e-5)


def test_store_dtype_leaves_labels_untouched():
    X = np.random.RandomState(4).rand(30, 8, 8).astype(np.float32)
    y = np.arange(30, dtype=np.int64) % 3
    dl = DataLoader(X, y, batch_size=10, store_dtype="bfloat16")
    assert dl.device_arrays[0].dtype == jnp.bfloat16
    assert dl.device_arrays[1].dtype != jnp.bfloat16


def test_store_dtype_validation():
    X = np.random.RandomState(5).rand(10, 4).astype(np.float32)
    with pytest.raises(ValueError, match="floating"):
        DataLoader(X, store_dtype="int8")
    with pytest.raises(ValueError, match="entries"):
        DataLoader(X, store_dtype=("bfloat16", None))
    # float16 accepted
    dl = DataLoader(X, store_dtype="float16")
    assert dl.device_arrays[0].dtype == jnp.float16


# ---------------------------------------------------------------------------
# ADVICE r4 guard fixes
# ---------------------------------------------------------------------------
def test_fit_rejects_integer_lists():
    """A Python list of ints must not bypass the raw-integer guard."""
    m = iVAE((4,), 2, ["t"], seed=0)
    rows = [[int(v) for v in range(4)] for _ in range(8)]
    with pytest.raises(ValueError, match="data_scale"):
        m.fit(rows, epochs=1, batch_size=4)


def test_fit_rejects_integer_test_data():
    """test_data gets the same raw-integer guard as X."""
    X = np.random.RandomState(6).rand(20, 4).astype(np.float32)
    t8 = (np.random.RandomState(7).rand(10, 4) * 255).astype(np.uint8)
    m = iVAE((4,), 2, ["t"], seed=0)
    with pytest.raises(ValueError, match="data_scale"):
        m.fit(X, epochs=1, batch_size=5, test_data=t8)


def test_ssivae_fit_tuple_data_scale_usable():
    """baseVAE.fit documents tuple data_scale; the semi-supervised paths
    must re-fit it per loader instead of erroring on entry counts."""
    rs = np.random.RandomState(8)
    u8 = (rs.rand(30, 6, 6) * 255).astype(np.uint8)
    u8_l = (rs.rand(12, 6, 6) * 255).astype(np.uint8)
    y = np.arange(12) % 3
    m = ssiVAE((6, 6), 2, 3, ["r"], seed=0)
    tr = m.fit(u8, (u8_l, y), epochs=1, batch_size=6,
               data_scale=(1 / 255.0, None))
    assert np.isfinite(tr.history["training_loss"][-1])


def test_store_dtype_scalar_keeps_float_targets_full_precision():
    """A scalar store_dtype narrows the FIRST (signal) array only — float
    regression targets must keep full precision (same convention as a
    scalar scale=)."""
    X = np.random.RandomState(6).rand(30, 8, 8).astype(np.float32)
    y = np.random.RandomState(7).rand(30).astype(np.float32)
    dl = DataLoader(X, y, batch_size=10, store_dtype="bfloat16")
    assert dl.device_arrays[0].dtype == jnp.bfloat16
    assert dl.device_arrays[1].dtype == jnp.float32
    # per-array tuple form still narrows targets when asked explicitly
    dl2 = DataLoader(X, y, batch_size=10,
                     store_dtype=("bfloat16", "bfloat16"))
    assert dl2.device_arrays[1].dtype == jnp.bfloat16


def test_store_dtype_scalar_rejects_integer_signal():
    X = (np.random.RandomState(8).rand(20, 4) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="signal"):
        DataLoader(X, batch_size=10, store_dtype="bfloat16")
