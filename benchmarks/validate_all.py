"""One-shot integration validation: every model family, trainer, and
subsystem exercised briefly end-to-end. Prints one PASS/FAIL line each and
exits nonzero on any failure.

Runs on whatever backend JAX selects (TPU when available; force CPU with
jax.config). Useful as a quick health check between rounds:
    python benchmarks/validate_all.py
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import pyroved_tpu as pv  # noqa: E402

pv.utils.profiling.enable_compilation_cache()

RESULTS = []


def check(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS.append((name, True, ""))
                print(f"PASS {name}", flush=True)
            except Exception as e:  # noqa: BLE001
                RESULTS.append((name, False, str(e)))
                print(f"FAIL {name}: {e}", flush=True)
                traceback.print_exc()
        return run
    return deco


def _imgs(n=64, d=12):
    rng = np.random.default_rng(0)
    return rng.uniform(0, 1, (n, d, d)).astype(np.float32)


@check("iVAE train/encode/decode/manifold")
def c1():
    m = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"])
    t = m.fit(_imgs(), epochs=2, batch_size=16)
    assert t.loss_history["training_loss"][-1] < t.loss_history["training_loss"][0] * 1.5
    z, s = m.encode(_imgs(8))
    assert z.shape == (8, 3)
    assert m.decode(np.zeros((2, 2), np.float32)).shape == (2, 12, 12)
    assert m.manifold2d(3, plot=False).shape == (9, 12, 12)


@check("jiVAE enumeration + traversal")
def c2():
    m = pv.models.jiVAE((12, 12), latent_dim=2, discrete_dim=3, invariances=["r"])
    t = m.fit(_imgs(), epochs=2, batch_size=16, scale_factor=[2.0, 1.0])
    assert np.isfinite(t.loss_history["training_loss"][-1])
    _, _, cls = m.encode(_imgs(8))
    assert cls.shape == (8,)
    assert m.manifold_traversal(3, 0, plot=False).shape == (9, 12, 12)


@check("ssiVAE semi-supervised classification")
def c3():
    rng = np.random.default_rng(1)
    m = pv.models.ssiVAE((12, 12), latent_dim=2, num_classes=2)
    t = m.fit(_imgs(48), (_imgs(16), rng.integers(0, 2, 16)), epochs=2,
              batch_size=8)
    assert 0.0 <= t.history["test"][-1] <= 1.0


@check("ss_reg_iVAE semi-supervised regression + SWA")
def c4():
    rng = np.random.default_rng(2)
    m = pv.models.ss_reg_iVAE((12, 12), latent_dim=2, reg_dim=1)
    t = m.fit(_imgs(32), (_imgs(16), rng.normal(size=16).astype(np.float32)),
              epochs=2, batch_size=8)
    t.save_running_weights("encoder_y")
    t.save_running_weights("encoder_y")
    t.average_weights("encoder_y")
    assert np.isfinite(t.history["test"][-1])


@check("VED im2spec + predict")
def c5():
    rng = np.random.default_rng(3)
    X = rng.uniform(0, 1, (32, 16, 16)).astype(np.float32)
    Y = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    m = pv.models.VED((16, 16), (32,), latent_dim=2,
                      hidden_dim_e=((4,), (8,)), hidden_dim_d=((8,), (4,)))
    t = m.fit(X, Y, epochs=2, batch_size=16)
    assert np.isfinite(t.loss_history["training_loss"][-1])
    mean, sd = m.predict(X[:4], num_samples=5)
    assert mean.shape == (4, 32)


@check("checkpoint save/resume")
def c6():
    import tempfile
    m = pv.models.iVAE((12, 12), latent_dim=2)
    tr = pv.trainers.SVItrainer(m)
    loader = pv.utils.init_dataloader(_imgs(32), batch_size=16)
    tr.step(loader)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.pkl")
        pv.utils.save_checkpoint(path, m, tr)
        m2 = pv.models.iVAE((12, 12), latent_dim=2, seed=5)
        tr2 = pv.trainers.SVItrainer(m2)
        pv.utils.load_checkpoint(path, m2, tr2)
        assert tr2.current_epoch == 1


@check("GP on latent")
def c7():
    m = pv.models.iVAE((12, 12), latent_dim=2)
    (z, zd), preds = m.predict_on_latent(
        _imgs(16), np.random.default_rng(0).normal(size=16).astype(np.float32),
        gp_iterations=2, d=3)
    assert np.asarray(preds).shape == (9,)


@check("serving export/load")
def c8():
    import tempfile
    m = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.pvtx")
        pv.serving.export_model(m, path, batch_size=8)
        served = pv.serving.ServedModel(path)
        z, s = served.encode(_imgs(5))
        assert z.shape == (5, 3)


@check("symbolic-batch serving")
def c9():
    import tempfile
    m = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sym.pvtx")
        pv.serving.export_model(m, path)  # symbolic batch dim
        served = pv.serving.ServedModel(path)
        for n in (3, 10):
            z, s = served.encode(_imgs(n))
            assert z.shape == (n, 3)


@check("pixel-partitioned training (pixel_chunks) matches full-grid")
def c11():
    x = _imgs(48)
    a = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"], seed=0)
    b = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"], seed=0,
                       pixel_chunks=3)
    ta = a.fit(x, epochs=2, batch_size=16)
    tb = b.fit(x, epochs=2, batch_size=16)
    np.testing.assert_allclose(ta.loss_history["training_loss"],
                               tb.loss_history["training_loss"], rtol=5e-4)


@check("narrow data paths (uint8 scale= and bf16 store_dtype=)")
def c12():
    rng = np.random.default_rng(3)
    u8 = (rng.random((48, 12, 12)) * 255).astype(np.uint8)
    m = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"], seed=0)
    t = m.fit(u8, epochs=2, batch_size=16, data_scale=1 / 255.0)
    assert np.isfinite(t.loss_history["training_loss"][-1])
    f32 = rng.random((48, 12, 12)).astype(np.float32)
    dl = pv.utils.init_dataloader(f32, batch_size=16, store_dtype="bfloat16")
    m2 = pv.models.iVAE((12, 12), latent_dim=2, invariances=["r"], seed=0)
    t2 = m2.fit(dl, epochs=2, batch_size=16)
    assert np.isfinite(t2.loss_history["training_loss"][-1])


@check("enum_schedule (exact-early -> topk-late)")
def c13():
    m = pv.models.jiVAE((12, 12), latent_dim=2, discrete_dim=4,
                        invariances=["r"], enum_topk=2, seed=0)
    t = m.fit(_imgs(48), epochs=4, batch_size=16, enum_schedule=2)
    assert len(t.loss_history["training_loss"]) == 4
    assert all(np.isfinite(t.loss_history["training_loss"]))
    assert m.enum_topk == 2


@check("self-arming blocked validations (auto-skip without pyro/data)")
def c10():
    # Both scripts must exit 0 whether armed (data/pyro present) or not.
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    for script in ("pyro_parity.py", "real_anchors.py"):
        r = subprocess.run([sys.executable, os.path.join(here, script),
                            "--epochs", "2"], capture_output=True, text=True,
                           timeout=1200)
        tail = (r.stdout + r.stderr).strip().splitlines()[-3:]
        assert r.returncode == 0, f"{script} rc={r.returncode}: {tail}"
        print(f"  {script}: {tail[-1] if tail else '(no output)'}")


if __name__ == "__main__":
    for fn in (c1, c2, c3, c4, c5, c6, c7, c8, c9, c11, c12, c13, c10):
        fn()
    failed = [n for n, ok, _ in RESULTS if not ok]
    print(f"\n{len(RESULTS) - len(failed)}/{len(RESULTS)} checks passed")
    sys.exit(1 if failed else 0)
