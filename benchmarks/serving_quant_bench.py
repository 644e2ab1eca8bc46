"""Quantized serving A/B: f32 export vs export_model(quantize="int8").

Measures artifact size, encode/decode throughput (flagship rVAE, batch
256, best of 3x20 calls — the PERFORMANCE.md "Serving throughput"
methodology), and the quality delta (encode latent deviation, decode
pixel deviation) on one chip.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402
from pyroved_tpu.serving import ServedModel, export_model  # noqa: E402

BATCH = 256


def throughput(fn, *args, calls=20, reps=3):
    out = fn(*args)  # warm/compile
    np.asarray(out[0] if isinstance(out, tuple) else out)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(calls):
            out = fn(*args)
        np.asarray(out[0] if isinstance(out, tuple) else out)
        dt = time.perf_counter() - t0
        best = max(best, calls * BATCH / dt)
    return best


def main():
    pv.utils.profiling.enable_compilation_cache()
    model = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"])
    # a couple of training epochs so the weights are not at init
    X = np.random.default_rng(0).uniform(0, 1, (2000, 28, 28)).astype(np.float32)
    tr = pv.trainers.SVItrainer(model)
    tr.run(pv.utils.init_dataloader(X, batch_size=200), 5)

    p32, p8 = "/tmp/srv_f32.pvtx", "/tmp/srv_int8.pvtx"
    export_model(model, p32, batch_size=BATCH)
    export_model(model, p8, batch_size=BATCH, quantize="int8")
    s32, s8 = os.path.getsize(p32), os.path.getsize(p8)
    print(f"artifact size: f32 {s32 / 1e3:.1f} kB, int8 {s8 / 1e3:.1f} kB "
          f"({s32 / s8:.2f}x smaller)", flush=True)

    m32, m8 = ServedModel(p32), ServedModel(p8)
    x = X[:BATCH]
    z = np.random.default_rng(1).normal(size=(BATCH, 2)).astype(np.float32)

    # quality
    z32 = np.asarray(m32.encode(x)[0])
    z8 = np.asarray(m8.encode(x)[0])
    d32 = np.asarray(m32.decode(z))
    d8 = np.asarray(m8.decode(z))
    rel_enc = np.abs(z8 - z32).max() / max(np.abs(z32).max(), 1e-12)
    rel_dec = np.abs(d8 - d32).max() / max(np.abs(d32).max(), 1e-12)
    print(f"quality: encode max rel dev {rel_enc:.4%}, "
          f"decode max rel dev {rel_dec:.4%}", flush=True)

    for name, sm in (("f32 ", m32), ("int8", m8)):
        enc = throughput(sm.encode, x)
        dec = throughput(sm.decode, z)
        print(f"{name}: {enc / 1e3:.1f}k encodes/s, {dec / 1e3:.1f}k decodes/s",
              flush=True)


if __name__ == "__main__":
    main()
