"""Out-of-core training: a dataset that never fully enters device memory.

Builds a memmapped on-disk dataset (600 MB here; the same path handles
arbitrarily large files), then trains the flagship rVAE from it with
``DataLoader(device_resident=False, stream_chunks=64)``: the trainer
uploads 64 batches at a time and scans each chunk on device in ONE
dispatch. The parameter trajectory matches device-resident training to
last-ulp f32 tolerance (same shuffle, same RNG chain) — switching a
workflow between resident and out-of-core changes throughput, never the
model.

Before reaching for streaming at all, check the narrow-residency ladder
(docs/PERFORMANCE.md "Streaming at scale"): integer sources ride
``DataLoader(scale=1/255)`` (uint8 in HBM = 1/4 the footprint) and float
sources ``store_dtype="bfloat16"`` (1/2) — a "4.4 GB" dataset can
usually just be resident, training ~28x faster than any streaming
variant on this runtime. Streaming is for data that exceeds even the
narrowed residency.

Run: python examples/out_of_core_training.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402

DATA_PATH = "/tmp/pvt_out_of_core_example.npy"
ROWS = 200_000  # ~600 MB of 28x28 f32


def main():
    pv.utils.profiling.enable_compilation_cache()
    if not os.path.exists(DATA_PATH):
        print(f"writing {ROWS} rows (~{ROWS * 784 * 4 / 1e9:.1f} GB) "
              f"to {DATA_PATH} ...")
        out = np.lib.format.open_memmap(DATA_PATH, mode="w+",
                                        dtype=np.float32,
                                        shape=(ROWS, 28, 28))
        rng = np.random.default_rng(0)
        for s in range(0, ROWS, 50_000):
            e = min(s + 50_000, ROWS)
            out[s:e] = rng.uniform(0, 1, (e - s, 28, 28)).astype(np.float32)
        out.flush()
        del out

    data = np.load(DATA_PATH, mmap_mode="r")  # never fully in host RAM
    model = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"], seed=1)
    loader = pv.utils.init_dataloader(data, batch_size=200,
                                      device_resident=False, stream_chunks=64)
    trainer = pv.trainers.SVItrainer(model)
    t0 = time.perf_counter()
    for epoch in range(2):
        loss = trainer.train(loader)
        print(f"epoch {epoch + 1}: loss {loss:.4f} "
              f"({time.perf_counter() - t0:.1f}s elapsed)")
    assert np.isfinite(loss)
    z_loc, z_scale = model.encode(np.asarray(data[:512]))
    print(f"encode on a slice: {z_loc.shape}; trained out-of-core OK")


if __name__ == "__main__":
    main()
