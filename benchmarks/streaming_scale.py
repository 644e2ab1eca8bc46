"""Streaming-at-scale benchmark (VERDICT r2 next-step #7): train the
flagship rVAE from a MEMMAPPED synthetic dataset larger than any sane
device residency, and measure what the streaming stack actually delivers.

Dataset: float32 [N, 28, 28] written once to a .npy memmap (default
N=1.4M -> ~4.4 GB; HBM on one v5e is 16 GB but the point is the
beyond-residency PATH, and the file never fully enters host RAM either).

Variants measured (same model, same batch size, steps/s over one pass):

  resident   device-resident scan-epoch path on a small slice (the upper
             bound the streaming path is judged against)
  resident_u8 the FULL dataset resident in HBM as uint8 (narrow-dtype
             residency, DataLoader(scale=1/255): the 4.4 GB-as-f32
             dataset occupies 1.1 GB on device; batches normalize inside
             the training scan) — out-of-core-class data at resident
             speed, one upload total
  sync       DataLoader(device_resident=False): gather_rows + upload per
             step, no overlap
  prefetch   same + utils.data.prefetch (GIL-releasing producer thread)
  chunked    DataLoader(stream_chunks=64): c-batch uploads + device scans
  chunked_u8 same from a uint8 memmap with on-device cast+scale
             (DataLoader(scale=1/255)) — 1/4 the wire bytes per batch
  chunked_bf16 same from the f32 source via store_dtype="bfloat16"
             (round 5): float-native data at 1/2 the wire bytes
  resident_bf16 the FULL f32-source dataset resident as bf16 (2.2 GB in
             HBM instead of 5.6), upcast inside the scan
  pipeline   native.BatchPipeline ring buffer, zero-copy consume
             (demoted round 5 — see PERFORMANCE.md)

Usage: python benchmarks/streaming_scale.py [--rows 1400000]
       [--steps 2000] [--file /tmp/pvt_stream.npy]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402

DATA_DIM = (28, 28)
BATCH = 200


def build_memmap(path: str, rows: int) -> np.ndarray:
    """Create (or reuse) the on-disk dataset; returns a read-only memmap."""
    if not os.path.exists(path):
        print(f"writing {rows} rows (~{rows * 784 * 4 / 1e9:.1f} GB) "
              f"to {path}", flush=True)
        out = np.lib.format.open_memmap(
            path, mode="w+", dtype=np.float32, shape=(rows,) + DATA_DIM)
        rng = np.random.default_rng(0)
        chunk = 50_000
        for s in range(0, rows, chunk):
            e = min(s + chunk, rows)
            out[s:e] = rng.uniform(0, 1, (e - s,) + DATA_DIM).astype(np.float32)
        out.flush()
        del out
    return np.load(path, mmap_mode="r")


def _steps_per_sec(trainer, stream, n_steps):
    """Drive the trainer's streaming path over ``stream`` for n_steps."""
    import itertools
    t0 = time.perf_counter()
    trainer.train(itertools.islice(stream, n_steps))
    return n_steps / (time.perf_counter() - t0)


def batches_sync(data, n_steps, seed=0):
    from pyroved_tpu.native import gather_rows
    from pyroved_tpu.native import shuffle_indices
    order = shuffle_indices(data.shape[0], seed, 0)
    for i in range(n_steps):
        sl = order[i * BATCH:(i + 1) * BATCH]
        yield (gather_rows(np.asarray(data, copy=False), sl),)


def batches_pipeline(pipe, n_steps):
    for _ in range(n_steps):
        yield (pipe.next(copy=False),)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_400_000)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--file", default="/tmp/pvt_stream.npy")
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()

    data = build_memmap(args.file, args.rows)
    u8_path = args.file.replace(".npy", "_u8.npy")
    if not os.path.exists(u8_path):
        out = np.lib.format.open_memmap(
            u8_path, mode="w+", dtype=np.uint8, shape=(args.rows,) + DATA_DIM)
        rng = np.random.default_rng(0)
        for s in range(0, args.rows, 50_000):
            e = min(s + 50_000, args.rows)
            out[s:e] = rng.integers(0, 256, (e - s,) + DATA_DIM, dtype=np.uint8)
        out.flush()
        del out
    data_u8 = np.load(u8_path, mmap_mode="r")
    results = {}

    # narrow-dtype residency: upload the FULL uint8 dataset FIRST, before
    # any training epoch can trigger the transfer-degradation pathology —
    # on a healthy wire this is the one H2D the whole run needs
    loader_u8r = pv.utils.init_dataloader(data_u8, batch_size=BATCH,
                                          scale=1.0 / 255.0)
    t0 = time.perf_counter()
    loader_u8r.device_arrays[0].block_until_ready()
    up = time.perf_counter() - t0
    print(f"  (resident_u8 one-time upload: {args.rows * 784 / 1e9:.2f} GB "
          f"uint8 in {up:.1f}s = {args.rows * 784 / 1e9 / up:.2f} GB/s)",
          flush=True)

    # resident reference on a 10k slice (flagship-scale residency)
    model = pv.models.iVAE(DATA_DIM, latent_dim=2, invariances=["r"], seed=1)
    small = np.asarray(data[:10_000])
    loader = pv.utils.init_dataloader(small, batch_size=BATCH)
    trainer = pv.trainers.SVItrainer(model)
    trainer.train(loader)  # compile
    t0 = time.perf_counter()
    trainer.train(loader)
    results["resident"] = len(loader) / (time.perf_counter() - t0)

    def fresh():
        m = pv.models.iVAE(DATA_DIM, latent_dim=2, invariances=["r"], seed=1)
        return pv.trainers.SVItrainer(m)

    # full-dataset narrow residency: a 7000-step epoch gathered from the
    # resident uint8 array, normalized inside the scan — zero wire traffic
    tr = fresh()
    tr.train(loader_u8r)  # compile (first epoch)
    t0 = time.perf_counter()
    tr.train(loader_u8r)
    results["resident_u8"] = loader_u8r.num_batches / (time.perf_counter() - t0)
    print(f"  (resident_u8: {results['resident_u8']:.1f} steps/s over the "
          f"full {args.rows}-row epoch)", flush=True)

    tr = fresh()
    _steps_per_sec(tr, batches_sync(data, 60), 50)  # compile streaming step
    results["sync"] = _steps_per_sec(tr, batches_sync(data, args.steps),
                                     args.steps)

    tr = fresh()
    stream = pv.utils.data.prefetch(batches_sync(data, args.steps + 60,
                                                 seed=1), size=4)
    _steps_per_sec(tr, stream, 50)
    results["prefetch"] = _steps_per_sec(tr, stream, args.steps)

    # chunked streaming: c batches per upload, scanned on device in one
    # dispatch (DataLoader(stream_chunks=c)) — the tunnel-latency answer
    tr = fresh()
    loader = pv.utils.init_dataloader(
        data, batch_size=BATCH, device_resident=False, stream_chunks=64)
    t0 = time.perf_counter()
    tr.train(loader)  # first epoch includes the two chunk compiles
    full_epoch = time.perf_counter() - t0
    t0 = time.perf_counter()
    tr.train(loader)
    results["chunked"] = loader.num_batches / (time.perf_counter() - t0)
    print(f"  (chunked first epoch incl. compiles: {full_epoch:.1f}s)")

    # chunked streaming from a UINT8 memmap with on-device cast+scale
    # (DataLoader(scale=1/255)): the wire carries 1/4 the bytes per batch —
    # the round-4 mitigation for wire-bound transports (see the
    # transfer-degradation verdict in docs/PERFORMANCE.md)
    tr = fresh()
    loader = pv.utils.init_dataloader(
        data_u8, batch_size=BATCH, device_resident=False, stream_chunks=64,
        scale=1.0 / 255.0)
    tr.train(loader)  # compile + trigger the degradation like every variant
    t0 = time.perf_counter()
    tr.train(loader)
    results["chunked_u8"] = loader.num_batches / (time.perf_counter() - t0)

    # chunked streaming with the f32 source narrowed to bf16
    # (DataLoader(store_dtype="bfloat16"), round 5): float-native data at
    # HALF the wire bytes per batch. NOTE store_dtype casts at loader
    # construction — the bf16 copy (~2.2 GB here) materializes host-side.
    tr = fresh()
    t0 = time.perf_counter()
    loader = pv.utils.init_dataloader(
        np.asarray(data, copy=False), batch_size=BATCH,
        device_resident=False, stream_chunks=64, store_dtype="bfloat16")
    print(f"  (bf16 host cast of the {args.rows * 784 * 4 / 1e9:.1f} GB "
          f"source: {time.perf_counter() - t0:.1f}s)", flush=True)
    tr.train(loader)
    t0 = time.perf_counter()
    tr.train(loader)
    results["chunked_bf16"] = loader.num_batches / (time.perf_counter() - t0)

    # FULL dataset resident as bf16 (the float-native analogue of
    # resident_u8): 2.2 GB in HBM instead of 5.6, upcast inside the scan
    loader_bf = pv.utils.init_dataloader(
        np.asarray(data, copy=False), batch_size=BATCH,
        store_dtype="bfloat16")
    t0 = time.perf_counter()
    loader_bf.device_arrays[0].block_until_ready()
    print(f"  (resident_bf16 one-time upload: {args.rows * 784 * 2 / 1e9:.2f}"
          f" GB in {time.perf_counter() - t0:.1f}s)", flush=True)
    tr = fresh()
    tr.train(loader_bf)  # compile
    t0 = time.perf_counter()
    tr.train(loader_bf)
    results["resident_bf16"] = loader_bf.num_batches / (time.perf_counter() - t0)

    pipe = pv.native.BatchPipeline(np.asarray(data, copy=False), BATCH, seed=2)
    try:
        tr = fresh()
        _steps_per_sec(tr, batches_pipeline(pipe, 60), 50)
        results["pipeline"] = _steps_per_sec(
            tr, batches_pipeline(pipe, args.steps), args.steps)
    finally:
        pipe.close()

    print(f"\nstreaming-at-scale ({args.rows} rows, "
          f"{args.rows * 784 * 4 / 1e9:.1f} GB memmap, bs={BATCH}, "
          f"{args.steps} timed steps):")
    for k, v in results.items():
        rel = v / results["resident"]
        print(f"  {k:9s} {v:7.1f} steps/s ({v * BATCH:8.0f} img/s) "
              f"= {rel:5.1%} of resident")
    return 0


if __name__ == "__main__":
    sys.exit(main())
