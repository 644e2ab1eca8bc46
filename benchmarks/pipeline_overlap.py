"""BatchPipeline prove-or-demote harness (VERDICT r4 item 5).

Every committed measurement of ``native.BatchPipeline`` so far was taken on
the tunneled TPU, where the degraded H2D transport bounds every streaming
variant — batch ASSEMBLY is never the bottleneck there, so a GIL-free
assembly/compute overlap cannot show. This harness constructs the regime
the pipeline was built for: a HEALTHY transport (the forced-CPU platform —
"upload" is a memcpy at memory-bandwidth rates) where per-step gather time
is comparable to per-step compute time, so overlap has something to hide.

    sync      numpy/C++ gather -> step, serial (the DataLoader
              device_resident=False shape)
    prefetch  sync + utils.data.prefetch (Python producer thread; the C++
              gather releases the GIL)
    pipeline  native.BatchPipeline ring (C++ worker thread pre-gathers into
              ring slots; zero-copy consume)

Also prints the standalone gather time and step time: sync should land near
(gather + step); an overlapping variant near max(gather, step).

The model is deliberately small (vanilla iVAE, hidden [16]): per-byte-
gathered compute is ~6*hidden FLOP/element, so hidden=128 buries assembly
under compute on any device — hidden=16 puts the two at the same order,
which is exactly the regime a production pipeline (big data rows, cheap
per-row model, fast accelerator) presents.

Usage: JAX_PLATFORMS=cpu python benchmarks/pipeline_overlap.py
       [--rows 150000] [--dim 64] [--steps 300]
"""
import argparse
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pyroved_tpu as pv  # noqa: E402

BATCH = 512


def _steps_per_sec(trainer, stream, n_steps):
    t0 = time.perf_counter()
    trainer.train(itertools.islice(stream, n_steps))
    return n_steps / (time.perf_counter() - t0)


def batches_sync(data, n_steps, seed=0):
    from pyroved_tpu.native import gather_rows, shuffle_indices
    n = data.shape[0]
    order = shuffle_indices(n, seed, 0)
    steps_per_epoch = n // BATCH
    for i in range(n_steps):
        j = i % steps_per_epoch
        if i and j == 0:
            order = shuffle_indices(n, seed, i // steps_per_epoch)
        yield (gather_rows(data, order[j * BATCH:(j + 1) * BATCH]),)


def batches_pipeline(pipe, n_steps):
    for _ in range(n_steps):
        yield (pipe.next(copy=False),)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=150_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args(argv)
    dd = (args.dim, args.dim)
    # ~rows * dim^2 * 4 bytes (150k x 64x64 = 2.4 GB): gathers run from
    # main memory, not cache — the realistic out-of-core assembly cost.
    # Fill chunk-wise with random32 bit tricks (rng.uniform on 2.4 GB is
    # minutes; this is seconds).
    data = np.empty((args.rows,) + dd, np.float32)
    rng = np.random.default_rng(0)
    for s in range(0, args.rows, 20_000):
        e = min(s + 20_000, args.rows)
        data[s:e] = rng.random((e - s,) + dd, dtype=np.float32)

    def fresh():
        m = pv.models.iVAE(dd, latent_dim=2, invariances=None,
                           hidden_dim_e=(16,), hidden_dim_d=(16,), seed=1)
        return pv.trainers.SVItrainer(m)

    # -- standalone costs ---------------------------------------------------
    from pyroved_tpu.native import gather_rows, shuffle_indices
    order = shuffle_indices(args.rows, 0, 0)
    for _ in range(5):
        gather_rows(data, order[:BATCH])
    t0 = time.perf_counter()
    for i in range(200):
        gather_rows(data, order[i * BATCH:(i + 1) * BATCH])
    t_gather = (time.perf_counter() - t0) / 200

    tr = fresh()
    batch = (gather_rows(data, order[:BATCH]),)
    _steps_per_sec(tr, itertools.repeat(batch), 50)  # compile + warm
    t0 = time.perf_counter()
    _steps_per_sec(tr, itertools.repeat(batch), 200)
    t_step = (time.perf_counter() - t0) / 200
    print(f"standalone: gather {t_gather * 1e3:.2f} ms/batch, "
          f"step {t_step * 1e3:.2f} ms (serial bound "
          f"{1 / (t_gather + t_step):.1f} steps/s, overlap bound "
          f"{1 / max(t_gather, t_step):.1f})", flush=True)

    results = {}
    tr = fresh()
    _steps_per_sec(tr, batches_sync(data, 60), 50)
    results["sync"] = _steps_per_sec(tr, batches_sync(data, args.steps),
                                     args.steps)

    tr = fresh()
    stream = pv.utils.data.prefetch(
        batches_sync(data, args.steps + 60, seed=1), size=4)
    _steps_per_sec(tr, stream, 50)
    results["prefetch"] = _steps_per_sec(tr, stream, args.steps)

    pipe = pv.native.BatchPipeline(data, BATCH, seed=2)
    try:
        tr = fresh()
        _steps_per_sec(tr, batches_pipeline(pipe, 60), 50)
        results["pipeline"] = _steps_per_sec(
            tr, batches_pipeline(pipe, args.steps), args.steps)
    finally:
        pipe.close()

    print(f"\npipeline-overlap ({args.rows} rows x {dd}, bs={BATCH}, "
          f"{args.steps} timed steps, healthy transport):")
    for k, v in results.items():
        print(f"  {k:9s} {v:7.1f} steps/s ({v / results['sync']:.2f}x sync)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
