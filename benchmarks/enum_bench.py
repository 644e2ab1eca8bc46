"""Enumerated-family (discrete-latent) benchmark — jiVAE K-way exact
enumeration and ssiVAE interleaved semi-supervised training
(VERDICT r2 next-step #8).

Measures steps/s at the flagship scale (28x28, bs=200) per family and can
capture a profiler trace for the hot-op breakdown:

    python benchmarks/enum_bench.py                 # all families
    python benchmarks/enum_bench.py --profile jivae # + trace

jiVAE's "step" is one enumerated update (decode K branches); ssiVAE's is
one interleaved unlabeled+labeled pair through auxSVItrainer.run.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402

DATA = (28, 28)
BATCH = 200
N_DATA = 2000
K = 10
EPOCHS = 40  # x10 steps


def _imgs(n, seed=0):
    return np.random.default_rng(seed).uniform(
        0, 1, (n,) + DATA).astype(np.float32)


def bench_jivae(profile=False):
    m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                        invariances=["r"], seed=1)
    loader = pv.utils.init_dataloader(_imgs(N_DATA), batch_size=BATCH)
    t = pv.trainers.SVItrainer(m)
    nb = len(loader)
    t.run(loader, EPOCHS)  # compile + warm (same trip count as timed)
    if profile:
        import jax
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profiles", "enum_jivae")
        with jax.profiler.trace(out):
            t.run(loader, EPOCHS)
        print(f"  trace -> {out}")
    t0 = time.perf_counter()
    losses = t.run(loader, EPOCHS)
    sps = EPOCHS * nb / (time.perf_counter() - t0)
    print(f"jiVAE (K={K})    {sps:7.1f} steps/s  loss {losses[-1]:.2f}",
          flush=True)
    return sps


def bench_ssivae(profile=False):
    m = pv.models.ssiVAE(DATA, latent_dim=2, num_classes=K,
                         invariances=["r"], seed=1)
    lu = pv.utils.init_dataloader(_imgs(N_DATA), batch_size=BATCH)
    ys = np.eye(K, dtype=np.float32)[
        np.random.default_rng(1).integers(0, K, 400)]
    ls = pv.utils.init_dataloader(_imgs(400, seed=2), ys, batch_size=BATCH)
    t = pv.trainers.auxSVItrainer(m)
    nb = len(lu)
    t.run(lu, ls, EPOCHS)
    if profile:
        import jax
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profiles", "enum_ssivae")
        with jax.profiler.trace(out):
            t.run(lu, ls, EPOCHS)
        print(f"  trace -> {out}")
    t0 = time.perf_counter()
    losses = t.run(lu, ls, EPOCHS)
    sps = EPOCHS * nb / (time.perf_counter() - t0)
    print(f"ssiVAE (K={K})   {sps:7.1f} interleaved steps/s  "
          f"loss {losses[-1]:.2f}", flush=True)
    return sps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=["jivae", "ssivae"])
    ap.add_argument("--profile", action="store_true")
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    for fam in args.families:
        {"jivae": bench_jivae, "ssivae": bench_ssivae}[fam](args.profile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
