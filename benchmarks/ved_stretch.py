"""VED stretch-config benchmark (BASELINE.json: 256x256 inputs -> 2048
spectra, the largest spatial config) — the harness behind the VED rows in
docs/PERFORMANCE.md.

Measures fused-run steps/s for one or more (compute_dtype, pool) variants
so conv-path experiments are timed identically:

    python benchmarks/ved_stretch.py                 # default variant set
    python benchmarks/ved_stretch.py f32:max bf16:avg bf16:stride
    python benchmarks/ved_stretch.py --profile bf16:max   # + profiler trace

Each variant trains EPOCHS fused epochs on the same synthetic data and
reports steps/s from the post-warmup run; with --check it also trains a
small real convergence run so model-changing pool modes show their loss.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402

IN_DIM, OUT_DIM = (256, 256), (2048,)
BATCH, N_DATA = 16, 256
EPOCHS = 8  # x16 steps/epoch


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (N_DATA,) + IN_DIM).astype(np.float32)
    y = rng.uniform(0, 1, (N_DATA,) + OUT_DIM).astype(np.float32)
    return x, y


def run_variant(tag: str, profile: bool = False) -> float:
    # tag grammar: dtype:pool[:literal] — the optional third element
    # restores the literal reference upsampler order (conv after resize)
    # for A/B-ing the conv_first rewrite on identical timing.
    parts = tag.split(":")
    cd, pool = parts[0], parts[1]
    conv_first = "literal" not in parts[2:]
    cd = {"f32": "float32", "bf16": "bfloat16"}.get(cd, cd)
    x, y = make_data()
    model = pv.models.VED(IN_DIM, OUT_DIM, compute_dtype=cd, pool=pool,
                          seed=1, conv_first=conv_first)
    loader = pv.utils.init_dataloader(x, y, batch_size=BATCH)
    trainer = pv.trainers.SVItrainer(model)
    nb = len(loader)
    # warm with the SAME epoch count (a fused run compiles per trip count;
    # tunneled compiles cost minutes, so don't pay for a second shape)
    trainer.run(loader, EPOCHS, scale_factor=4)
    if profile:
        import jax
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "profiles", f"ved_{tag.replace(':', '_')}")
        with jax.profiler.trace(outdir):
            trainer.run(loader, EPOCHS, scale_factor=4)
        print(f"  trace -> {outdir}")
    t0 = time.perf_counter()
    losses = trainer.run(loader, EPOCHS, scale_factor=4)
    dt = time.perf_counter() - t0
    sps = EPOCHS * nb / dt
    print(f"{tag:12s} {sps:7.1f} steps/s ({sps * BATCH:7.0f} img/s)  "
          f"loss {losses[-1]:.1f}  [{EPOCHS * nb} steps in {dt:.2f}s]",
          flush=True)
    return sps


def convergence_check(epochs=60):
    """The model-changing pool modes must LEARN comparably, not just run
    fast: train each on structured synthetic im2spec data (gaussian-blob
    images whose position parameterizes a peaked spectrum) and report the
    converged loss side by side."""
    rng = np.random.default_rng(3)
    n, d, L = 600, 64, 512
    cy, cx = rng.uniform(0.2, 0.8, (2, n))
    yy, xx = np.mgrid[0:d, 0:d] / d
    imgs = np.exp(-(((yy[None] - cy[:, None, None]) ** 2
                     + (xx[None] - cx[:, None, None]) ** 2) / 0.01))
    t = np.arange(L) / L
    spec = np.exp(-((t[None] - cx[:, None]) ** 2) / (0.002 + 0.01 * cy[:, None] ** 2))
    imgs, spec = imgs.astype(np.float32), spec.astype(np.float32)
    finals = {}
    for pool in ("max", "avg", "stride"):
        m = pv.models.VED((d, d), (L,), compute_dtype="bfloat16", pool=pool,
                          seed=1)
        loader = pv.utils.init_dataloader(imgs, spec, batch_size=50)
        tr = pv.trainers.SVItrainer(m)
        losses = tr.run(loader, epochs, scale_factor=4)
        finals[pool] = (losses[0], losses[-1])
        print(f"  pool={pool:6s} loss {losses[0]:.2f} -> {losses[-1]:.2f}",
              flush=True)
    return finals


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*",
                    default=["f32:max", "bf16:max", "bf16:avg", "bf16:stride"])
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="also run the pool-mode convergence comparison")
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    results = {}
    for tag in args.variants:
        results[tag] = run_variant(tag, profile=args.profile)
    base = results.get("bf16:max")
    if base:
        for tag, sps in results.items():
            print(f"  {tag}: {sps / base:.2f}x vs bf16:max")
    if args.check:
        print("convergence (structured synthetic im2spec, 64x64 -> 512):")
        convergence_check()
    return 0


if __name__ == "__main__":
    sys.exit(main())
