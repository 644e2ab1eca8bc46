"""Large-grid pixel-chunked TRAINING demonstration (VERDICT r4 item 1).

Config whose naive [B, N, H] decoder working set exceeds one chip's HBM:
512x512 grid (N = 262,144 pixels), batch 100, hidden [128, 128] -> the
f32 activation stack is ~13.4 GB per layer instance before the backward,
vs 16 GB HBM on one v5e. The naive full-grid path must OOM; the same
config with ``pixel_chunks=k`` (lax.scan over grid tiles + per-tile remat)
must train green, with steps/s recorded for docs/PERFORMANCE.md.

Usage: python benchmarks/pixel_chunk_scale.py [--dim 512] [--batch 100]
       [--chunks 16] [--epochs 2] [--skip-naive]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyroved_tpu as pv  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--batch", type=int, default=200)
    ap.add_argument("--chunks", type=int, default=16)
    ap.add_argument("--rows", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--skip-naive", action="store_true")
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    dd = (args.dim, args.dim)
    N = args.dim * args.dim
    H = 128
    ws_gb = args.batch * N * H * 4 / 1e9
    print(f"config: {dd} grid (N={N}), bs={args.batch}, H={H} -> naive "
          f"[B,N,H] working set {ws_gb:.1f} GB per layer instance",
          flush=True)
    rng = np.random.default_rng(0)
    data = rng.random((args.rows,) + dd, dtype=np.float32)

    if not args.skip_naive:
        # the genuinely naive path is forced-XLA: XLA's autodiff saves the
        # [B, N, H] tanh activations for the backward. (The fused Pallas
        # kernel bounds its own working set by tiling, so the DEFAULT
        # full-grid path survives large grids on TPU — measured below.)
        try:
            m = pv.models.iVAE(dd, latent_dim=2, invariances=["r"], seed=1,
                               fused=False)
            m.fit(data, epochs=1, batch_size=args.batch)
            print("naive XLA full-grid: trained (working set fit after all)",
                  flush=True)
        except Exception as e:
            print(f"naive XLA full-grid: FAILED as expected "
                  f"({type(e).__name__}: {str(e)[:200]})", flush=True)
        try:
            m = pv.models.iVAE(dd, latent_dim=2, invariances=["r"], seed=1)
            loader_f = pv.utils.init_dataloader(data, batch_size=args.batch)
            tr_f = pv.trainers.SVItrainer(m)
            tr_f.run(loader_f, args.epochs)  # compile + warm
            t0 = time.perf_counter()
            tr_f.run(loader_f, args.epochs)
            sps_f = args.epochs * loader_f.num_batches / (time.perf_counter() - t0)
            print(f"fused full-grid kernel: {sps_f:.2f} steps/s "
                  f"({sps_f * args.batch * N / 1e6:.0f}M px/s)", flush=True)
        except Exception as e:
            print(f"fused full-grid kernel: FAILED "
                  f"({type(e).__name__}: {str(e)[:200]})", flush=True)

    m = pv.models.iVAE(dd, latent_dim=2, invariances=["r"], seed=1,
                       pixel_chunks=args.chunks)
    loader = pv.utils.init_dataloader(data, batch_size=args.batch)
    tr = pv.trainers.SVItrainer(m)
    t0 = time.perf_counter()
    tr.run(loader, args.epochs)  # compile + warm at the TIMED shape
    print(f"pixel_chunks={args.chunks}: warm run (incl. compile) "
          f"{time.perf_counter() - t0:.1f}s, loss "
          f"{tr.loss_history['training_loss'][-1]:.2f}", flush=True)
    t0 = time.perf_counter()
    losses = tr.run(loader, args.epochs)
    dt = time.perf_counter() - t0
    sps = args.epochs * loader.num_batches / dt
    print(f"pixel_chunks={args.chunks}: {sps:.2f} steps/s "
          f"({sps * args.batch * N / 1e6:.0f}M px/s), losses {losses}",
          flush=True)
    assert all(np.isfinite(losses)), losses
    print("PIXEL_CHUNK_SCALE_OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
