"""Enumerated-family (discrete-latent) benchmark — jiVAE K-way exact
enumeration and ssiVAE interleaved semi-supervised training
(VERDICT r2 next-step #8; r3 next-step #8 adds the enum_topk rows).

Measures steps/s at the flagship scale (28x28, bs=200) per family and can
capture a profiler trace for the hot-op breakdown:

    python benchmarks/enum_bench.py                    # all families, exact
    python benchmarks/enum_bench.py jivae:topk2 ssivae:topk2  # truncated
    python benchmarks/enum_bench.py --profile jivae    # + trace
    python benchmarks/enum_bench.py --gap              # convergence-gap run

jiVAE's "step" is one enumerated update (decode K branches, or the top-k
under ``enum_topk``); ssiVAE's is one interleaved unlabeled+labeled pair
through auxSVItrainer.run. ``--gap`` trains exact vs enum_topk on
structured synthetic data and scores BOTH trained parameter sets under the
EXACT K-way ELBO, so the table reports the true convergence gap of the
truncated objective (not the truncated loss against itself).
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


def bench_jivae(profile=False, topk=0):
    m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                        invariances=["r"], seed=1, enum_topk=topk)
    loader = pv.utils.init_dataloader(_imgs(N_DATA), batch_size=BATCH)
    t = pv.trainers.SVItrainer(m)
    nb = len(loader)
    t.run(loader, EPOCHS)  # compile + warm (same trip count as timed)
    if profile:
        import jax
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profiles", f"enum_jivae_topk{topk}" if topk
                           else "enum_jivae")
        with jax.profiler.trace(out):
            t.run(loader, EPOCHS)
        print(f"  trace -> {out}")
    t0 = time.perf_counter()
    losses = t.run(loader, EPOCHS)
    sps = EPOCHS * nb / (time.perf_counter() - t0)
    tag = f"jiVAE (K={K}{f', topk={topk}' if topk else ''})"
    print(f"{tag:22s} {sps:7.1f} steps/s  loss {losses[-1]:.2f}",
          flush=True)
    return sps


def bench_ssivae(profile=False, topk=0, sched=0):
    m = pv.models.ssiVAE(DATA, latent_dim=2, num_classes=K,
                         invariances=["r"], seed=1, enum_topk=topk)
    lu = pv.utils.init_dataloader(_imgs(N_DATA), batch_size=BATCH)
    ys = np.eye(K, dtype=np.float32)[
        np.random.default_rng(1).integers(0, K, 400)]
    ls = pv.utils.init_dataloader(_imgs(400, seed=2), ys, batch_size=BATCH)
    t = pv.trainers.auxSVItrainer(m)
    nb = len(lu)
    if sched:
        # enum_schedule timing: warm both phase programs, then time the
        # scheduled run end-to-end (exact for `sched` epochs, then top-k)
        t.run(lu, ls, EPOCHS, enum_schedule=sched)
        t0 = time.perf_counter()
        losses = t.run(lu, ls, EPOCHS, enum_schedule=sched)
        sps = EPOCHS * nb / (time.perf_counter() - t0)
        print(f"ssiVAE (K={K}, sched {sched}ep->topk={topk}) "
              f"{sps:7.1f} interleaved steps/s  loss {losses[-1]:.2f}",
              flush=True)
        return sps
    t.run(lu, ls, EPOCHS)
    if profile:
        import jax
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "profiles", f"enum_ssivae_topk{topk}" if topk
                           else "enum_ssivae")
        with jax.profiler.trace(out):
            t.run(lu, ls, EPOCHS)
        print(f"  trace -> {out}")
    t0 = time.perf_counter()
    losses = t.run(lu, ls, EPOCHS)
    sps = EPOCHS * nb / (time.perf_counter() - t0)
    tag = f"ssiVAE (K={K}{f', topk={topk}' if topk else ''})"
    print(f"{tag:22s} {sps:7.1f} interleaved steps/s  "
          f"loss {losses[-1]:.2f}", flush=True)
    return sps


def _clustered_imgs(n, seed=0):
    """Structured data with K true clusters: a bright gaussian blob whose
    center is one of K fixed positions (class) plus per-sample jitter."""
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, K, n)
    ang = 2 * np.pi * cls / K
    cy, cx = 0.5 + 0.3 * np.sin(ang), 0.5 + 0.3 * np.cos(ang)
    cy += rng.normal(0, 0.02, n)
    cx += rng.normal(0, 0.02, n)
    yy, xx = np.mgrid[0:DATA[0], 0:DATA[1]]
    yy, xx = yy / DATA[0], xx / DATA[1]
    imgs = np.exp(-(((yy[None] - cy[:, None, None]) ** 2
                     + (xx[None] - cx[:, None, None]) ** 2) / 0.01))
    return imgs.astype(np.float32), cls


def convergence_gap(epochs=80, topks=(1, 2, 3), schedule=10):
    """Train jiVAE exact vs enum_topk on K-cluster data; score every trained
    parameter set under the EXACT K-way ELBO on held-out data. Also runs
    ``enum_schedule=schedule`` rows (exact-early -> truncated-late)."""
    import jax
    x_train, _ = _clustered_imgs(N_DATA, seed=5)
    x_val, _ = _clustered_imgs(500, seed=6)
    scorer = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                             invariances=["r"], seed=1)
    val_loader = pv.utils.init_dataloader(x_val, batch_size=250)

    def exact_val_loss(params):
        scorer.params = params
        t = pv.trainers.SVItrainer(scorer)
        return t.evaluate(val_loader)

    rows = []
    for topk in (0,) + tuple(topks):
        # Warm the compile cache with a THROWAWAY model + loader first (the
        # pipelined segment dispatch caps scans at 5-epoch segments, so a
        # 5-epoch warm run compiles every shape the timed run needs).
        # Without this the timed run absorbs a multi-minute remote compile
        # on tunneled devices and the steps/s column is meaningless.
        warm_m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                                 invariances=["r"], seed=1, enum_topk=topk)
        pv.trainers.SVItrainer(warm_m).run(
            pv.utils.init_dataloader(x_train, batch_size=BATCH), 5)
        m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                            invariances=["r"], seed=1, enum_topk=topk)
        loader = pv.utils.init_dataloader(x_train, batch_size=BATCH)
        t = pv.trainers.SVItrainer(m)
        t0 = time.perf_counter()
        t.run(loader, epochs)
        dt = time.perf_counter() - t0
        sps = epochs * len(loader) / dt
        val = float(exact_val_loss(jax.tree.map(lambda a: a, m.params)))
        rows.append((topk or K, sps, val))
        print(f"  topk={topk or K:2d}{' (exact)' if not topk else '':8s} "
              f"{sps:7.1f} steps/s   exact held-out ELBO {val:.3f}",
              flush=True)
    base = rows[0]
    for r in rows[1:]:
        print(f"  topk={r[0]:2d}: {r[1] / base[1]:.2f}x steps/s, "
              f"gap {r[2] - base[2]:+.3f} nats/example vs exact", flush=True)

    # enum_schedule rows (VERDICT r4 item 4): exact enumeration for the
    # first `schedule` epochs, then top-k — the compiled programs for both
    # phases are already warm from the rows above, so the timed run pays
    # only the (cached) retrace at the estimator flip.
    sched_rows = []
    for topk in topks:
        m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                            invariances=["r"], seed=1, enum_topk=topk)
        loader = pv.utils.init_dataloader(x_train, batch_size=BATCH)
        t = pv.trainers.SVItrainer(m)
        t0 = time.perf_counter()
        t.run(loader, epochs, enum_schedule=schedule)
        dt = time.perf_counter() - t0
        sps = epochs * len(loader) / dt
        val = float(exact_val_loss(jax.tree.map(lambda a: a, m.params)))
        sched_rows.append((topk, sps, val))
        print(f"  sched(exact {schedule}ep -> topk={topk}) "
              f"{sps:7.1f} steps/s   exact held-out ELBO {val:.3f}  "
              f"({sps / base[1]:.2f}x, gap {val - base[2]:+.3f} vs exact, "
              f"{abs(val - base[2]) / abs(base[2]) * 100:.3f}%)",
              flush=True)
    return rows + sched_rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("families", nargs="*", default=["jivae", "ssivae"],
                    help="family[:topkN], e.g. jivae jivae:topk2")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--gap", action="store_true",
                    help="run the enum_topk convergence-gap comparison")
    ap.add_argument("--sched", type=int, default=10,
                    help="exact-epoch count for the enum_schedule gap rows")
    ap.add_argument("--gap-epochs", type=int, default=80)
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    if args.gap:
        print(f"enum_topk convergence gap (K={K} clustered synthetic, "
              f"{args.gap_epochs} epochs, enum_schedule={args.sched}):")
        convergence_gap(epochs=args.gap_epochs, schedule=args.sched)
        return 0
    for fam in args.families:
        name, _, tk = fam.partition(":")
        if name == "ssivae" and tk.startswith("sched"):
            # e.g. ssivae:sched2 — exact for --sched epochs, then topk=2
            bench_ssivae(args.profile, topk=int(tk.replace("sched", "")),
                         sched=args.sched)
            continue
        topk = int(tk.replace("topk", "")) if tk else 0
        {"jivae": bench_jivae, "ssivae": bench_ssivae}[name](
            args.profile, topk=topk)
    return 0


if __name__ == "__main__":
    sys.exit(main())
