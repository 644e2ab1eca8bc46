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


def _width_imgs(n, seed=0):
    """K true clusters that differ by blob WIDTH (not position): class k is
    a centered gaussian of sigma_k, plus small center jitter. Unlike the
    circle-of-positions data, width classes are IDENTIFIABLE under the
    model's rotation invariance — the guide can (and does) concentrate, so
    this is the regime ``enum_schedule="auto"`` is built to detect."""
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, K, n)
    sig = 0.0015 * (1.45 ** cls)  # geometric width ladder, well separated
    cy = 0.5 + rng.normal(0, 0.02, n)
    cx = 0.5 + rng.normal(0, 0.02, n)
    yy, xx = np.mgrid[0:DATA[0], 0:DATA[1]]
    yy, xx = yy / DATA[0], xx / DATA[1]
    imgs = np.exp(-(((yy[None] - cy[:, None, None]) ** 2
                     + (xx[None] - cx[:, None, None]) ** 2)
                    / sig[:, None, None]))
    return imgs.astype(np.float32), cls


def _pattern_imgs(n, seed=0):
    """K true clusters that are DISTINCT FIXED PATTERNS (a sum of 4 random
    gaussian blobs per class) plus per-sample amplitude jitter. Unlike the
    circle data (classes are rotations of each other) and the width data
    (a continuous factor the continuous latents absorb), two continuous
    latents cannot interpolate 10 unrelated patterns — the model MUST use
    the discrete latent, the reconstruction gain beats the discrete-KL
    pull toward uniform, and q(y|x) genuinely concentrates. This is the
    regime where ``enum_schedule="auto"`` flips."""
    prng = np.random.default_rng(12345)  # class patterns fixed across splits
    yy, xx = np.mgrid[0:DATA[0], 0:DATA[1]]
    yy, xx = yy / DATA[0], xx / DATA[1]
    pats = []
    for _ in range(K):
        p = np.zeros(DATA)
        for _ in range(4):
            cy, cx = prng.uniform(0.15, 0.85, 2)
            p += np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 0.008))
        pats.append(p / p.max())
    pats = np.stack(pats)
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, K, n)
    amp = rng.uniform(0.7, 1.0, n)[:, None, None]
    return (pats[cls] * amp).astype(np.float32), cls


def convergence_gap(epochs=80, topks=(1, 2, 3), schedule=10,
                    datafn=_clustered_imgs):
    """Train jiVAE exact vs enum_topk on K-cluster data; score every trained
    parameter set under the EXACT K-way ELBO on held-out data. Also runs
    ``enum_schedule=schedule`` rows (exact-early -> truncated-late)."""
    import jax
    x_train, _ = datafn(N_DATA, seed=5)
    x_val, _ = datafn(500, seed=6)
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

    # enum_schedule="auto" rows (round 5): the guide-concentration trigger
    # picks the switch epoch itself — report where it flipped alongside
    # the fixed-schedule rows. Programs already warm from above.
    for topk in topks:
        m = pv.models.jiVAE(DATA, latent_dim=2, discrete_dim=K,
                            invariances=["r"], seed=1, enum_topk=topk)
        loader = pv.utils.init_dataloader(x_train, batch_size=BATCH)
        t = pv.trainers.SVItrainer(m)
        t0 = time.perf_counter()
        t.run(loader, epochs, enum_schedule="auto")
        dt = time.perf_counter() - t0
        sps = epochs * len(loader) / dt
        val = float(exact_val_loss(jax.tree.map(lambda a: a, m.params)))
        sched_rows.append(("auto", topk, sps, val))
        sw = t.enum_switch_epoch
        mass = float(np.sort(np.asarray(m.guide_probs(x_train[:512])),
                             axis=-1)[:, -topk:].sum(-1).mean())
        print(f"  [final mean top-{topk} guide mass {mass:.3f}]", flush=True)
        print(f"  auto(0.95 -> topk={topk}) switched at epoch "
              f"{sw if sw is not None else '-'}: {sps:7.1f} steps/s   "
              f"exact held-out ELBO {val:.3f}  "
              f"({sps / base[1]:.2f}x, gap {val - base[2]:+.3f} vs exact, "
              f"{abs(val - base[2]) / abs(base[2]) * 100:.3f}%)",
              flush=True)
    return rows + sched_rows


def auto_demo_ssivae(epochs=200, topks=(1, 2), threshold=0.95,
                     n_sup=2000):
    """The regime ``enum_schedule="auto"`` is built for: ssiVAE's guide is
    a SUPERVISED classifier, so on separable data it genuinely concentrates
    past the threshold and auto flips — unlike unsupervised jiVAE guides,
    which stay diffuse whenever the discrete factor is unidentifiable
    (rotations of each other) or absorbed by the continuous latents.
    Measures flip epoch, interleaved steps/s, final val accuracy, and the
    final training loss vs exact enumeration."""
    x_unsup, _ = _clustered_imgs(N_DATA, seed=5)
    x_sup, cls_sup = _clustered_imgs(n_sup, seed=7)
    x_val, cls_val = _clustered_imgs(500, seed=6)
    ys = np.eye(K, dtype=np.float32)[cls_sup]
    yv = np.eye(K, dtype=np.float32)[cls_val]

    def one(topk, schedule):
        m = pv.models.ssiVAE(DATA, latent_dim=2, num_classes=K,
                             invariances=["r"], seed=1, enum_topk=topk)
        lu = pv.utils.init_dataloader(x_unsup, batch_size=BATCH)
        ls = pv.utils.init_dataloader(x_sup, ys, batch_size=BATCH)
        lv = pv.utils.init_dataloader(x_val, yv, batch_size=250)
        t = pv.trainers.auxSVItrainer(m)
        kw = {} if schedule is None else {"enum_schedule": schedule}
        t0 = time.perf_counter()
        losses = t.run(lu, ls, epochs, **kw)
        dt = time.perf_counter() - t0
        acc = t.evaluate(lv)
        mass = float(np.sort(np.asarray(m.guide_probs(x_unsup[:512])),
                             axis=-1)[:, -max(topk, 1):].sum(-1).mean())
        return (epochs * len(lu) / dt, losses[-1], acc,
                getattr(t, "enum_switch_epoch", None), mass)

    # warm every program shape with throwaway runs (tunnel rule)
    for topk in (0,) + tuple(topks):
        one(topk, None if topk == 0 else 5)

    sps0, loss0, acc0, _, _ = one(0, None)
    print(f"  exact (K={K})          {sps0:7.1f} steps/s  loss {loss0:.3f}  "
          f"val acc {acc0:.3f}", flush=True)
    for topk in topks:
        sps, loss, acc, sw, mass = one(topk, ("auto", threshold))
        print(f"  auto({threshold} -> topk={topk}) switched at epoch "
              f"{sw if sw is not None else '-'}: {sps:7.1f} steps/s  "
              f"loss {loss:.3f}  val acc {acc:.3f}  "
              f"[final top-{topk} guide mass {mass:.3f}]  "
              f"({sps / sps0:.2f}x exact)", flush=True)
        sps, loss, acc, _, _ = one(topk, 10)
        print(f"  sched(10 -> topk={topk})             {sps:7.1f} steps/s  "
              f"loss {loss:.3f}  val acc {acc:.3f}  "
              f"({sps / sps0:.2f}x exact)", flush=True)


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
    ap.add_argument("--data", choices=["circle", "width", "pattern"],
                    default="circle",
                    help="gap dataset: 'circle' (K positions on a circle — "
                    "rotation-UNidentifiable classes, the guide stays "
                    "diffuse), 'width' (K blob widths — a continuous "
                    "factor the continuous latents absorb), or 'pattern' "
                    "(K distinct fixed patterns — the guide concentrates "
                    "and the auto schedule flips)")
    ap.add_argument("--auto-ssivae", action="store_true",
                    help="enum_schedule='auto' demo on ssiVAE (supervised "
                    "guide concentrates -> auto actually flips)")
    args = ap.parse_args(argv)
    pv.utils.profiling.enable_compilation_cache()
    if args.auto_ssivae:
        print(f"enum_schedule='auto' on ssiVAE (K={K} circle classes, "
              f"{args.gap_epochs} epochs):")
        auto_demo_ssivae(epochs=args.gap_epochs)
        return 0
    # (run with --gap-epochs 200 for the committed demo: the classifier
    # needs ~2k supervised steps before its confidence clears 0.95)
    if args.gap:
        datafn = {"circle": _clustered_imgs, "width": _width_imgs,
                  "pattern": _pattern_imgs}[args.data]
        print(f"enum_topk convergence gap (K={K} {args.data} synthetic, "
              f"{args.gap_epochs} epochs, enum_schedule={args.sched}):")
        convergence_gap(epochs=args.gap_epochs, schedule=args.sched,
                        datafn=datafn)
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
