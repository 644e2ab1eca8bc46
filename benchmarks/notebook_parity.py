"""Reproduce the reference notebooks' stored final-loss anchors EXACTLY.

The shiftVAE and C_cont_VAE notebooks generate their training data
in-notebook with ``torch.manual_seed(1)`` (``examples/shiftVAE.ipynb`` cell
7, ``examples/pyroVED_examples_C_cont_VAE.ipynb`` cell 7), so the identical
dataset is regenerated here with torch and trained at the identical configs
(model, epochs, batch size, Adam lr) — the converged per-sample loss must
land within the 1% parity budget of the notebooks' stored outputs:

| anchor | notebook cell | stored final loss (250 ep) |
|---|---|---|
| vanilla iVAE, 1D l=100, bs=64 | shiftVAE.ipynb cell 10 | 60.0157 |
| iVAE ['t'], dx_prior=0.3      | shiftVAE.ipynb cell 19 | 60.4382 |
| cVAE c_dim=1                  | C_cont_VAE.ipynb cell 11 | 58.6791 |
| cVAE c_dim=2                  | C_cont_VAE.ipynb cell 21 | 57.3428 |

The remaining two anchors need data this zero-egress image cannot fetch:
VAE_gp.ipynb downloads MNIST (wget) and im2spec_VED.ipynb downloads an
experimental EELS dataset — both unreachable; their parity stands on the
identical-estimator audit (benchmarks/PYRO_AUDIT.md) instead.

Usage: python benchmarks/notebook_parity.py [epochs]   (default 250)
Writes benchmarks/NOTEBOOK_PARITY.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANCHORS = {
    "vanilla-1d": (62.4043, 60.0157),
    "shift-t": (65.0912, 60.4382),
    "cvae-c1": (61.1289, 58.6791),
    "cvae-c2": (60.0581, 57.3428),
}


def make_notebook_data():
    """Exact replica of the notebooks' data cell (torch.manual_seed(1) and
    the same draw order)."""
    import torch
    torch.manual_seed(1)
    n_samples, l_signal = 5000, 100
    x = torch.linspace(-12, 12, l_signal).expand(n_samples, l_signal)
    noise = torch.randint(1, 100, (n_samples, 1)) / 1e3
    mu = torch.randint(-30, 30, size=(n_samples, 1)) / 10
    sig = torch.randint(50, 500, size=(n_samples, 1)) / 1e2
    gauss = torch.exp(-torch.pow(x - mu, 2.0) / (2 * torch.pow(sig, 2.0)))
    train = gauss + noise * torch.randn(size=(n_samples, l_signal))
    train = (train - train.min()) / (train.max() - train.min())
    return (train.numpy().astype(np.float32),
            mu.numpy().astype(np.float32),
            sig.numpy().astype(np.float32))


def run_config(name, data, cond, epochs, **model_kw):
    import pyroved_tpu as pv
    model = pv.models.iVAE((100,), latent_dim=2, seed=0, **model_kw)
    arrays = (data,) if cond is None else (data, cond)
    loader = pv.utils.init_dataloader(*arrays, batch_size=64)
    trainer = pv.trainers.SVItrainer(model)
    t0 = time.time()
    losses = trainer.run(loader, epochs)
    dt = time.time() - t0
    print(f"{name}: ep1 {losses[0]:.4f} -> ep{epochs} {losses[-1]:.4f} "
          f"({dt:.1f}s)", flush=True)
    return losses


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    import pyroved_tpu as pv
    pv.utils.profiling.enable_compilation_cache()
    data, mu, sig = make_notebook_data()

    results = {}
    results["vanilla-1d"] = run_config("vanilla-1d", data, None, epochs,
                                       invariances=None)
    results["shift-t"] = run_config("shift-t", data, None, epochs,
                                    invariances=["t"], dx_prior=0.3)
    results["cvae-c1"] = run_config("cvae-c1", data, mu, epochs,
                                    c_dim=1, invariances=None)
    results["cvae-c2"] = run_config("cvae-c2", data,
                                    np.concatenate([mu, sig], -1), epochs,
                                    c_dim=2, invariances=None)

    lines = [
        "# Notebook-anchor parity (identical data, identical configs)",
        "",
        f"Data: the notebooks' exact torch.manual_seed(1) synthetic 1-D "
        f"signals (5000 x 100); {epochs} epochs, batch 64, Adam(1e-3), "
        f"Trace_ELBO-style MC KL. Stored notebook outputs from "
        f"`/root/reference/examples/shiftVAE.ipynb` cells 10/19 and "
        f"`pyroVED_examples_C_cont_VAE.ipynb` cells 11/21.",
        "",
        "| config | notebook ep1 | ours ep1 | notebook final | ours final | rel diff |",
        "|---|---|---|---|---|---|",
    ]
    worst = 0.0
    for name, losses in results.items():
        nb1, nbf = ANCHORS[name]
        rel = abs(losses[-1] - nbf) / abs(nbf)
        worst = max(worst, rel)
        lines.append(f"| {name} | {nb1:.4f} | {losses[0]:.4f} | {nbf:.4f} "
                     f"| {losses[-1]:.4f} | {100 * rel:.2f}% |")
    lines += [
        "",
        f"Worst final-loss deviation: **{100 * worst:.2f}%** (budget 1%). "
        f"Epoch-1 losses differ more (different init RNG streams); the "
        f"anchor is the converged level, reference `trainers/svi.py:115` "
        f"normalization.",
        "",
        "MNIST (`VAE_gp.ipynb`, anchor 166.1139) and EELS "
        "(`im2spec_VED.ipynb`, anchor 902.6011) require downloads this "
        "zero-egress image cannot perform (wget of MNIST.tar.gz / EELS "
        "dataset); their estimator-identity is covered by "
        "`benchmarks/PYRO_AUDIT.md` and `benchmarks/ELBO_PARITY.md`.",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "NOTEBOOK_PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
