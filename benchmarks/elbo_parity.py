"""ELBO trajectory parity: pyroved_tpu vs a torch reimplementation of the
reference's rVAE SVI step (same architecture, same estimator, same Adam
hyperparameters, same synthetic dataset).

Pyro is not installable in this environment, so the comparison target is a
faithful torch replica of the reference's per-step computation
(``pyroved/models/ivae.py:165-221`` under ``Trace_ELBO``): encoder MLP ->
softplus sigma -> reparameterized z -> MC KL -> split rotation latent ->
rotate grid -> spatial decoder -> Bernoulli obs term -> Adam(1e-3).

Both sides train from their own init (same init DISTRIBUTION, kaiming-uniform)
on identical data; the check is that per-sample loss trajectories converge to
the same level (within the driver's 1% parity budget at the final epoch).

Usage: python benchmarks/elbo_parity.py [epochs]
Writes results to benchmarks/ELBO_PARITY.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 14
N, BATCH = 2000, 100
LATENT = 2


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, DIM), np.linspace(-1, 1, DIM),
                         indexing="ij")
    th = rng.uniform(0, 2 * np.pi, N)
    ecc = rng.uniform(0.1, 0.5, N)
    xr = xx[None] * np.cos(th)[:, None, None] - yy[None] * np.sin(th)[:, None, None]
    yr = xx[None] * np.sin(th)[:, None, None] + yy[None] * np.cos(th)[:, None, None]
    img = np.exp(-(xr ** 2) / 0.05 - (yr ** 2) / ecc[:, None, None])
    return img.astype(np.float32)


def train_ours(data, epochs):
    import pyroved_tpu as pv
    model = pv.models.iVAE((DIM, DIM), latent_dim=LATENT, invariances=["r"])
    loader = pv.utils.init_dataloader(data, batch_size=BATCH)
    trainer = pv.trainers.SVItrainer(model)
    for _ in range(epochs):
        trainer.step(loader)
    return trainer.loss_history["training_loss"]


def train_torch(data, epochs):
    import torch
    import torch.nn as nn
    torch.manual_seed(1)
    torch.set_num_threads(os.cpu_count() or 8)
    flat = DIM * DIM
    z_dim = LATENT + 1
    enc = nn.Sequential(nn.Linear(flat, 128), nn.Tanh(),
                        nn.Linear(128, 128), nn.Tanh())
    fc_mu, fc_sig = nn.Linear(128, z_dim), nn.Linear(128, z_dim)
    fc_coord = nn.Linear(2, 128)
    fc_latent = nn.Linear(LATENT, 128, bias=False)
    dec = nn.Sequential(nn.Linear(128, 128), nn.Tanh(),
                        nn.Linear(128, 128), nn.Tanh())
    out_l = nn.Linear(128, 1)
    params = [p for m in (enc, fc_mu, fc_sig, fc_coord, fc_latent, dec, out_l)
              for p in m.parameters()]
    opt = torch.optim.Adam(params, lr=1e-3)

    xs = torch.linspace(-1, 1, DIM)
    ys = torch.linspace(1, -1, DIM)
    g0, g1 = torch.meshgrid(xs, ys, indexing="ij")
    grid = torch.stack([g0.reshape(-1), g1.reshape(-1)], -1)
    X = torch.from_numpy(data)
    log2pi = float(np.log(2 * np.pi))

    history = []
    for _ in range(epochs):
        perm = torch.randperm(N)
        total = 0.0
        for s in range(0, N, BATCH):
            xb = X[perm[s:s + BATCH]].reshape(-1, flat)
            opt.zero_grad()
            h = enc(xb)
            mu, sig = fc_mu(h), nn.functional.softplus(fc_sig(h))
            eps = torch.randn_like(mu)
            z = mu + sig * eps
            lq = (-0.5 * eps ** 2 - torch.log(sig) - 0.5 * log2pi).sum(-1)
            lp = (-0.5 * z ** 2 - 0.5 * log2pi).sum(-1)
            phi, zc = z[:, 0], z[:, 1:]
            c, sn = torch.cos(phi), torch.sin(phi)
            rot = torch.stack([torch.stack([c, sn], -1),
                               torch.stack([-sn, c], -1)], -2)
            coords = torch.bmm(grid.expand(xb.shape[0], -1, -1), rot)
            hx = fc_coord(coords.reshape(-1, 2)).reshape(xb.shape[0], -1, 128)
            hd = torch.tanh(hx + fc_latent(zc)[:, None, :])
            loc = torch.sigmoid(out_l(dec(hd)))[..., 0].clamp(1e-6, 1 - 1e-6)
            recon = (xb * torch.log(loc) + (1 - xb) * torch.log(1 - loc)).sum(-1)
            loss = -(recon + lp - lq).sum()
            loss.backward()
            opt.step()
            total += float(loss)
        history.append(total / N)
    return history


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    data = make_data()
    t0 = time.time()
    ours = train_ours(data, epochs)
    t_ours = time.time() - t0
    t0 = time.time()
    ref = train_torch(data, epochs)
    t_ref = time.time() - t0
    rel = abs(ours[-1] - ref[-1]) / abs(ref[-1])
    lines = [
        "# ELBO trajectory parity (rVAE, synthetic oriented blobs)",
        "",
        f"config: {DIM}x{DIM} images, N={N}, batch={BATCH}, latent={LATENT}, "
        f"invariances=['r'], {epochs} epochs, Adam(1e-3), Trace_ELBO-style MC KL",
        "",
        "| epoch | pyroved_tpu (TPU) | torch replica (CPU) |",
        "|---|---|---|",
    ]
    for e in range(0, epochs, max(1, epochs // 10)):
        lines.append(f"| {e + 1} | {ours[e]:.4f} | {ref[e]:.4f} |")
    lines += [
        f"| {epochs} (final) | {ours[-1]:.4f} | {ref[-1]:.4f} |",
        "",
        f"final-epoch relative difference: **{100 * rel:.2f}%** "
        f"(parity budget: 1%)",
        f"wall time: ours {t_ours:.1f}s vs torch-CPU {t_ref:.1f}s "
        f"({t_ref / t_ours:.0f}x)",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ELBO_PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
