"""Migrating a TRAINED reference pyroVED model onto the TPU framework.

Workflow demonstrated:

1. a reference-style torch rVAE (the exact module/parameter naming of
   ``pyroved/nets/fc.py``) is trained briefly on CPU and checkpointed with
   ``torch.save(model.state_dict(), path)`` — standing in for a user's
   existing reference checkpoint (``pyroved/models/base.py:183-186``);
2. ``model.load_torch_weights(path)`` imports it, converting torch layouts
   to flax (Linear transposes etc. — see ``pyroved_tpu.interop``);
3. encode parity is checked against the torch model;
4. training CONTINUES on the TPU from the imported weights via ``fit()``;
5. the refined weights are exported back to reference-keyed form with
   ``interop.params_to_torch`` for anyone still on the torch stack.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyroved_tpu as pv  # noqa: E402
from pyroved_tpu import interop  # noqa: E402

import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

DATA_DIM = (24, 24)
LATENT = 2
N = 28 * 28  # unused alias guard


# --- reference-shaped torch rVAE (naming matches pyroved/nets/fc.py) -------

class RefEncoder(tnn.Module):
    def __init__(self, in_dim, z_out):
        super().__init__()
        self.fc_layers = tnn.Sequential(
            tnn.Linear(in_dim, 128), tnn.Tanh(),
            tnn.Linear(128, 128), tnn.Tanh())
        self.fc11 = tnn.Linear(128, z_out)
        self.fc12 = tnn.Linear(128, z_out)

    def forward(self, x):
        h = self.fc_layers(x.reshape(x.shape[0], -1))
        return self.fc11(h), F.softplus(self.fc12(h))


class RefSDecoder(tnn.Module):
    def __init__(self, latent_dim):
        super().__init__()
        self.coord_latent = tnn.Module()
        self.coord_latent.fc_coord = tnn.Linear(2, 128)
        self.coord_latent.fc_latent = tnn.Linear(latent_dim, 128, bias=False)
        self.fc_layers = tnn.Sequential(
            tnn.Linear(128, 128), tnn.Tanh(),
            tnn.Linear(128, 128), tnn.Tanh())
        self.out = tnn.Linear(128, 1)

    def forward(self, x_coord, z):
        b, n = x_coord.shape[:2]
        hx = self.coord_latent.fc_coord(x_coord.reshape(b * n, -1)).reshape(b, n, -1)
        h = torch.tanh(hx + self.coord_latent.fc_latent(z).unsqueeze(1))
        h = self.fc_layers(h.reshape(b * n, -1))
        return torch.sigmoid(self.out(h)).reshape(b, n)


class RefRVAE(tnn.Module):
    def __init__(self, in_dim, latent_dim):
        super().__init__()
        self.encoder_z = RefEncoder(in_dim, latent_dim + 1)  # +1 rotation
        self.decoder = RefSDecoder(latent_dim)


def make_data(n=2000):
    rng = np.random.default_rng(0)
    yy, xx = np.meshgrid(np.linspace(-1, 1, DATA_DIM[0]),
                         np.linspace(-1, 1, DATA_DIM[1]), indexing="ij")
    cx = rng.uniform(-0.4, 0.4, n)[:, None, None]
    cy = rng.uniform(-0.4, 0.4, n)[:, None, None]
    s = rng.uniform(0.05, 0.2, n)[:, None, None]
    return np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / s).astype(np.float32)


def torch_train_steps(model, grid, X, steps=40, bs=100):
    """A few reference-equivalent SVI steps on CPU (rotation-invariant
    Bernoulli ELBO, Adam 1e-3) — the 'existing checkpoint' being migrated."""
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    g = torch.from_numpy(np.array(grid, np.float32))
    last = None
    for i in range(steps):
        xb = torch.from_numpy(X[(i * bs) % (len(X) - bs):][:bs])
        xf = xb.reshape(bs, -1)
        opt.zero_grad()
        mu, sig = model.encoder_z(xf)
        eps = torch.randn_like(mu)
        z = mu + sig * eps
        lq = (-0.5 * eps ** 2 - torch.log(sig)).sum(-1)
        lp = (-0.5 * z ** 2).sum(-1)
        phi, zc = z[:, 0], z[:, 1:]
        c, s = torch.cos(phi), torch.sin(phi)
        rot = torch.stack([torch.stack([c, s], -1), torch.stack([-s, c], -1)], -2)
        coords = torch.bmm(g.expand(bs, -1, -1), rot)
        loc = model.decoder(coords, zc).clamp(1e-6, 1 - 1e-6)
        recon = (xf * torch.log(loc) + (1 - xf) * torch.log(1 - loc)).sum(-1)
        loss = -(recon + lp - lq).sum() / bs
        loss.backward()
        opt.step()
        last = float(loss.detach())
    return last


def main():
    pv.utils.profiling.enable_compilation_cache()
    X = make_data()

    # 1. the "existing" reference checkpoint, trained on CPU
    torch.manual_seed(0)
    ref = RefRVAE(int(np.prod(DATA_DIM)), LATENT)
    model = pv.models.iVAE(DATA_DIM, latent_dim=LATENT, invariances=["r"])
    ref_loss = torch_train_steps(ref, model.grid, X)
    ckpt = "/tmp/pyroved_reference_rvae.pt"
    torch.save(ref.state_dict(), ckpt)
    print(f"[torch/CPU] trained 40 reference SVI steps, loss {ref_loss:.2f}; "
          f"saved {ckpt}")

    # 2. import onto the TPU framework
    model.load_torch_weights(ckpt)

    # 3. encode parity with the torch model
    with torch.no_grad():
        mu_t, _ = ref.encoder_z(torch.from_numpy(X[:200]).reshape(200, -1))
    z_loc, _ = model.encode(X[:200])
    err = np.abs(np.asarray(z_loc) - mu_t.numpy()).max()
    print(f"[import] encode parity vs torch: max abs err {err:.2e}")
    assert err < 5e-3

    # 4. continue training on the TPU from the imported weights
    trainer = model.fit(X, epochs=30, batch_size=100)
    lh = trainer.loss_history["training_loss"]
    print(f"[tpu] resumed training 30 epochs: {lh[0]:.2f} -> {lh[-1]:.2f}")
    assert lh[-1] < lh[0]

    # 5. export the refined weights back to the reference format
    sd = interop.params_to_torch(model)
    ref.load_state_dict({k: torch.from_numpy(np.array(v))
                         for k, v in sd.items()})
    print(f"[export] round-trip back into the torch model: "
          f"{len(sd)} tensors accepted by load_state_dict")


if __name__ == "__main__":
    main()
