"""Round-2 perf evidence script (run on one TPU v5e chip).

1. VPU op-throughput microbench (fused chains): shows tanh evaluates at
   ~elementwise-op cost (hardware transcendental units), killing the
   round-1 "transcendental-bound" hypothesis.
2. Flagship steps/s with exact vs 7/6-Pade approximate tanh (the approx
   path measured SLOWER -- negative result kept for the record).
3. jax.profiler trace of one steady-state epoch ->
   benchmarks/profiles/r02_flagship.

Results recorded in docs/PERFORMANCE.md.
"""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
import pyroved_tpu as pv
pv.utils.profiling.enable_compilation_cache()
dev = jax.devices()[0]
print("platform:", dev.platform, flush=True)

# ---- 1. VPU transcendental throughput microbench ----
# chain of K activations on a VMEM-sized array; XLA fuses the chain so the
# measurement is compute throughput, not HBM bandwidth.
SHAPE = (512, 4096)   # 8 MiB f32
K = 64
x = jnp.asarray(np.random.default_rng(0).normal(size=SHAPE), jnp.float32)

def chain(f):
    def g(x):
        for _ in range(K):
            x = f(x)
        return x
    return jax.jit(g)

def pade(x):
    x = jnp.clip(x, -4.97, 4.97)
    x2 = x * x
    num = x * (135135.0 + x2 * (17325.0 + x2 * (378.0 + x2)))
    den = 135135.0 + x2 * (62370.0 + x2 * (3150.0 + 28.0 * x2))
    return num / den

def time_fn(fn, x, reps=20):
    fn(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(x)
    y.block_until_ready()
    return (time.perf_counter() - t0) / reps

n_elem = SHAPE[0] * SHAPE[1] * K
for name, f in [("mul(x*1.0001)", lambda v: v * 1.0001),
                ("tanh", jnp.tanh),
                ("pade_tanh", pade),
                ("sigmoid", jax.nn.sigmoid),
                ("exp", jnp.exp)]:
    dt = time_fn(chain(f), x)
    print(f"microbench {name}: {n_elem/dt/1e9:.1f} Gop/s ({dt*1e3:.3f} ms)", flush=True)

# ---- 2. flagship steps/s: exact vs approx tanh ----
BATCH, N_DATA = 200, 10000
rng = np.random.default_rng(0)
yy, xx = np.meshgrid(np.linspace(-1,1,28), np.linspace(-1,1,28), indexing="ij")
cx = rng.uniform(-0.4,0.4,N_DATA)[:,None,None]; cy = rng.uniform(-0.4,0.4,N_DATA)[:,None,None]
s = rng.uniform(0.05,0.2,N_DATA)[:,None,None]
data = np.exp(-((xx-cx)**2 + (yy-cy)**2)/s).astype(np.float32)

def steps_per_sec(**kw):
    model = pv.models.iVAE((28,28), latent_dim=2, invariances=["r"], **kw)
    loader = pv.utils.init_dataloader(data, batch_size=BATCH)
    trainer = pv.trainers.SVItrainer(model)
    trainer.step(loader)  # compile + warm epoch
    t0 = time.perf_counter()
    for _ in range(5):
        trainer.step(loader)
    dt = time.perf_counter() - t0
    return 5 * loader.num_batches / dt, trainer.loss_history["training_loss"][-1]

sps_exact, loss_exact = steps_per_sec()
print(f"flagship exact tanh: {sps_exact:.1f} steps/s, loss {loss_exact:.4f}", flush=True)
sps_approx, loss_approx = steps_per_sec(approx_tanh=True)
print(f"flagship approx tanh: {sps_approx:.1f} steps/s, loss {loss_approx:.4f}", flush=True)
print(f"speedup: {sps_approx/sps_exact:.3f}x, loss reldiff {abs(loss_approx-loss_exact)/abs(loss_exact):.2e}", flush=True)

# ---- 3. profiler trace of the steady-state exact-tanh step ----
model = pv.models.iVAE((28,28), latent_dim=2, invariances=["r"])
loader = pv.utils.init_dataloader(data, batch_size=BATCH)
trainer = pv.trainers.SVItrainer(model)
trainer.step(loader)  # warm
os.makedirs("/root/repo/benchmarks/profiles", exist_ok=True)
with jax.profiler.trace("/root/repo/benchmarks/profiles/r02_flagship"):
    trainer.step(loader)
print("PERF_R02_DONE", flush=True)
