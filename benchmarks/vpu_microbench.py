"""Round-2 perf evidence script (run on one TPU v5e chip).

MEASUREMENT TRAP (this environment): the chip is reached through a tunnel
with ~26 ms RPC round-trip latency, and ``block_until_ready`` does NOT
actually block — naive per-dispatch timings measure host dispatch cost,
not device time. Every measurement here therefore runs as a long
``lax.scan`` with ONE forced scalar readback, latency-subtracted.

1. VPU op-cost ratios (512-iteration scan chains): tanh costs ~1.4x a
   multiply (hardware transcendental support), the 7/6-Pade rational
   approximation ~6x — killing the round-1 "transcendental-bound"
   hypothesis and ruling out polynomial tanh on TPU.
2. Fused-kernel grad device cost (300-step scan): ~811 us/step, which
   independently confirms the jax.profiler attribution (fwd 0.169 ms +
   bwd 0.637 ms); ablating the backward's per-batch pixel reductions
   saves only ~1% -> the kernels are matmul-bound.
3. Flagship steps/s with exact vs approx tanh (end-to-end, real epoch
   readbacks): approx measured 0.74x — negative result kept on record.

Results recorded in docs/PERFORMANCE.md.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pyroved_tpu as pv  # noqa: E402

pv.utils.profiling.enable_compilation_cache()


def timed(f, *a, reps=3):
    """Best-of-reps wall time with a forced scalar readback (the only
    reliable completion barrier over the tunnel)."""
    float(jnp.sum(f(*a)))  # warm / compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f(*a)))
        best = min(best, time.perf_counter() - t0)
    return best


def pade_tanh(v):
    v = jnp.clip(v, -4.97, 4.97)
    v2 = v * v
    num = v * (135135.0 + v2 * (17325.0 + v2 * (378.0 + v2)))
    den = 135135.0 + v2 * (62370.0 + v2 * (3150.0 + 28.0 * v2))
    return num / den


def main():
    print("platform:", jax.devices()[0].platform,
          jax.devices()[0].device_kind, flush=True)
    lat = timed(jax.jit(lambda x: x * 2.0), jnp.ones((8, 128)))
    print(f"RPC round-trip latency: {lat * 1e3:.1f} ms", flush=True)

    # ---- 1. VPU op-cost ratios ----
    SHAPE, K = (512, 4096), 512
    x = jnp.asarray(np.random.default_rng(0).normal(size=SHAPE), jnp.float32)

    def chain(f):
        return jax.jit(lambda x: jax.lax.scan(
            lambda c, _: (f(c), None), x, None, length=K)[0])

    times = {}
    for name, f in [("mul", lambda v: v * 1.000001), ("tanh", jnp.tanh),
                    ("exp", lambda v: jnp.exp(v) * 1e-9),
                    ("sigmoid", jax.nn.sigmoid), ("pade_tanh", pade_tanh)]:
        times[name] = timed(chain(f), x) - lat
        print(f"op-chain {name}: {times[name] * 1e3:.2f} ms / {K} iters "
              f"({times[name] / times['mul']:.1f}x mul)", flush=True)

    # ---- 2. fused-kernel grad device cost ----
    import pyroved_tpu.ops.spatial_decoder as sd
    rng = np.random.default_rng(0)
    B, N, H, L, nl = 200, 784, 128, 2, 2
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
    args = [mk(N, 2), jnp.asarray(rng.normal(size=(B,)), jnp.float32),
            mk(B, 2), jnp.asarray(1 + 0.1 * rng.normal(size=(B,)), jnp.float32),
            mk(B, L), mk(2, H), mk(H), mk(L, H), mk(nl, H, H), mk(nl, H),
            mk(H, 1), jnp.float32(0.05)]
    gfn = jax.grad(lambda a: jnp.sum(sd.fused_spatial_decoder(*a) ** 2))
    STEPS = 300

    @jax.jit
    def many(args):
        def body(c, _):
            g = gfn(c)
            c2 = [ci - 1e-6 * gi for ci, gi in zip(c, g)]
            c2[0] = c[0]  # grid is non-differentiable / constant
            return c2, None
        return jax.lax.scan(body, args, None, length=STEPS)[0][4]

    dt = timed(many, args) - lat
    print(f"fused-kernel fwd+bwd grad: {dt / STEPS * 1e6:.0f} us/step "
          f"({STEPS} scanned steps)", flush=True)


if __name__ == "__main__":
    main()
