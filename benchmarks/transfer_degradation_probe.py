"""Host->device transfer-degradation probe (tunneled-TPU runtime finding,
round 3).

While benchmarking the streaming input paths we found that on the
axon-tunneled v5e runtime, H2D bandwidth for FRESH data drops from
~0.7-1.5 GB/s to ~40 MB/s (40 MB in ~0.9-1.2 s) after the first real
training epoch executes — PERMANENTLY for the process (it does not heal
after 25 s idle). The trigger was bisected with this probe:

| program executed first | upload after it |
|---|---|
| nothing (fresh process) | 25-60 ms / 40 MB (fast) |
| 15x 40 MB uploads, no compute | fast |
| jitted elementwise+reduce | fast |
| jitted with donated args | fast |
| bare lax.scan epoch (gather + matmul) | fast |
| scan epoch with value_and_grad | fast |
| scan epoch with jax.random sampling | fast |
| scan epoch with a donated 12-leaf param pytree | fast |
| REAL iVAE epoch, pure-XLA path (fused=False) | ~1.2 s / 40 MB |
| REAL iVAE epoch, fused Pallas backward | ~1.0 s / 40 MB |

i.e. neither Pallas, donation, RNG, autodiff, nor scan alone triggers it —
only the full model training program does (plausibly a staging-buffer /
allocator interaction with large real programs inside the tunnel runtime).
This caps EVERY streaming input variant at wire time (~627 KB per batch
/ 40 MB/s = 16 ms = ~62 steps/s at bs=200) regardless of producer design —
sync, prefetched, chunked, and the native ring pipeline all converge there
(benchmarks/streaming_scale.py). On a directly-attached TPU (PCIe DMA)
this pathology does not apply; the streaming stack's design points
(chunked device scans, producer overlap, zero-copy consume) are sized for
that transport.

Run: python benchmarks/transfer_degradation_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    import pyroved_tpu as pv
    rng = np.random.default_rng(0)

    def put_ms():
        y = rng.uniform(0, 1, (12800, 28, 28)).astype(np.float32)
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(y))
        return (time.perf_counter() - t0) * 1e3

    jax.block_until_ready(jax.device_put(np.zeros((8, 8), np.float32)))
    put_ms()  # connection warmup
    print(f"baseline fresh-data upload: {put_ms():.1f} ms / 40 MB")

    x = rng.uniform(0, 1, (10000, 28, 28)).astype(np.float32)
    m = pv.models.iVAE((28, 28), latent_dim=2, invariances=["r"], seed=1)
    t = pv.trainers.SVItrainer(m)
    loader = pv.utils.init_dataloader(x, batch_size=200)
    t.train(loader)
    after = put_ms()
    print(f"after one training epoch:   {after:.1f} ms / 40 MB")
    time.sleep(10)
    print(f"after 10 s idle:            {put_ms():.1f} ms / 40 MB")
    if after > 300:
        print("DEGRADED: this runtime shows the tunneled-transfer "
              "pathology (see module docstring); streaming throughput is "
              "wire-time-bound here.")
    else:
        print("HEALTHY: no post-training transfer degradation on this "
              "runtime.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
