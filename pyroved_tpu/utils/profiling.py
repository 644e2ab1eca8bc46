"""Profiling and timing observability.

The reference has no timers or profilers (SURVEY.md section 5). Here:
``trace`` wraps ``jax.profiler`` for TensorBoard-viewable device traces, and
``Timer`` provides lightweight wall-clock timing that trainers use to record
per-epoch durations (``trainer.epoch_times``).
"""
import contextlib
import time
from typing import Dict

import jax


def enable_compilation_cache(path: str = "/tmp/pyroved_tpu_jax_cache") -> None:
    """Turn on JAX's persistent compilation cache so repeated runs skip the
    (minutes-long on remote-compile TPU setups) first-jit cost."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir``
    (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating named wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def mean(self, name: str) -> float:
        return self.totals.get(name, 0.0) / max(self.counts.get(name, 0), 1)

    def summary(self) -> Dict[str, float]:
        return {k: self.mean(k) for k in self.totals}
