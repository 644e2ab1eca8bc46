"""Test config: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware.

Note: the axon TPU plugin registers itself via sitecustomize and overrides
the JAX_PLATFORMS env var, so the platform must be forced through
jax.config (before any device is touched). A persistent compilation cache
keeps repeat test runs fast.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/pvt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
