"""Test configuration: force an 8-virtual-device CPU platform so sharding and
fold-parallel tests run without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: the jitted whole-fold trainer takes ~30s to
# compile on CPU; cache it across test runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mmnm_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
