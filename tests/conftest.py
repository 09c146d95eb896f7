"""Test configuration: force an 8-virtual-device CPU platform so sharding and
fold-parallel tests run without TPU hardware, and enable the persistent
compilation cache (the jitted whole-fold trainer takes ~30s to compile on
CPU)."""
import os

# Override unconditionally: the session environment may pre-set JAX_PLATFORMS
# to a TPU platform; tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# Force the count to 8 even when a smaller value leaked in from the
# environment (e.g. a distributed-test debug session set it to 1-2):
# multi-device tests would otherwise silently skip and the suite would go
# green with the sharding coverage gone.
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

# The environment's TPU plugin (sitecustomize) overrides jax_platforms via
# jax.config at interpreter start; override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_mmnm_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
