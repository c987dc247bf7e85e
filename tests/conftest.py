"""Test harness config: run all tests on a virtual 8-device CPU backend.

This is the JAX-native fake-backend trick (SURVEY.md §4): sharding/collective
code paths are exercised on 8 virtual CPU devices without TPU hardware. Must
run before the first `import jax` anywhere in the test process.
"""

import os

# FORCE cpu: the machine environment pre-sets JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must never grab the chip (single-client) nor depend on
# it. Assign, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# keep compile times sane in tests
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache makes test re-runs much faster
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The machine's sitecustomize imports jax's config machinery at interpreter
# startup (before this file), so env vars alone are baked in too early —
# override through jax.config, which is still possible pre-backend-init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
