"""Test harness config: run all tests on a virtual 8-device CPU backend.

This is the JAX-native fake-backend trick (SURVEY.md §4): sharding/collective
code paths are exercised on 8 virtual CPU devices without TPU hardware. Must
run before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# keep compile times sane in tests
os.environ.setdefault("JAX_ENABLE_X64", "0")
