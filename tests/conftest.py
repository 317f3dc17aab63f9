"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip sharding tests run on `xla_force_host_platform_device_count=8`
virtual devices (there is no multi-chip TPU hardware in CI); numeric tests run
on CPU for speed and determinism.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a TPU platform
# before this conftest runs; override via config (env vars are too late).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
