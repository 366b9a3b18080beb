"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8 so
the mesh / sharding layer is exercised exactly as it would be on a v5e-8 slice,
without TPU hardware (SURVEY.md §4 rebuild plan).

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment may pre-select a TPU platform plugin before conftest runs
# (sitecustomize), so force the platform via config as well as the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
