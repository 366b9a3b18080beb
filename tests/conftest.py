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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Single-threaded Eigen + generous collective timeouts: XLA CPU's in-process
# collectives rendezvous by BLOCKING the executing thread; with multi-threaded
# Eigen that thread belongs to the intra-op pool shared by all 8 virtual
# devices (ONE thread on this 1-core VM), so one partition's all-gather can
# block the only thread its peer needs to reach the same rendezvous —
# deadlock, then a hard process abort after the 40 s termination timeout
# (this killed the FSDP tests whenever the host had background load). Same
# flags as __graft_entry__.dryrun_multichip.
for _f in ("--xla_cpu_multi_thread_eigen=false",
           "--xla_cpu_collective_call_terminate_timeout_seconds=600",
           "--xla_cpu_collective_timeout_seconds=600"):
    if _f.split("=")[0] not in _flags:
        _flags = (_flags + " " + _f).strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The environment may pre-select a TPU platform plugin before conftest runs
# (sitecustomize), so force the platform via config as well as the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
