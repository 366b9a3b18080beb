"""Multi-host (DCN) executed for real: 2 processes × 4 virtual CPU devices.

SURVEY.md §2.5 promises multi-host data parallelism over DCN via
``jax.distributed.initialize``. This test actually runs it — localhost
coordinator, gloo cross-process collectives — and asserts that one DP train
step through the full production input path (per-process dataset sharding →
jax.make_array_from_process_local_data assembly → jitted step) produces the
SAME loss as the identical single-process 8-device run. The reference has no
distributed code at all; this is the rebuild's multi-host leg.

Spawned as subprocesses (like __graft_entry__.dryrun_multichip) because jax
platform/distributed state is frozen per process.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multiprocess_worker.py")

# multi_thread_eigen=false is load-bearing on 1-core hosts (see
# __graft_entry__.dryrun_multichip: XLA CPU collectives rendezvous by
# blocking the executing thread; the shared intra-op pool deadlocks).
_XLA_COMMON = (
    " --xla_cpu_multi_thread_eigen=false"
    " --xla_cpu_collective_call_terminate_timeout_seconds=600"
    " --xla_cpu_collective_timeout_seconds=600"
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(process_id: int, num_processes: int, port: int | None) -> subprocess.Popen:
    env = dict(os.environ)
    # repo on the path for the worker; keep the axon site dir if present
    # (the worker forces the CPU platform itself)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (REPO, env.get("PYTHONPATH", "")) if p)
    devices_per_proc = 8 // num_processes
    env["XLA_FLAGS"] = (
        f"{env.get('XLA_FLAGS', '')} "
        f"--xla_force_host_platform_device_count={devices_per_proc}{_XLA_COMMON}"
    ).strip()
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    if num_processes > 1:
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = str(num_processes)
        env["JAX_PROCESS_ID"] = str(process_id)
    return subprocess.Popen(
        [sys.executable, WORKER],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _result(proc: subprocess.Popen, timeout: int = 900) -> dict:
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker rc={proc.returncode}\nstdout:\n{out}\nstderr:\n{err}"
    return json.loads(out.strip().splitlines()[-1])


def test_two_process_dp_step_matches_single_process():
    # reference: one process owning all 8 virtual devices
    ref = _result(_spawn(0, 1, None))
    assert ref["process_count"] == 1 and ref["devices"] == 8

    # 2 processes × 4 devices over the distributed runtime
    port = _free_port()
    procs = [_spawn(pid, 2, port) for pid in range(2)]
    results = [_result(p) for p in procs]

    for r in results:
        assert r["process_count"] == 2
        assert r["devices"] == 8 and r["local_devices"] == 4
        # same global program, same data → same loss (gloo vs in-process
        # psum only reorders float adds)
        assert r["loss"] == pytest.approx(ref["loss"], rel=2e-5)
        # eval remainder padding: global checksum and true-count preserved
        assert r["eval_checksum"] == pytest.approx(ref["eval_checksum"], rel=2e-5)
        assert r["eval_n"] == ref["eval_n"]
    # both processes computed the identical replicated loss
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-7)
