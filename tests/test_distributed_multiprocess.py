"""2-process jax.distributed smoke test (CPU backend, Gloo collectives).

Covers the multi-host path the single-process suite can't: initialize
jax.distributed from the standard env vars (parallel/distributed.py:21-40),
build the global ('fold', 'data') mesh, run a cross-process psum, and train
fold-parallel with parameters sharded over 'fold' across the two processes
(tests/helpers/distributed_worker.py).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "helpers" / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_init_and_fold_parallel_train(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "MMNM_TEST_STATE_DIR": str(tmp_path / "state"),
        })
        # a worker sharing this test process's compile cache is fine; the
        # distributed runtime itself is what's under test
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}: OK" in out, out[-2000:]
        assert "fold-parallel train ok" in out
        assert "resumable fold-parallel ok" in out
