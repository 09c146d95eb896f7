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


def test_two_process_expert_and_tensor_parallel(tmp_path):
    """EP (modality axis) and TP (model axis) each split ACROSS two real
    processes with 1 device each — their collectives ride Gloo for real
    (round 5: multi-controller evidence beyond the DP leg). The workers
    save the gathered trained params/logs; this parent then recomputes
    the same trajectories single-process and asserts parity, closing the
    gap between "GSPMD compiles it" and "multi-controller runs it"."""
    port = _free_port()
    worker = Path(__file__).parent / "helpers" / "distributed_worker_ep_tp.py"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "MMNM_TEST_OUT_DIR": str(tmp_path),
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert f"proc {pid}: OK" in out, out[-2000:]
        assert "cross-process expert-parallel ok" in out
        assert "cross-process tensor-parallel ok" in out
        assert "cross-process grouped F,M,D ok" in out
        assert "cross-process grouped resumable ok" in out

    # ---- single-process reference trajectories (same seeds/data) ---------
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        stack_fold_batches,
        stack_params,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedFoldTrainer,
    )

    dims = [12, 8]
    config = TrainConfig(epochs=2, batch_size=4, combine="gpoe")
    n = 2 * config.batch_size
    model = build_model("cVAE_multimodal", dims, [8, 8], 4, 3, len(dims))
    rng = np.random.default_rng(0)
    data_list = [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(n, 3)).astype(np.float32)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
    key = jax.random.PRNGKey(42)

    def assert_tree_matches(npz_path, tree):
        got = np.load(npz_path)
        leaves = jax.tree_util.tree_leaves(tree)
        assert len(got.files) == len(leaves)
        for i, ref in enumerate(leaves):
            np.testing.assert_allclose(got[f"leaf_{i}"], np.asarray(ref),
                                       rtol=1e-4, atol=1e-6)

    p_ref, logs_ref = PackedFoldTrainer(model, config, n).run(
        params, data_list, cov, key=key)
    np.testing.assert_allclose(np.load(tmp_path / "ep_total.npy"),
                               np.asarray(logs_ref["total"]), rtol=1e-5)
    assert_tree_matches(tmp_path / "ep_params.npz", p_ref)

    stacked = stack_params([params])
    batches = stack_fold_batches([data_list], [[cov] * len(dims)],
                                 config.batch_size)
    tp_ref_params, tp_ref_logs = MultiFoldTrainer(model, config, n).run(
        stacked, jax.device_put(batches), jnp.stack([key]))
    np.testing.assert_allclose(np.load(tmp_path / "tp_total.npy"),
                               np.asarray(tp_ref_logs["total"]), rtol=1e-4)
    assert_tree_matches(tmp_path / "tp_params.npz",
                        jax.device_get(tp_ref_params))

    # grouped F,M,D leg: unmeshed GroupedMultiFoldTrainer reference (same
    # seeds/data as the worker's meshed run; GSPMD psum reorder -> float
    # tolerance)
    from multi_modal_normative_modeling_tpu.train.grouped import (
        GroupedMultiFoldTrainer,
    )

    gdims = [12, 12, 8, 8]
    gmodel = build_model("cVAE_multimodal", gdims, [8, 8], 4, 3, len(gdims))
    grng = np.random.default_rng(1)
    gdata = [grng.normal(size=(n, d)).astype(np.float32) for d in gdims]
    gcov = grng.normal(size=(n, 3)).astype(np.float32)
    gparams = jax.device_get(gmodel.init_params(jax.random.PRNGKey(1)))
    g_ref_p, g_ref_logs = GroupedMultiFoldTrainer(gmodel, config, n).run(
        [gparams], [(gdata, [gcov] * len(gdims))], [jax.random.PRNGKey(7)])
    np.testing.assert_allclose(np.load(tmp_path / "grouped_total.npy"),
                               np.asarray(g_ref_logs[0]["total"]),
                               rtol=1e-4)
    assert_tree_matches(tmp_path / "grouped_params.npz", g_ref_p[0])
