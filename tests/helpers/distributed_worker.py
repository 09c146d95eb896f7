"""Worker process for the 2-process jax.distributed smoke test
(tests/test_distributed_multiprocess.py launches two of these with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set).

Exercises the full multi-host path of parallel/distributed.py on the CPU
backend (Gloo collectives): initialize_distributed from env vars, the global
('fold', 'data') mesh, a cross-process psum, and a REAL fold-parallel
training run (MultiFoldTrainer) with parameters sharded over 'fold' across
the two processes.
"""
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from multi_modal_normative_modeling_tpu.parallel.distributed import (  # noqa: E402
    global_fold_mesh,
    initialize_distributed,
)


def main():
    initialize_distributed()  # env-var branch (JAX_COORDINATOR_ADDRESS etc.)
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == 2 * n_local

    mesh = global_fold_mesh(2)
    assert mesh.shape["fold"] * mesh.shape["data"] == n_global

    # -- cross-process collective ------------------------------------------
    from jax import shard_map

    @jax.jit
    def psum_all(x):
        return shard_map(lambda v: jax.lax.psum(v, ("fold", "data")),
                         mesh=mesh, in_specs=P(("fold", "data")),
                         out_specs=P())(x)

    x = np.arange(n_global, dtype=np.float32)
    sharding = NamedSharding(mesh, P(("fold", "data")))
    arrs = [jax.device_put(x[pid * n_local + i: pid * n_local + i + 1], d)
            for i, d in enumerate(jax.local_devices())]
    ga = jax.make_array_from_single_device_arrays((n_global,), sharding, arrs)
    total = float(np.asarray(psum_all(ga).addressable_data(0)).ravel()[0])
    assert total == float(x.sum()), total
    print(f"proc {pid}: psum over {n_global} devices ok ({total})",
          flush=True)

    # -- fold-parallel training across processes ---------------------------
    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        stack_fold_batches,
        stack_params,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig

    dims = [12, 8]
    n_folds = mesh.shape["fold"]
    n_data = mesh.shape["data"]
    config = TrainConfig(epochs=2, batch_size=4 * n_data, combine="gpoe")
    n = 2 * config.batch_size
    model = build_model("cVAE_multimodal", dims, [8, 8], 4, 3, len(dims))
    rng = np.random.default_rng(0)
    per_fold_data = [[rng.normal(size=(n, d)).astype(np.float32)
                      for d in dims] for _ in range(n_folds)]
    per_fold_cov = [[rng.normal(size=(n, 3)).astype(np.float32)] * len(dims)
                    for _ in range(n_folds)]
    stacked = stack_params(
        [model.init_params(jax.random.PRNGKey(f)) for f in range(n_folds)])
    batches = stack_fold_batches(per_fold_data, per_fold_cov,
                                 config.batch_size)
    keys = jnp.stack([jax.random.PRNGKey(100 + f) for f in range(n_folds)])

    trainer = MultiFoldTrainer(model, config, n, mesh=mesh)
    out_params, logs = trainer.run(stacked, batches, keys)
    jax.block_until_ready(out_params)
    from jax.experimental import multihost_utils

    total_logs = np.asarray(multihost_utils.process_allgather(
        logs["total"], tiled=True))
    assert total_logs.shape == (n_folds, config.epochs), total_logs.shape
    assert np.isfinite(total_logs).all(), total_logs
    print(f"proc {pid}: fold-parallel train ok on mesh "
          f"{dict(mesh.shape)}, losses={total_logs[:, -1]}", flush=True)

    # -- resumable (chunked + checkpointed) run under the same mesh --------
    # exercises run_chunked's cross-process host fetch (process_allgather of
    # fold-sharded state) and must be bit-identical to the single-scan run
    import os

    state_dir = Path(os.environ["MMNM_TEST_STATE_DIR"])
    out_res, logs_res = trainer.run_resumable(
        stacked, batches, keys, state_dir=state_dir,
        checkpoint_every=1, resume=False)
    res_total = np.asarray(logs_res["total"])
    assert np.array_equal(res_total, total_logs), (res_total, total_logs)
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        train_state_exists,
    )

    assert train_state_exists(state_dir)
    print(f"proc {pid}: resumable fold-parallel ok (bit-identical logs)",
          flush=True)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
