"""Worker process for the 2-process EP + TP cross-process tests
(tests/test_distributed_multiprocess.py launches two of these with 1
virtual device per process, so every 2-way mesh axis below SPANS the
process boundary and its collectives ride Gloo for real).

Legs (each printed as '<leg> ok' for the parent to assert):
  * expert-parallel: ('modality', 'data'=1) mesh — the packed modality
    axis split ACROSS processes, fusion psums as cross-process
    collectives (parallel/modality.EPFoldTrainer).
  * tensor-parallel: ('fold'=1, 'data'=1, 'model'=2) mesh — weight
    matrices Megatron-sharded across the two processes
    (parallel/tensor.fold_model_shardings).
  * grouped F,M,D GSPMD: the pad-free width-grouped trainer
    (train/grouped.GroupedMultiFoldTrainer) with its divisible
    width-group axes sharded ACROSS processes — exercises the
    packed.fetch_host/process_allgather result fetch for real.

The worker does NOT compute a single-process reference itself: in
multi-controller mode a "process-local" jit still commits outputs
against the global device set, so per-process reference fetches diverge
into asymmetric collectives. Instead process 0 saves the gathered
(identical-on-every-process) trained params + logs to
MMNM_TEST_OUT_DIR and the PARENT test compares them against its own
single-process trajectories.
"""
import os
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_modal_normative_modeling_tpu.parallel.distributed import (  # noqa: E402
    initialize_distributed,
)


def _save(path, tree):
    leaves = jax.tree_util.tree_leaves(tree)
    np.savez(path, **{f"leaf_{i}": np.asarray(a)
                      for i, a in enumerate(leaves)})


def main():
    initialize_distributed()
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1
    out_dir = Path(os.environ["MMNM_TEST_OUT_DIR"])

    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.train import TrainConfig
    from multi_modal_normative_modeling_tpu.train.checkpoints import _to_host

    dims = [12, 8]
    config = TrainConfig(epochs=2, batch_size=4, combine="gpoe")
    n = 2 * config.batch_size
    model = build_model("cVAE_multimodal", dims, [8, 8], 4, 3, len(dims))
    rng = np.random.default_rng(0)
    data_list = [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(n, 3)).astype(np.float32)
    params = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
    key = jax.random.PRNGKey(42)

    # ---- expert-parallel: modality axis ACROSS the two processes ---------
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        EPFoldTrainer,
        make_ep_mesh,
    )

    ep_mesh = make_ep_mesh(n_modality=2, n_data=1)
    assert len({d.process_index for d in ep_mesh.devices.ravel()}) == 2, \
        "modality axis must span both processes"
    ep = EPFoldTrainer(model, config, n, ep_mesh)
    p_ep, logs_ep = ep.run(params, data_list, cov, key=key)
    ep_total = np.asarray(logs_ep["total"])
    assert np.isfinite(ep_total).all(), ep_total
    if pid == 0:
        _save(out_dir / "ep_params.npz", p_ep)
        np.save(out_dir / "ep_total.npy", ep_total)
    print(f"proc {pid}: cross-process expert-parallel ok "
          f"(losses={ep_total})", flush=True)

    # ---- tensor-parallel: 'model' axis ACROSS the two processes ----------
    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        stack_fold_batches,
        stack_params,
    )
    from multi_modal_normative_modeling_tpu.parallel.tensor import (
        fold_model_shardings,
        make_mesh3,
    )

    tp_mesh = make_mesh3(n_fold=1, n_data=1, n_model=2)
    assert len({d.process_index for d in tp_mesh.devices.ravel()}) == 2, \
        "model axis must span both processes"
    stacked = stack_params([params])
    batches = stack_fold_batches([data_list], [[cov] * len(dims)],
                                 config.batch_size)
    keys = jnp.stack([key])

    tp = MultiFoldTrainer(model, config, n, mesh=tp_mesh,
                          shardings_fn=fold_model_shardings)
    tp_params, tp_logs = tp.run(stacked, batches, keys)
    # _to_host all-gathers across processes — a COLLECTIVE, so every
    # process must call it (hoisted out of the pid-0 save branch)
    tp_total = np.asarray(_to_host(tp_logs)["total"])
    tp_host = _to_host(tp_params)
    assert np.isfinite(tp_total).all(), tp_total
    if pid == 0:
        _save(out_dir / "tp_params.npz", tp_host)
        np.save(out_dir / "tp_total.npy", tp_total)
    print(f"proc {pid}: cross-process tensor-parallel ok "
          f"(losses={tp_total.ravel()})", flush=True)

    # ---- grouped (width-grouped packed) F,M,D GSPMD ACROSS processes -----
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        grouped_fold_shardings,
        make_ep_mesh3,
    )
    from multi_modal_normative_modeling_tpu.train.grouped import (
        GroupedMultiFoldTrainer,
    )

    gdims = [12, 12, 8, 8]  # mixed widths: 2 groups, both divisible by 2
    gmodel = build_model("cVAE_multimodal", gdims, [8, 8], 4, 3, len(gdims))
    grng = np.random.default_rng(1)
    gdata = [grng.normal(size=(n, d)).astype(np.float32) for d in gdims]
    gcov = grng.normal(size=(n, 3)).astype(np.float32)
    gparams = jax.device_get(gmodel.init_params(jax.random.PRNGKey(1)))
    g_mesh = make_ep_mesh3(n_fold=1, n_modality=2, n_data=1)
    assert len({d.process_index for d in g_mesh.devices.ravel()}) == 2, \
        "modality axis must span both processes"
    gt = GroupedMultiFoldTrainer(gmodel, config, n, mesh=g_mesh,
                                 shardings_fn=grouped_fold_shardings)
    # run() fetches via packed.fetch_host -> process_allgather (a
    # COLLECTIVE): every process calls it symmetrically
    gp, glogs = gt.run([gparams], [(gdata, [gcov] * len(gdims))],
                       [jax.random.PRNGKey(7)])
    g_total = np.asarray(glogs[0]["total"])
    assert np.isfinite(g_total).all(), g_total
    if pid == 0:
        _save(out_dir / "grouped_params.npz", gp[0])
        np.save(out_dir / "grouped_total.npy", g_total)
    print(f"proc {pid}: cross-process grouped F,M,D ok "
          f"(losses={g_total})", flush=True)

    # resumable grouped run under the same mesh: exercises the per-chunk
    # operand globalization (numpy first-chunk state) + run_chunked's
    # cross-process host fetch; chunked must be bit-identical to the
    # single-scan run on the same trainer
    gp_res, glogs_res = gt.run_resumable(
        [gparams], [(gdata, [gcov] * len(gdims))],
        [jax.random.PRNGKey(7)], state_dir=out_dir / "grouped-state",
        checkpoint_every=1, resume=False)
    res_total = np.asarray(glogs_res[0]["total"])
    assert np.array_equal(res_total, g_total), (res_total, g_total)
    print(f"proc {pid}: cross-process grouped resumable ok "
          "(bit-identical logs)", flush=True)
    print(f"proc {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
