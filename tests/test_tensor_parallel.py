"""Tensor-parallel ('model' axis) shardings: spec construction, numerical
parity with the unsharded fold-parallel run, and the chunked/milestone path
(explicit optimizer-state shardings)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.parallel import (
    MultiFoldTrainer,
    fold_model_shardings,
    make_mesh3,
    stack_fold_batches,
    stack_params,
    tp_param_specs,
)
from multi_modal_normative_modeling_tpu.train import TrainConfig


def _make_problem(n_folds=2, n=48, dims=(24, 30), hidden=(16, 16), seed=0):
    rng = np.random.default_rng(seed)
    model = build_model("cVAE_multimodal", list(dims), list(hidden), 6, 5,
                        len(dims))
    data, cov, params_list, keys = [], [], [], []
    for f in range(n_folds):
        data.append([rng.normal(size=(n, d)).astype(np.float32)
                     for d in dims])
        cov.append([rng.normal(size=(n, 5)).astype(np.float32)] * len(dims))
        params_list.append(model.init_params(jax.random.PRNGKey(100 + f)))
        keys.append(jax.random.PRNGKey(f))
    return model, data, cov, params_list, keys


def _need(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} virtual devices")


def test_tp_specs_megatron_scheme():
    """Even hidden layers column-parallel, odd row-parallel, heads follow
    the activation sharding; non-divisible widths stay replicated."""
    _need(8)
    model, *_, params_list, _ = _make_problem(hidden=(16, 16))
    mesh = make_mesh3(n_fold=2, n_data=1, n_model=4)
    stacked = stack_params(params_list)
    specs = tp_param_specs(mesh, stacked)

    enc = specs["enc"][0]
    # layer 0: column parallel (output features sharded)
    assert enc["hidden"][0]["w"] == P("fold", None, "model")
    assert enc["hidden"][0]["b"] == P("fold", "model")
    # layer 1: row parallel (contraction over sharded features)
    assert enc["hidden"][1]["w"] == P("fold", "model", None)
    assert enc["hidden"][1]["b"] == P("fold", None)
    # activation replicated after the row-parallel layer -> heads replicated
    assert enc["mu"]["w"] == P("fold", None, None)

    dec = specs["dec"][0]
    assert dec["hidden"][0]["w"] == P("fold", None, "model")
    assert dec["hidden"][1]["w"] == P("fold", "model", None)
    assert dec["mean"]["w"] == P("fold", None, None)
    assert specs["dec"][0]["logvar_out"] == P("fold", None, None)

    # odd hidden depth: activation comes out sharded -> heads row-parallel
    model3, *_, plist3, _ = _make_problem(hidden=(16, 16, 16))
    specs3 = tp_param_specs(mesh, stack_params(plist3))
    enc3 = specs3["enc"][0]
    assert enc3["hidden"][2]["w"] == P("fold", None, "model")
    assert enc3["mu"]["w"] == P("fold", "model", None)

    # 110-wide layers don't divide a 4-way model axis: fall back replicated
    model110, *_, plist110, _ = _make_problem(hidden=(110, 110))
    specs110 = tp_param_specs(mesh, stack_params(plist110))
    for layer in specs110["enc"][0]["hidden"]:
        assert layer["w"] == P("fold", None, None)


def test_tp_training_matches_unsharded():
    """The tensor-parallel run is the same program: only the matmul
    partial-sum order differs from the single-device fold-parallel run."""
    _need(8)
    model, data, cov, params_list, keys = _make_problem()
    config = TrainConfig(epochs=3, batch_size=16, combine="gpoe")
    stacked = stack_params(params_list)
    batches = stack_fold_batches(data, cov, config.batch_size)
    kstack = jnp.stack(list(keys))
    n = data[0][0].shape[0]

    ref_params, ref_logs = MultiFoldTrainer(model, config, n).run(
        stacked, batches, kstack)

    mesh = make_mesh3(n_fold=2, n_data=1, n_model=4)
    tp = MultiFoldTrainer(model, config, n, mesh=mesh,
                          shardings_fn=fold_model_shardings)
    tp_params, tp_logs = tp.run(stacked, batches, kstack)

    np.testing.assert_allclose(np.asarray(tp_logs["total"]),
                               np.asarray(ref_logs["total"]),
                               rtol=2e-4, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        ref_params, tp_params)

    # the weight matrices are actually laid out tensor-parallel
    w0 = tp_params["enc"][0]["hidden"][0]["w"]
    assert "model" in str(w0.sharding.spec)


def test_tp_composes_with_data_axis():
    """('fold', 'data', 'model') all at once: batch rows shard over 'data',
    weights over 'model', folds over 'fold'."""
    _need(8)
    model, data, cov, params_list, keys = _make_problem()
    config = TrainConfig(epochs=2, batch_size=16, combine="poe")
    mesh = make_mesh3(n_fold=2, n_data=2, n_model=2)
    n = data[0][0].shape[0]
    tp = MultiFoldTrainer(model, config, n, mesh=mesh,
                          shardings_fn=fold_model_shardings)
    out_params, logs = tp.run(stack_params(params_list),
                              stack_fold_batches(data, cov,
                                                 config.batch_size),
                              jnp.stack(list(keys)))
    total = np.asarray(logs["total"])
    assert total.shape == (2, config.epochs)
    assert np.isfinite(total).all()


def test_tp_milestones_and_opt_state_shardings():
    """run_milestones exercises the explicit optimizer-state argument path
    (_opt_sh -> tensor._opt_shardings): adam momentum blocks mirror the
    tensor-parallel param shardings, and milestone prefixes stay
    bit-identical to the unsharded milestone run."""
    _need(8)
    model, data, cov, params_list, keys = _make_problem()
    config = TrainConfig(epochs=4, batch_size=16, combine="gpoe")
    stacked = stack_params(params_list)
    batches = stack_fold_batches(data, cov, config.batch_size)
    kstack = jnp.stack(list(keys))
    n = data[0][0].shape[0]

    ref = {m: p for m, p, _ in MultiFoldTrainer(model, config, n)
           .run_milestones(stacked, batches, kstack, [2, 4])}

    mesh = make_mesh3(n_fold=2, n_data=1, n_model=4)
    tp = MultiFoldTrainer(model, config, n, mesh=mesh,
                          shardings_fn=fold_model_shardings)
    for m, host_params, logs in tp.run_milestones(stacked, batches, kstack,
                                                  [2, 4]):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            ref[m], host_params)
        assert np.isfinite(np.asarray(logs["total"])).all()
