"""Fold-parallel training: numerics vs sequential, and mesh execution."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.parallel import (
    MultiFoldTrainer,
    make_mesh,
    stack_fold_batches,
    stack_params,
)
from multi_modal_normative_modeling_tpu.parallel.folds import unstack_params
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig


def _make_problem(n_folds=4, n_base=50, dims=(24, 30), seed=0):
    rng = np.random.default_rng(seed)
    model = build_model("cVAE_multimodal", list(dims), [16, 16], 6, 5,
                        len(dims))
    per_fold_data, per_fold_cov, params_list, keys = [], [], [], []
    for f in range(n_folds):
        n = n_base + f  # ragged folds on purpose
        per_fold_data.append(
            [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
        )
        per_fold_cov.append(
            [rng.normal(size=(n, 5)).astype(np.float32)] * len(dims)
        )
        params_list.append(model.init_params(jax.random.PRNGKey(100 + f)))
        keys.append(jax.random.PRNGKey(f))
    return model, per_fold_data, per_fold_cov, params_list, keys


def test_vmapped_folds_match_sequential():
    model, data, cov, params_list, keys = _make_problem()
    config = TrainConfig(epochs=5, batch_size=16, combine="poe")

    # sequential reference runs
    seq_params = []
    trainer = FoldTrainer(model, config, data[0][0].shape[0])
    for f in range(len(data)):
        # each fold has its own sample count: separate padded batch grids
        p, _ = FoldTrainer(model, config, data[f][0].shape[0]).run(
            params_list[f], data[f], cov[f], key=keys[f]
        )
        seq_params.append(p)

    # fold-vectorized run (shared padded grid across folds)
    stacked = stack_params(params_list)
    batches = stack_fold_batches(data, cov, config.batch_size)
    mft = MultiFoldTrainer(model, config, max(d[0].shape[0] for d in data))
    out_params, logs = mft.run(stacked, batches,
                               jnp.stack([k for k in keys]))
    out_list = unstack_params(out_params, len(data))

    for f in range(len(data)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            ),
            seq_params[f], out_list[f],
        )


def test_mesh_sharded_training_runs():
    n_dev = len(jax.devices())
    if n_dev < 8:
        pytest.skip("needs 8 virtual devices")
    model, data, cov, params_list, keys = _make_problem(n_folds=4)
    config = TrainConfig(epochs=2, batch_size=16, combine="gpoe")
    mesh = make_mesh(n_fold=4, n_data=2)

    stacked = stack_params(params_list)
    batches = stack_fold_batches(data, cov, config.batch_size)
    mft = MultiFoldTrainer(model, config, max(d[0].shape[0] for d in data),
                           mesh=mesh)
    out_params, logs = mft.run(stacked, batches, jnp.stack(list(keys)))
    total = np.asarray(logs["total"])
    assert total.shape == (4, config.epochs)
    assert np.isfinite(total).all()

    # fold axis is actually sharded over the mesh
    leaf = jax.tree_util.tree_leaves(out_params)[0]
    assert "fold" in str(leaf.sharding.spec)
