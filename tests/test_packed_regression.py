"""Packed regression layout (models/grouped_regression.py) ≡
RegressionCVAE: forward/loss, shuffled trained trajectories (the packed
zoo's only shuffling trainer), fold-parallel, resume, and the regression
CLI routing."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models.grouped_regression import (
    GroupedRegressionCVAE,
)
from multi_modal_normative_modeling_tpu.models.regression import (
    RegressionCVAE,
)
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig
from multi_modal_normative_modeling_tpu.train.packed_regression import (
    GroupedRegressionMultiTrainer,
    GroupedRegressionTrainer,
    regression_state_dirname,
)

DIMS = [24, 24, 72]
C = 2  # raw [AGE, PTGENDER]


def _pair():
    base = RegressionCVAE(DIMS, [12, 10], 6, C, len(DIMS))
    grouped = GroupedRegressionCVAE(DIMS, [12, 10], 6, C, len(DIMS))
    params = base.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    fi = rng.normal(size=(9,)).astype(np.float32)
    return base, grouped, params, grouped.pack_params(params), xes, c, fi


def test_forward_and_loss_equivalence():
    base, grouped, params, gpacked, xes, c, fi = _pair()
    key = jax.random.PRNGKey(3)
    mask = jnp.asarray(np.r_[np.ones(7), np.zeros(2)].astype(np.float32))

    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           "gpoe")
    loss_ref = base.loss(params, xes, fwd_ref, fi, mask=mask)
    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, jnp.asarray(c), key, "gpoe")
    loss = grouped.loss(gpacked, x_groups, fwd, fi, mask=mask)

    np.testing.assert_allclose(np.asarray(fwd["fi_pred"]),
                               np.asarray(fwd_ref["fi_pred"]), rtol=1e-4,
                               atol=1e-5)
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss key {k}")


def test_pack_roundtrip():
    _, grouped, params, gpacked, _, _, _ = _pair()
    restored = grouped.unpack_params(gpacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, params)


def _per_modality_reference(model, config, params, data, cov, fi, key):
    """The exact cli/regression.py per-modality path (shuffle=True,
    custom loss with the fi extras)."""

    def loss_fn(p, batch, k):
        fwd = model.forward(p, list(batch["x"]), list(batch["c"]), k,
                            config.combine)
        losses = model.loss(p, list(batch["x"]), fwd,
                            batch["extras"]["fi"][:, 0], lambda_reg=1.0,
                            mask=batch["mask"])
        return losses["total"], losses

    tr = FoldTrainer(model, config, data[0].shape[0], loss_fn=loss_fn)
    return tr.run(params, data, [cov] * len(data), key=key,
                  extras={"fi": fi[:, None]})


def test_shuffled_trainer_matches_per_modality_trajectory(tmp_path):
    model = RegressionCVAE(DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=8, batch_size=8, combine="gpoe",
                         shuffle=True)  # the reference regression shuffles
    rng = np.random.default_rng(1)
    n = 19
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(n, C)).astype(np.float32)
    fi = rng.normal(size=(n,)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    p_ref, logs_ref = _per_modality_reference(model, config, params, data,
                                              cov, fi, key)
    gt = GroupedRegressionTrainer(model, config, n)
    p_got, logs_got = gt.run(params, data, cov, fi, key)

    np.testing.assert_allclose(logs_got["total"], logs_ref["total"],
                               rtol=2e-4)
    np.testing.assert_allclose(logs_got["regression"],
                               logs_ref["regression"], rtol=2e-3,
                               atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
        p_got, p_ref)

    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    p_res, _ = gt.run_resumable(params, data, cov, fi, key, tmp_path,
                                checkpoint_every=3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_res, p_got)
    assert peek_train_meta(tmp_path)["loss"] == "packed_grouped_regression"


def test_fold_parallel_matches_sequential():
    model = RegressionCVAE(DIMS, [10, 8], 4, C, len(DIMS))
    config = TrainConfig(epochs=6, batch_size=8, combine="gpoe",
                         shuffle=True)
    rng = np.random.default_rng(2)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32) for d in DIMS]
        cov = rng.normal(size=(16, C)).astype(np.float32)
        fi = rng.normal(size=(16,)).astype(np.float32)
        folds.append((data, cov, fi))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    gt = GroupedRegressionTrainer(model, config, 16)
    seq = [gt.run(params, d, c, fi, k)
           for (d, c, fi), k in zip(folds, keys)]
    mt = GroupedRegressionMultiTrainer(model, config, 16)
    par_params, par_logs = mt.run([params] * 2, folds, keys)

    for f in range(2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            par_params[f], seq[f][0])
        np.testing.assert_allclose(par_logs[f]["total"],
                                   seq[f][1]["total"], rtol=1e-5)


def test_cli_packed_routes_and_matches(tmp_path, capsys):
    """regression CLI --packed_xla: announced, artifacts written, FI
    predictions match the per-modality run to float tolerance."""
    from multi_modal_normative_modeling_tpu.cli import regression
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    def _args(**over):
        ns = dict(dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
                  combine="gpoe", procedure="SE-gPoE", epochs=8,
                  n_splits=2, batch_size=32, base_learning_rate=0.0001,
                  fold_parallel=False, packed_xla=False)
        ns.update(over)
        return argparse.Namespace(**ns)

    plain_root = tmp_path / "plain"
    pk_root = tmp_path / "pk"
    for root in (plain_root, pk_root):
        make_synthetic_resource(root, "ADNI", n_hc=40,
                                n_disease={0: 20, 1: 20}, seed=3,
                                with_fi=True)
    scores_plain = regression.train_and_test(_args(),
                                             project_root=plain_root)
    scores_pk = regression.train_and_test(
        _args(packed_xla=True, fold_parallel=True), project_root=pk_root)
    out = capsys.readouterr().out
    assert "width-grouped regression" in out
    for sp, sk in zip(scores_plain, scores_pk):
        np.testing.assert_allclose(sk["RMSE"], sp["RMSE"], rtol=2e-2)
    for fold in range(2):
        a = np.load(plain_root / "regression_outputs"
                    / f"fold_{fold}_pred.npy")
        b = np.load(pk_root / "regression_outputs"
                    / f"fold_{fold}_pred.npy")
        np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-3)
    assert regression_state_dirname() == "grouped-reg-state"
