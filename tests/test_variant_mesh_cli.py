"""--mesh for the variant trainers (nmmlp, nmpmcont, regression).

The variant CLIs route training through cli/common.run_folds; with --mesh
the fold-parallel program shards folds over 'fold' and batch rows over
'data' (pure scale-out — GSPMD's only collective is the output gather), so
trained parameters must match the unmeshed fold-parallel run to
partial-sum-order tolerance.
"""
import argparse

import jax
import jax.tree_util as jtu
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import nmmlp, nmpmcont, regression
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.train.checkpoints import (
    load_checkpoint,
)

needs_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU platform")


def _assert_params_close(a, b, rtol=2e-4, atol=2e-5):
    jtu.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol), a, b)


@needs_8_devices
def test_nmmlp_mesh_matches_fold_parallel(tmp_path):
    plain_root = tmp_path / "plain"
    mesh_root = tmp_path / "mesh"
    for root in (plain_root, mesh_root):
        make_synthetic_resource(root, "ADHD", n_hc=60, n_disease={0: 30},
                                effect=1.0)

    def _args(**over):
        base = dict(dataset_resourse="ADHD", hz_para_list=[16, 16, 6],
                    combine="moe", procedure="SE-MoE", epochs=10, n_splits=2,
                    oversample_percentage=1, fold_parallel=True)
        base.update(over)
        return argparse.Namespace(**base)

    nmmlp.train(_args(), plain_root)
    nmmlp.train(_args(mesh="2,4"), mesh_root)

    for fold in ("000", "001"):
        plain_params, _ = load_checkpoint(
            plain_root / "outputs/kfold_analysis/supervised_cvae" / fold)
        mesh_params, _ = load_checkpoint(
            mesh_root / "outputs/kfold_analysis/supervised_cvae" / fold)
        _assert_params_close(plain_params, mesh_params)

    args = _args(mesh="2,4")
    nmmlp.test(args, mesh_root)
    stats = nmmlp.analyze(args, mesh_root)
    assert np.isfinite(stats["auc"]).all()


@needs_8_devices
def test_nmpmcont_mesh_matches_fold_parallel(tmp_path):
    plain_root = tmp_path / "plain"
    mesh_root = tmp_path / "mesh"
    for root in (plain_root, mesh_root):
        make_synthetic_resource(root, "ADHD", n_hc=60, n_disease={0: 30},
                                effect=1.0)

    def _args(**over):
        base = dict(
            dataset_resourse="ADHD", hz_para_list=[16, 16, 6], combine="MoE",
            procedure="SE-MoE", epochs=40, n_splits=2,
            oversample_percentage=1, model="cVAE_multimodal",
            single_modality=None, base_learning_rate=0.0001,
            max_learning_rate=0.005, training_class="nm",
            learning_rate_classifier=0.001, margin=1.0,
            weightcontrastive=1.0, weight_kl=1, weight_rec=1, dropout=0.5,
            layers=[16, 8], fold_parallel=True)
        base.update(over)
        return argparse.Namespace(**base)

    plain = nmpmcont.main(_args(), project_root=plain_root)
    meshed = nmpmcont.main(_args(mesh="2,4"), project_root=mesh_root)
    for metric in ("accuracy", "auroc"):
        np.testing.assert_allclose(meshed[metric], plain[metric],
                                   rtol=1e-3, atol=1e-3)


@needs_8_devices
def test_regression_mesh_matches_fold_parallel(tmp_path):
    plain_root = tmp_path / "plain"
    mesh_root = tmp_path / "mesh"
    for root in (plain_root, mesh_root):
        make_synthetic_resource(root, "ADNI", n_hc=40,
                                n_disease={0: 20, 1: 20}, effect=1.0,
                                with_fi=True)

    def _args(**over):
        base = dict(dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
                    combine="gpoe", procedure="SE-gPoE", epochs=10,
                    n_splits=2, batch_size=32, base_learning_rate=0.0001,
                    fold_parallel=True)
        base.update(over)
        return argparse.Namespace(**base)

    plain = regression.train_and_test(_args(), project_root=plain_root)
    meshed = regression.train_and_test(_args(mesh="2,4"),
                                       project_root=mesh_root)
    for p, m in zip(plain, meshed):
        np.testing.assert_allclose(m["RMSE"], p["RMSE"], rtol=1e-3)
        np.testing.assert_allclose(m["MAE"], p["MAE"], rtol=1e-3)


def test_variant_mesh_requires_fold_parallel(tmp_path):
    make_synthetic_resource(tmp_path, "ADHD", n_hc=30, n_disease={0: 15},
                            effect=1.0)
    args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[16, 16, 6], combine="moe",
        procedure="SE-MoE", epochs=2, n_splits=2, oversample_percentage=1,
        fold_parallel=False, mesh="2,4")
    with pytest.raises(SystemExit, match="fold_parallel"):
        nmmlp.train(args, tmp_path)
