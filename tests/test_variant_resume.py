"""--checkpoint_every/--resume on the variant trainers (nmmlp, nmpmcont,
regression) through the shared run_folds path: kill-and-resume reproduces
the uninterrupted run's final checkpoints bit-for-bit."""
import argparse

import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import nmmlp, nmpmcont, regression
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)
from multi_modal_normative_modeling_tpu.train import load_checkpoint
from multi_modal_normative_modeling_tpu.train.checkpoints import (
    train_state_exists,
)


def _nmpmcont_args(**overrides):
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[14, 14, 4],
        procedure="SE-MoE", combine="MoE", epochs=4, n_splits=2,
        oversample_percentage=1, margin=1.0, weightcontrastive=0.1,
        layers=[8, 4], dropout=0.5, learning_rate_classifier=0.001,
        lr_schedule="constant", base_learning_rate=0.0001,
        max_learning_rate=0.005,
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def _params_tree(model_dir, fold):
    params, _ = load_checkpoint(model_dir / f"{fold:03d}")
    return params


def _assert_params_equal(a, b):
    import jax

    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)), a, b)


def test_nmpmcont_kill_and_resume_bit_identical(tmp_path):
    """The most complex variant (per-fold label extras + bn_state
    state_update) resumes bit-identically through run_folds."""
    ref_root = tmp_path / "ref"
    res_root = tmp_path / "res"
    for root in (ref_root, res_root):
        root.mkdir()
        make_synthetic_resource(root, "ADNI", n_hc=40,
                                n_disease={0: 15, 1: 15}, effect=0.8)

    # uninterrupted 4-epoch run
    nmpmcont.main(_nmpmcont_args(), project_root=ref_root)
    # killed after 2 epochs (complete run at a shorter -E), then resumed
    nmpmcont.main(_nmpmcont_args(epochs=2, checkpoint_every=2),
                  project_root=res_root)
    nmpmcont.main(_nmpmcont_args(checkpoint_every=2, resume=True),
                  project_root=res_root)

    model_dir = "outputs/kfold_analysis/supervised_cvae"
    for fold in range(2):
        _assert_params_equal(_params_tree(ref_root / model_dir, fold),
                             _params_tree(res_root / model_dir, fold))
    for fold in range(2):
        assert train_state_exists(
            res_root / model_dir / f"{fold:03d}")


def test_nmmlp_checkpoint_every_leaves_state(tmp_path):
    make_synthetic_resource(tmp_path, "ADNI", n_hc=40,
                            n_disease={0: 15, 1: 15}, effect=0.8)
    args = argparse.Namespace(
        action="train", dataset_resourse="ADNI", hz_para_list=[14, 14, 4],
        procedure="SE-MoE", combine="MoE", epochs=4, n_splits=2,
        oversample_percentage=1, base_learning_rate=1e-6,
        max_learning_rate=5e-5, checkpoint_every=2,
    )
    nmmlp.train(args, project_root=tmp_path)
    model_dir = tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae"
    for fold in range(2):
        assert (model_dir / f"{fold:03d}" / "cVAE_model.ckpt").exists()
        assert train_state_exists(model_dir / f"{fold:03d}")


def test_regression_checkpoint_every_leaves_state(tmp_path):
    make_synthetic_resource(tmp_path, "ADNI", n_hc=40,
                            n_disease={0: 15, 1: 15}, effect=0.8,
                            with_fi=True)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[14, 14, 4],
        procedure="SE-gPoE", combine="gPoE", epochs=4, n_splits=2,
        batch_size=16, base_learning_rate=0.0001, max_learning_rate=0.005,
        lambda_reg=1.0, checkpoint_every=2,
    )
    regression.train_and_test(args, project_root=tmp_path)
    out_dir = tmp_path / "regression_outputs"
    assert (out_dir / "fold_0_pred.npy").exists()
    for fold in range(2):
        assert train_state_exists(out_dir / f"{fold:03d}")
