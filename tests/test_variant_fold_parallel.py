"""--fold_parallel for the variant trainers (nmmlp, nmpmcont, regression)."""
import argparse

import numpy as np
import pandas as pd

from multi_modal_normative_modeling_tpu.cli import nmmlp, nmpmcont, regression
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def test_nmmlp_fold_parallel(tmp_path):
    make_synthetic_resource(tmp_path, "ADHD", n_hc=60, n_disease={0: 30},
                            effect=1.0)
    args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[16, 16, 6], combine="moe",
        procedure="SE-MoE", epochs=20, n_splits=2, oversample_percentage=1,
        fold_parallel=True,
    )
    nmmlp.train(args, tmp_path)
    nmmlp.test(args, tmp_path)
    stats = nmmlp.analyze(args, tmp_path)
    assert stats["auc"] > 0.7, stats


def test_nmpmcont_fold_parallel(tmp_path):
    make_synthetic_resource(tmp_path, "ADHD", n_hc=60, n_disease={0: 30},
                            effect=1.0)
    args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[16, 16, 6], combine="MoE",
        procedure="SE-MoE", epochs=300, n_splits=2, oversample_percentage=1,
        model="cVAE_multimodal", single_modality=None,
        base_learning_rate=0.0001, max_learning_rate=0.005,
        training_class="nm", learning_rate_classifier=0.001, margin=1.0,
        weightcontrastive=1.0, weight_kl=1, weight_rec=1, dropout=0.5,
        layers=[16, 8], fold_parallel=True,
    )
    metrics = nmpmcont.main(args, project_root=tmp_path)
    assert np.isfinite(metrics["accuracy"]).all()


def test_regression_fold_parallel(tmp_path):
    make_synthetic_resource(tmp_path, "ADNI", n_hc=40,
                            n_disease={0: 20, 1: 20}, effect=1.0,
                            with_fi=True)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6], combine="gpoe",
        procedure="SE-gPoE", epochs=15, n_splits=2, batch_size=32,
        base_learning_rate=0.0001, fold_parallel=True,
    )
    scores = regression.train_and_test(args, project_root=tmp_path)
    assert len(scores) == 2
    assert all(np.isfinite(s["RMSE"]) for s in scores)
