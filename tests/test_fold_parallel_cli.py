"""--fold_parallel trains all folds in one vmapped program and produces the
same downstream AUC as the sequential path."""
import argparse

import numpy as np

from multi_modal_normative_modeling_tpu.cli import (
    group_analysis,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def _args(**overrides):
    base = dict(
        dataset_resourse="ADNI",
        hz_para_list=[24, 24, 6],
        procedure="SM-av45",
        combine="PoE",
        epochs=25,
        n_splits=3,
        oversample_percentage=1,
        model="cVAE_multimodal",
        single_modality=None,
        base_learning_rate=0.0001,
        max_learning_rate=0.005,
        training_class="nm",
        lr_schedule="constant",
        fold_parallel=False,
        precision="fp32",
    )
    base.update(overrides)
    return argparse.Namespace(**base)


def test_fold_parallel_matches_sequential_auc(tmp_path):
    seq_root = tmp_path / "seq"
    par_root = tmp_path / "par"
    for root in (seq_root, par_root):
        make_synthetic_resource(root, "ADNI", n_hc=60,
                                n_disease={0: 30, 1: 30}, effect=1.0)

    seq_args = _args()
    train_supervised.main(seq_args, project_root=seq_root)
    test_supervised.main(seq_args, project_root=seq_root)
    seq_stats = group_analysis.main(seq_args, project_root=seq_root)

    par_args = _args(fold_parallel=True)
    train_supervised.main(par_args, project_root=par_root)
    test_supervised.main(par_args, project_root=par_root)
    par_stats = group_analysis.main(par_args, project_root=par_root)

    # identical synthetic cohorts + identical numerics => identical AUCs
    np.testing.assert_allclose(par_stats["auc"], seq_stats["auc"],
                               atol=1e-6)
