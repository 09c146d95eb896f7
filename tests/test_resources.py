"""Resource coverage: HCP (12 modalities) and PPMI (3485-dim) pipelines."""
import argparse

import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.cli import (
    group_analysis,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def _args(resource, **overrides):
    base = dict(
        dataset_resourse=resource,
        hz_para_list=[16, 16, 6],
        procedure="SE-PoE",
        combine="PoE",
        epochs=5,
        n_splits=2,
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


def test_hcp_twelve_modalities(tmp_path):
    root = tmp_path
    make_synthetic_resource(root, "HCP", n_hc=30, n_disease={0: 15},
                            effect=0.8)
    args = _args("HCP")
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    stats = group_analysis.main(args, project_root=root)
    # HCP has one hc/disease pair [1, 0]
    assert len(stats["auc"]) == 1
    assert np.isfinite(stats["auc"]).all()
    # all 12 HCP stat-map modalities emitted deviation CSVs
    dev_dir = root / "deviation" / "supervised_cvae" / "HCP" / "SE-PoE" / "path_model"
    assert len(list(dev_dir.iterdir())) == 12


def test_hcpimage_three_modalities(tmp_path):
    # HCPimage = [T1w_sMRI, T2w_sMRI, fMRI] on AAL-116 columns, hc label 1
    # (reference utils.py:731-774); the only registered resource that had no
    # end-to-end pipeline test.
    root = tmp_path
    make_synthetic_resource(root, "HCPimage", n_hc=24, n_disease={0: 12},
                            effect=0.8)
    args = _args("HCPimage")
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    stats = group_analysis.main(args, project_root=root)
    assert len(stats["auc"]) == 1
    assert np.isfinite(stats["auc"]).all()
    dev_dir = (root / "deviation" / "supervised_cvae" / "HCPimage" / "SE-PoE"
               / "path_model")
    assert len(list(dev_dir.iterdir())) == 3


def test_ppmi_wide_features(tmp_path):
    root = tmp_path
    make_synthetic_resource(root, "PPMI", n_hc=24, n_disease={0: 12},
                            effect=0.8,
                            modalities=["PPMI_new_modal1_upper_tri"])
    args = _args("PPMI", procedure="SM-PPMI_new_modal1_upper_tri")
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    stats = group_analysis.main(args, project_root=root)
    assert np.isfinite(stats["auc"]).all()
