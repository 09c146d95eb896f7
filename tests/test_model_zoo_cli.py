"""Every registry model runs through the full train -> test -> group-analysis
CLI chain (tiny config)."""
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

MODELS = ["cVAE_multimodal", "mmJSD", "DMVAE", "WeightedDMVAE", "mvtCAE",
          "mmVAEPlus"]


def _args(model, **overrides):
    base = dict(
        dataset_resourse="ADNI",
        hz_para_list=[24, 24, 8],
        procedure="SE-PoE",
        combine="PoE",
        epochs=8,
        n_splits=2,
        oversample_percentage=1,
        model=model,
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


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("zoo")
    make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 20, 1: 20},
                            effect=0.8)
    return root


@pytest.mark.parametrize("model", MODELS)
def test_model_full_pipeline(cohort, model, recwarn):
    args = _args(model)
    train_supervised.main(args, project_root=cohort)
    test_supervised.main(args, project_root=cohort)
    stats = group_analysis.main(args, project_root=cohort)
    assert np.isfinite(stats["auc"]).all()


def test_mopoe_and_moe_fusions(cohort):
    for combine in ("MoE", "MoPoE", "gPoE"):
        args = _args("cVAE_multimodal", combine=combine,
                     procedure=f"SE-{combine}")
        train_supervised.main(args, project_root=cohort)
        test_supervised.main(args, project_root=cohort)
        stats = group_analysis.main(args, project_root=cohort)
        assert np.isfinite(stats["auc"]).all()


def test_single_modality_procedure(cohort):
    args = _args("cVAE_multimodal", procedure="SM-vbm", combine="PoE")
    train_supervised.main(args, project_root=cohort)
    test_supervised.main(args, project_root=cohort)
    stats = group_analysis.main(args, project_root=cohort)
    assert np.isfinite(stats["auc"]).all()
