"""End-to-end tests for the variant pipelines: nm-MLP, nm-PM-cont, regression,
classifier baseline, early fusion."""
import argparse

import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.cli import (
    classifier_baseline,
    early_fusion,
    nmmlp,
    nmpmcont,
    regression,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


@pytest.fixture(scope="module")
def adhd_project(tmp_path_factory):
    root = tmp_path_factory.mktemp("adhd")
    make_synthetic_resource(root, "ADHD", n_hc=80, n_disease={0: 40},
                            effect=1.0)
    return root


def test_nmmlp_train_test_analyze(adhd_project):
    root = adhd_project
    args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[24, 24, 6], combine="moe",
        procedure="SE-MoE", epochs=30, n_splits=3, oversample_percentage=1,
    )
    nmmlp.train(args, root)
    nmmlp.test(args, root)
    stats = nmmlp.analyze(args, root)

    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    diag = pd.read_csv(model_dir / "000" / "diagnosis_results.csv")
    assert list(diag.columns) == ["participant_id", "Diagnosis", "True_Label"]
    # nm-MLP trains on HC only: injected per-subject disease noise must be
    # detected
    assert stats["auc"] > 0.8, stats
    report = (root / "outputs" / "analysis_results" /
              "performance_metrics.txt").read_text()
    assert "Mean ROC AUC" in report
    # nmmlp test CSV layout: features first, participant_id last
    norm = pd.read_csv(model_dir / "000" / "fMRI" / "normalized_fMRI.csv")
    assert norm.columns[-1] == "participant_id"


def test_nmmlp_analyze_without_any_diagnosis_csvs(tmp_path):
    """analyze on a project where test never ran: no NaN means, no
    RuntimeWarning (reference nmmlp:637 would np.mean([]))."""
    import warnings

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10})
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[24, 24, 6], combine="moe",
        procedure="SE-MoE", epochs=5, n_splits=3, oversample_percentage=1,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        stats = nmmlp.analyze(args, root)
    assert stats == {"auc": None, "auc_std": None}
    # nothing appended to the report
    report = root / "outputs" / "analysis_results" / "performance_metrics.txt"
    assert not report.exists()


def test_nmpmcont_endtoend(adhd_project):
    root = adhd_project
    args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[24, 24, 6], combine="MoE",
        procedure="SE-MoE", epochs=30, n_splits=3, oversample_percentage=1,
        model="cVAE_multimodal", single_modality=None,
        base_learning_rate=0.0001, max_learning_rate=0.005,
        training_class="nm", learning_rate_classifier=0.001, margin=1.0,
        weightcontrastive=1.0, weight_kl=1, weight_rec=1, dropout=0.5,
        layers=[32, 16],
    )
    # tiny cohort -> one batch per epoch; needs more optimizer steps than the
    # reference's full-size default to converge
    args.epochs = 1200
    metrics = nmpmcont.main(args, project_root=root)
    assert set(metrics.columns) == {
        "accuracy", "auroc", "sensitivity", "specificity", "f1_score"
    }
    # supervised latent classifier should beat chance on the synthetic signal
    assert metrics["accuracy"].mean() > 0.6, metrics
    text = (root / "results_endtoend.csv").read_text()
    assert "accuracy $" in text and "\\pm" in text


def test_regression_pipeline(tmp_path):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=60, n_disease={0: 30, 1: 30},
                            effect=1.0, with_fi=True)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[24, 24, 6], combine="gpoe",
        procedure="SE-gPoE", epochs=30, n_splits=2, batch_size=64,
        base_learning_rate=0.0001,
    )
    scores = regression.train_and_test(args, project_root=root)
    out = root / "regression_outputs"
    assert (out / "fold_0_pred.npy").exists()
    assert (out / "fold_0_scatter.png").exists()
    roiwise = pd.read_csv(out / "deviation_fold_0_av45_roiwise.csv")
    assert roiwise.columns[0] == "IID"
    assert roiwise.columns[1] == "ROI_0"
    assert len(roiwise) == 120  # full cohort
    assert np.isfinite(scores[0]["RMSE"])


def test_classifier_baseline(tmp_path, monkeypatch):
    root = tmp_path
    make_synthetic_resource(root, "ADHD", n_hc=100, n_disease={0: 100},
                            effect=1.2)
    monkeypatch.chdir(root)
    args = classifier_baseline.build_parser().parse_args([
        "--fmri_path", str(root / "data" / "ADHD" / "fMRI.csv"),
        "--labels_path", str(root / "data" / "ADHD" / "y.csv"),
        "--num_epochs", "300",
        "--hidden_layers", "32", "16",
        "--checkpoint_path", str(root / "best_model.pth"),
    ])
    metrics = classifier_baseline.main(args)
    assert set(metrics) == {
        "Accuracy", "Sensitivity (Recall for class 1)",
        "Specificity (Recall for class 0)", "F1-Score", "AUROC",
    }
    assert (root / "best_model_metrics.txt").exists()
    assert (root / "experiment_results.json").exists()


def test_early_fusion_builder(tmp_path):
    root = tmp_path
    make_synthetic_resource(root, "ADHD", n_hc=20, n_disease={0: 10})
    out = early_fusion.build_early_fusion(root, "ADHD")
    frame = pd.read_csv(out)
    from multi_modal_normative_modeling_tpu import registry

    expected = 1 + sum(
        len(registry.get_column_name("ADHD", m))
        for m in registry.BASE_MODALITIES["ADHD"]
    )
    assert frame.shape[1] == expected
    assert any(c.endswith("_fMRI") for c in frame.columns)
    assert any(c.endswith("_sMRI") for c in frame.columns)


def test_nmmlp_test_uses_saved_architecture(adhd_project):
    """nmmlp test must rebuild the model from the checkpoint config (the
    reference unpickles the trained module), so running test with a
    different -H than train still evaluates the trained shape."""
    root = adhd_project
    train_args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[24, 24, 6], combine="moe",
        procedure="SE-MoE", epochs=5, n_splits=3, oversample_percentage=1,
    )
    nmmlp.train(train_args, root)
    test_args = argparse.Namespace(
        dataset_resourse="ADHD", hz_para_list=[10, 4],  # WRONG shape
        combine="moe", procedure="SE-MoE", epochs=5, n_splits=3,
        oversample_percentage=1,
    )
    nmmlp.test(test_args, root)  # must not raise / mis-restore
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    assert (model_dir / "000" / "diagnosis_results.csv").exists()
