"""Unit tests for scripts/baseline_probe.py's quality-parity parsers.

The probe itself runs the reference's torch scripts (minutes of CPU) and is
exercised out-of-band; the parsers that pull metric blocks out of both
sides' artifacts are pure functions tested here on fixture text that matches
the reference writers byte-for-byte (nmpmcont:330-338, nmmlp:637-643,
regression:147-148).
"""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "baseline_probe",
    Path(__file__).resolve().parent.parent / "scripts" / "baseline_probe.py")
probe = importlib.util.module_from_spec(_SPEC)
sys.modules["baseline_probe"] = probe
_SPEC.loader.exec_module(probe)


def test_parse_endtoend_results_last_block(tmp_path):
    text = (
        "Namespace(epochs=3, n_splits=2)\n"
        "accuracy $0.500 \\pm 0.010$\n"
        "auroc $0.510 \\pm 0.020$\n"
        "\n\n\n"
        "Namespace(epochs=200, n_splits=5)\n"
        "accuracy $0.801 \\pm 0.062$\n"
        "auroc $0.751 \\pm 0.057$\n"
        "sensitivity $0.558 \\pm 0.114$\n"
        "specificity $0.943 \\pm 0.017$\n"
        "f1_score $0.663 \\pm 0.086$\n"
        "\n\n\n")
    (tmp_path / "results_endtoend.csv").write_text(text)
    metrics = probe.parse_endtoend_results(tmp_path)
    # LAST block wins
    assert metrics["accuracy"] == [0.801, 0.062]
    assert metrics["f1_score"] == [0.663, 0.086]
    assert len(metrics) == 5


def test_parse_endtoend_results_requires_block(tmp_path):
    (tmp_path / "results_endtoend.csv").write_text("Namespace()\n\n")
    with pytest.raises(RuntimeError, match="no metrics block"):
        probe.parse_endtoend_results(tmp_path)


def test_parse_nmmlp_metrics_last_block(tmp_path):
    text = (
        "Overall Performance:\n"
        "Mean ROC AUC: 0.1000 ± 0.0100\n"
        "Overall Performance:\n"
        "Mean ROC AUC: 0.8123 ± 0.0456\n"
        "Mean Accuracy: 0.7500 ± 0.0300\n"
        "Mean Sensitivity: 0.7000 ± 0.0500\n"
        "Mean Specificity: 0.8000 ± 0.0400\n"
        "Mean Significance Ratio: 4.3276 ± 1.2345\n")
    out = tmp_path / "outputs" / "analysis_results"
    out.mkdir(parents=True)
    (out / "performance_metrics.txt").write_text(text)
    metrics = probe.parse_nmmlp_metrics(tmp_path)
    assert metrics["ROC AUC"] == [0.8123, 0.0456]
    assert metrics["Significance Ratio"] == [4.3276, 1.2345]
    assert len(metrics) == 5


def test_regression_scores_from_npy(tmp_path):
    out = tmp_path / "regression_outputs"
    out.mkdir()
    rng = np.random.default_rng(0)
    for fold in range(3):
        true = rng.normal(30.0, 2.0, size=40).astype(np.float32)
        pred = true + rng.normal(0.0, 0.5, size=40).astype(np.float32)
        np.save(out / f"fold_{fold}_true.npy", true)
        np.save(out / f"fold_{fold}_pred.npy", pred)
    scores = probe.regression_scores(tmp_path)
    assert set(scores) == {"RMSE", "MAE", "R2", "MAPE"}
    rmse_mean, rmse_std = scores["RMSE"]
    assert 0.3 < rmse_mean < 0.7 and rmse_std >= 0.0
    assert 0.85 < scores["R2"][0] <= 1.0
    # MAPE is a percent
    assert 0.5 < scores["MAPE"][0] < 3.0


def test_regression_scores_requires_folds(tmp_path):
    (tmp_path / "regression_outputs").mkdir()
    with pytest.raises(RuntimeError, match="no fold_"):
        probe.regression_scores(tmp_path)
