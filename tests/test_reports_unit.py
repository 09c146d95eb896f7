"""Direct unit tests for evaluation/reports.py: exact text formats of the
append-only result files (reference group_analysis:247-261, nmpmcont:330-338,
nmmlp:637-643)."""
import argparse

import numpy as np
import pandas as pd

from multi_modal_normative_modeling_tpu.evaluation.reports import (
    append_endtoend_results,
    append_performance_metrics,
    append_result_4,
    append_result_multimodal,
    parse_result_auc,
    write_auc_csvs,
)


def _args():
    return argparse.Namespace(procedure="UCA-gPoE", epochs=50,
                              oversample_percentage=1,
                              model="cVAE_multimodal",
                              hz_para_list=[110, 110, 10])


def test_result_multimodal_format(tmp_path):
    append_result_multimodal(tmp_path, "HC vs AD", _args(),
                             [0.9, 0.8], [0.85, 0.75], [0.7, 0.6],
                             [0.95, 0.9], [9.0, 4.0])
    text = (tmp_path / "result_multimodal.txt").read_text()
    assert text.startswith(
        "Experiment settings: CVAE. HC vs AD. Procedure UCA-gPoE Epochs 50 "
        "Oversample percentage 1\n args.Model cVAE_multimodal "
        "args.hz_para_list [110, 110, 10]\n")
    assert "ROC-AUC: $ 85.00 \\pm 5.00 $ \n" in text
    assert "Significance ratio: $ 6.50 \\pm 2.50 $ \n" in text  # not *100
    assert text.endswith("hz_para_list: [110, 110, 10]\n\n\n\n")
    # append-only: a second call adds a second block
    append_result_multimodal(tmp_path, "HC vs AD", _args(),
                             [0.9], [0.8], [0.7], [0.9], [9.0])
    blocks = [b for b in
              (tmp_path / "result_multimodal.txt").read_text().split("\n\n\n")
              if b.strip()]
    assert len(blocks) == 2


def test_parse_result_auc_roundtrip(tmp_path):
    """parse_result_auc inverts append_result_multimodal's ROC-AUC line
    (the one owner of the parse used by baseline_probe/quality scripts),
    selecting the block by comparison fragment."""
    import pytest

    result_dir = tmp_path / "result_baseline"
    append_result_multimodal(result_dir, "ADNI: 2 vs 0", _args(),
                             [0.9, 0.8], [0.85, 0.75], [0.7, 0.6],
                             [0.95, 0.9], [9.0, 4.0])
    append_result_multimodal(result_dir, "ADNI: 2 vs 1", _args(),
                             [0.6, 0.6], [0.6, 0.6], [0.6, 0.6],
                             [0.6, 0.6], [1.0, 1.0])
    auc, std = parse_result_auc(tmp_path, "2 vs 0")
    assert (auc, std) == (0.85, 0.05)
    auc1, _ = parse_result_auc(tmp_path, "2 vs 1")
    assert auc1 == 0.6
    with pytest.raises(RuntimeError, match="0 vs 1"):
        parse_result_auc(tmp_path, "0 vs 1")


def test_result_4_format(tmp_path):
    append_result_4(tmp_path, _args(), [0.9], [0.02], [0.8], [0.03],
                    [0.7], [0.04], [0.95], [0.01], [9.0], [0.5])
    text = (tmp_path / "result_4.txt").read_text()
    assert "HC vs AD, HC vs MCI, MCI vs AD" in text
    assert "ROC-AUC: $ 90.00 \\pm 2.00 $ \n" in text
    assert "Sensitivity: $ 70.00 \\pm 4.00 $ \n" in text


def test_write_auc_csvs_layout(tmp_path):
    aucs = [0.9, 0.8, 0.85]
    write_auc_csvs(tmp_path, tmp_path / "cmp", aucs)
    values = np.loadtxt(tmp_path / "cvae_auc_and_std.csv", delimiter=",")
    assert len(values) == 4                       # folds + trailing std
    np.testing.assert_allclose(values[:3], aucs)
    np.testing.assert_allclose(values[3], np.std(aucs))
    frame = pd.read_csv(tmp_path / "cmp" / "auc_rocs.csv")
    assert list(frame.columns) == ["ROC-AUC"]
    np.testing.assert_allclose(frame["ROC-AUC"].values, aucs)


def test_endtoend_results_format(tmp_path):
    metrics = pd.DataFrame({"accuracy": [0.8, 0.9], "auroc": [0.85, 0.95]})
    path = tmp_path / "results_endtoend.csv"
    append_endtoend_results(path, _args(), metrics)
    text = path.read_text()
    assert text.startswith("Namespace(")
    assert "accuracy $0.850 \\pm 0.071$\n" in text   # pandas ddof=1 std
    assert "auroc $0.900 \\pm 0.071$\n" in text


def test_performance_metrics_format(tmp_path):
    append_performance_metrics(tmp_path, 0.9, 0.01, 0.8, 0.02, 0.7, 0.03,
                               0.95, 0.04, 9.0, 0.5)
    text = (tmp_path / "performance_metrics.txt").read_text()
    assert text.startswith("Overall Performance:\n")
    assert "Mean ROC AUC: 0.9000 ± 0.0100\n" in text
    assert "Mean Significance Ratio: 9.0000 ± 0.5000\n" in text
