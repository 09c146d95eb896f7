"""Scoring CLI: ensemble deviation scoring of arbitrary subject lists."""
import argparse

import numpy as np
import pandas as pd

from multi_modal_normative_modeling_tpu.cli import score, train_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def test_score_ensemble(tmp_path):
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=60, n_disease={0: 30},
                            effect=1.2)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=30, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=root)

    # score every subject (HC + disease)
    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    ids_path = root / "score_ids.csv"
    y[["IID"]].to_csv(ids_path, index=False)

    score_args = argparse.Namespace(
        dataset_resourse="ADNI", procedure="SM-av45", combine="PoE",
        n_splits=2, ids=str(ids_path), fold=None,
        output=str(root / "scores.csv"),
        roi_output=str(root / "roi_scores.csv"), seed=42, latent=True,
    )
    out = score.score(score_args, project_root=root)
    assert len(out) == len(y)

    # --latent column must match the serving daemon's latent program
    # (deterministic: no PRNG involved, same scalers/binning/train stats)
    from multi_modal_normative_modeling_tpu.cli import serve

    service = serve.ScoringService("ADNI", "SM-av45", combine="PoE",
                                   n_splits=2, project_root=root)
    served = service.score_ids(list(out["participant_id"]), latent=True)
    np.testing.assert_allclose(out["latent_deviation"],
                               served["latent_deviation"],
                               rtol=1e-4, atol=1e-6)

    merged = out.merge(y, left_on="participant_id", right_on="IID")
    hc_dev = merged[merged["DIA"] == 2]["deviation"]
    ad_dev = merged[merged["DIA"] == 0]["deviation"]
    # injected per-subject noise must raise disease deviations
    assert ad_dev.mean() > hc_dev.mean()

    roi = pd.read_csv(root / "roi_scores.csv")
    assert roi.shape == (len(y), 1 + 90)
    assert np.isfinite(roi.iloc[:, 1:].values).all()


def test_score_mesh_matches_unmeshed(tmp_path):
    """--mesh F,D scores the fold ensemble as one sharded program whose
    deviation/ROI outputs match the sequential per-fold ensemble to
    float-reorder tolerance; --latent under --mesh is refused with an
    actionable error."""
    import pytest

    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=60, n_disease={0: 30},
                            effect=1.2)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-av45", combine="PoE", epochs=10, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=root)

    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    ids_path = root / "score_ids.csv"
    y[["IID"]].to_csv(ids_path, index=False)

    def args_for(mesh=None, latent=False, suffix=""):
        return argparse.Namespace(
            dataset_resourse="ADNI", procedure="SM-av45", combine="PoE",
            n_splits=2, ids=str(ids_path), fold=None,
            output=str(root / f"scores{suffix}.csv"),
            roi_output=str(root / f"roi{suffix}.csv"), seed=42,
            latent=latent, mesh=mesh)

    plain = score.score(args_for(suffix="_plain"), project_root=root)
    meshed = score.score(args_for(mesh="2,4", suffix="_mesh"),
                         project_root=root)
    np.testing.assert_allclose(meshed["deviation"], plain["deviation"],
                               rtol=1e-5, atol=1e-7)
    roi_plain = pd.read_csv(root / "roi_plain.csv")
    roi_mesh = pd.read_csv(root / "roi_mesh.csv")
    assert list(roi_mesh.columns) == list(roi_plain.columns)
    np.testing.assert_allclose(roi_mesh.iloc[:, 1:].values,
                               roi_plain.iloc[:, 1:].values,
                               rtol=1e-4, atol=1e-6)

    with pytest.raises(SystemExit, match="latent"):
        score.score(args_for(mesh="2,4", latent=True), project_root=root)
    with pytest.raises(SystemExit, match="devices"):
        score.score(args_for(mesh="3,4"), project_root=root)


def test_score_single_subject_and_cohort_independence(tmp_path):
    """Serving covariates bin by TRAIN quantile edges: a subject's score
    must not depend on who else is in the ids CSV, and a one-subject list
    must work (test-split re-binning would crash pd.qcut there)."""
    root = tmp_path
    make_synthetic_resource(root, "ADNI", n_hc=50, n_disease={0: 20},
                            effect=1.0)
    train_args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[12, 12, 4],
        procedure="SM-av45", combine="PoE", epochs=10, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(train_args, project_root=root)

    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    all_ids = root / "all_ids.csv"
    y[["IID"]].to_csv(all_ids, index=False)
    one_id = root / "one_id.csv"
    y[["IID"]].head(1).to_csv(one_id, index=False)

    def args_for(ids_path):
        return argparse.Namespace(
            dataset_resourse="ADNI", procedure="SM-av45", combine="PoE",
            n_splits=2, ids=str(ids_path), fold=0, output=None,
            roi_output=None, seed=42)

    full = score.score(args_for(all_ids), project_root=root)
    single = score.score(args_for(one_id), project_root=root)
    assert len(single) == 1
    target = full[full["participant_id"]
                  == single["participant_id"].iloc[0]]["deviation"].iloc[0]
    np.testing.assert_allclose(single["deviation"].iloc[0], target,
                               rtol=1e-5)
