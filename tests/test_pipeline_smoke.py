"""End-to-end pipeline smoke test on a synthetic ADNI-like cohort.

Runs the full supervised train -> test -> group-analysis chain on CPU with a
tiny config and checks (a) the emitted CSV schemas match the reference goldens
and (b) the deviation classifier finds the injected disease signal (AUC above
chance), i.e. the pipeline is correct, not just plumbed.
"""
import argparse
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

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
        hz_para_list=[32, 32, 8],
        procedure="SE-PoE",
        combine="PoE",
        epochs=40,
        n_splits=3,
        oversample_percentage=1,
        model="cVAE_multimodal",
        single_modality=None,
        base_learning_rate=0.0001,
        max_learning_rate=0.005,
        training_class="nm",
        lr_schedule="constant",
    )
    base.update(overrides)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    root = tmp_path_factory.mktemp("proj")
    make_synthetic_resource(root, "ADNI", n_hc=90,
                            n_disease={0: 40, 1: 40}, effect=0.8)
    args = _args()
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    return root, args


def test_fold_ids_written(project):
    root, args = project
    kfold_dir = root / "outputs" / "kfold_analysis"
    for fold in range(args.n_splits):
        assert (kfold_dir / f"train_ids_{fold:03d}.csv").exists()
        assert (kfold_dir / f"test_ids_{fold:03d}.csv").exists()


def test_checkpoints_written(project):
    root, args = project
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    for fold in range(args.n_splits):
        assert (model_dir / f"{fold:03d}" / "cVAE_model.ckpt").exists()
        assert (model_dir / f"{fold:03d}" / "Lossestraining.png").exists()


def test_deviation_csv_schemas(project):
    root, args = project
    from multi_modal_normative_modeling_tpu import registry

    for name in registry.get_datasets_name("ADNI", args.procedure):
        cols = registry.get_column_name("ADNI", name)
        base = root / "deviation" / "supervised_cvae" / "ADNI" / args.procedure
        mod_dir = base / "path_model" / name

        err = pd.read_csv(mod_dir / f"reconstruction_error_{name}.csv")
        assert list(err.columns) == [
            "participant_id", "DIA", "AGE", "PTGENDER", "Reconstruction error"
        ]
        norm = pd.read_csv(mod_dir / f"normalized_{name}.csv")
        assert list(norm.columns) == (
            ["participant_id", "DIA", "AGE", "PTGENDER"] + cols
        )
        fi = pd.read_csv(mod_dir / f"deviation_as_feature_importance_{name}.csv")
        assert list(fi.columns) == (
            ["participant_id", "DIA", "AGE", "PTGENDER"]
            + [str(i) for i in range(1, len(cols) + 1)]
        )
        roi = pd.read_csv(mod_dir / f"reconstruction_error_roi_{name}.csv")
        recon = pd.read_csv(mod_dir / f"reconstruction_{name}.csv")
        # roi error equals (normalized - reconstruction)^2
        np.testing.assert_allclose(
            roi[cols].values,
            (norm[cols].values - recon[cols].values) ** 2,
            rtol=1e-5, atol=1e-7,
        )
        # every test subject appears exactly once across folds
        assert err["participant_id"].is_unique

        # float-width parity with the reference goldens: normalized and
        # error CSVs carry float64 formatting (scaler/numpy-upcast outputs),
        # reconstructions carry float32 (model predictions)
        def decimals(path, field):
            row = open(path).readlines()[1].strip().split(",")
            frac = row[field].split(".")[-1].rstrip("0")
            return len(frac)

        assert decimals(mod_dir / f"normalized_{name}.csv", 5) > 9
        assert decimals(mod_dir / f"reconstruction_error_{name}.csv", 4) > 9
        assert decimals(mod_dir / f"reconstruction_{name}.csv", 5) <= 9


def test_group_analysis_reports_and_auc(project):
    root, args = project
    stats = group_analysis.main(args, project_root=root)

    assert (root / "result_baseline" / "result_multimodal.txt").exists()
    assert (root / "result_baseline" / "result_4.txt").exists()
    auc_csv = np.loadtxt(root / "cvae_auc_and_std.csv", delimiter=",")
    assert auc_csv.shape == (args.n_splits + 1,)

    # HC(2) vs AD(0): synthetic disease signal must be detected well above
    # chance by the deviation score.
    hc_vs_ad_auc = stats["auc"][0]
    assert hc_vs_ad_auc > 0.75, f"deviation AUC too low: {hc_vs_ad_auc}"


def test_result_multimodal_format(project):
    root, args = project
    text = (root / "result_baseline" / "result_multimodal.txt").read_text()
    assert "Experiment settings: CVAE. ADNI: 2 vs 0." in text
    assert "ROC-AUC: $" in text and "\\pm" in text


def test_vmapped_test_stage_matches_direct_inference(project):
    """The whole-run vmapped inference program (stacked fold axis, padded row
    buckets, on-device PRNG derivation) must reproduce a direct single-fold
    pred_recon call exactly: restore fold 1's checkpoint, re-prepare its
    split, run the model directly with the same PRNG stream (PRNGKey(1001)),
    and compare against the emitted reconstruction CSV."""
    import jax

    from multi_modal_normative_modeling_tpu import registry
    from multi_modal_normative_modeling_tpu.cli import common
    from multi_modal_normative_modeling_tpu.train import load_checkpoint

    root, args = project
    fold = 1
    fold_dir = (root / "outputs" / "kfold_analysis" / "supervised_cvae" /
                f"{fold:03d}")
    _, config = load_checkpoint(fold_dir)
    model = common.build_model_from_config(config)
    template = common.host_init_params(model, seed=0)
    params, _ = load_checkpoint(fold_dir, template_params=template)

    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    participants = root / "data" / args.dataset_resourse / "y.csv"
    kfold_dir = root / "outputs" / "kfold_analysis"
    train_ids, test_ids = common.fold_paths(kfold_dir, fold)
    preps = [common.prepare_modality(root, args.dataset_resourse, name,
                                     participants, train_ids, test_ids)
             for name in dataset_names]
    xes = [np.asarray(p["test_data"], dtype=np.float32) for p in preps]
    cs = [np.asarray(preps[-1]["test_cov"], dtype=np.float32)] * len(preps)

    direct = jax.jit(
        lambda p, x, c: model.pred_recon(p, list(x), list(c),
                                         jax.random.PRNGKey(1000 + fold),
                                         args.combine)
    )(params, tuple(xes), tuple(cs))

    for m, name in enumerate(dataset_names):
        emitted = pd.read_csv(fold_dir / name / f"reconstruction_{name}.csv")
        emitted_vals = emitted.drop(
            columns=["participant_id", "DIA", "AGE", "PTGENDER"]).values
        np.testing.assert_allclose(np.asarray(direct[m]), emitted_vals,
                                   rtol=0, atol=1e-5)
