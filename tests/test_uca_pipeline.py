"""UCA early-fusion procedure end-to-end (the flagship commands_list9 config,
scaled down): 3 base modalities + the early-fusion concat as a 4th."""
import argparse

import numpy as np
import pandas as pd

from multi_modal_normative_modeling_tpu import registry
from multi_modal_normative_modeling_tpu.cli import (
    group_analysis,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def test_uca_gpoe_pipeline(tmp_path):
    make_synthetic_resource(tmp_path, "ADNI", n_hc=60,
                            n_disease={0: 30, 1: 30}, effect=0.9,
                            with_early_fusion=True)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="UCA-gPoE", combine="gPoE", epochs=20, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=True, precision="fp32",
    )
    train_supervised.main(args, project_root=tmp_path)
    test_supervised.main(args, project_root=tmp_path)
    stats = group_analysis.main(args, project_root=tmp_path)
    assert np.isfinite(stats["auc"]).all()

    # the 4th modality is the 270-column early-fusion concat
    names = registry.get_datasets_name("ADNI", "UCA-gPoE")
    assert names[-1] == "early_fusion_modalities_ADNI"
    dev_dir = (tmp_path / "deviation" / "supervised_cvae" / "ADNI" /
               "UCA-gPoE" / "path_model")
    fused = pd.read_csv(
        dev_dir / names[-1] / f"reconstruction_error_roi_{names[-1]}.csv")
    assert fused.shape[1] == 4 + 270
    assert fused.columns[4].endswith("_av45")


def test_in_memory_fusion_matches_file_based(tmp_path):
    """--in_memory_fusion matches the file-based early-fusion path."""
    roots = {}
    for mode in ("file", "mem"):
        root = tmp_path / mode
        make_synthetic_resource(root, "ADNI", n_hc=40,
                                n_disease={0: 20, 1: 20}, effect=0.9,
                                with_early_fusion=True, seed=5)
        args = argparse.Namespace(
            dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
            procedure="UCA-gPoE", combine="gPoE", epochs=10, n_splits=2,
            oversample_percentage=1, model="cVAE_multimodal",
            single_modality=None, base_learning_rate=0.0001,
            max_learning_rate=0.005, training_class="nm",
            lr_schedule="constant", fold_parallel=True, precision="fp32",
            in_memory_fusion=(mode == "mem"),
        )
        train_supervised.main(args, project_root=root)
        test_supervised.main(args, project_root=root)
        roots[mode] = root

    rel = ("deviation/supervised_cvae/ADNI/UCA-gPoE/path_model/"
           "early_fusion_modalities_ADNI/"
           "reconstruction_error_early_fusion_modalities_ADNI.csv")
    # the file-based path re-parses values through the early-fusion CSV
    # (a 1-ulp round trip); in-memory fusion skips that, so compare
    # numerically rather than byte-wise
    ref = pd.read_csv(roots["file"] / rel)
    mem = pd.read_csv(roots["mem"] / rel)
    assert list(ref.columns) == list(mem.columns)
    np.testing.assert_allclose(mem["Reconstruction error"],
                               ref["Reconstruction error"],
                               rtol=1e-5, atol=1e-8)


def test_in_memory_fusion_without_early_fusion_csv(tmp_path):
    """--in_memory_fusion exists so the early-fusion CSV never needs to be
    materialized: the FULL chain (incl. group analysis, whose reference
    merge path reads the last modality's CSV) must work without it."""
    import argparse

    from multi_modal_normative_modeling_tpu.cli import (
        group_analysis,
        test_supervised,
        train_supervised,
    )
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    root = tmp_path / "proj"
    make_synthetic_resource(root, "ADNI", n_hc=40, n_disease={0: 16, 1: 16},
                            effect=0.9, with_early_fusion=False)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 4],
        procedure="UCA-PoE", combine="PoE", epochs=10, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", in_memory_fusion=True,
        emit_latent=False, fused_inference=False, threshold_method="roc",
    )
    assert not (root / "data" / "ADNI"
                / "early_fusion_modalities_ADNI.csv").exists()
    train_supervised.main(args, project_root=root)
    test_supervised.main(args, project_root=root)
    stats = group_analysis.main(args, project_root=root)
    import numpy as np

    assert np.isfinite(stats["auc"][0])
