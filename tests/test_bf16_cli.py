"""--precision bf16 through the supervised CLI end-to-end."""
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


def test_bf16_fold_parallel_pipeline(tmp_path):
    make_synthetic_resource(tmp_path, "ADNI", n_hc=50,
                            n_disease={0: 25, 1: 25}, effect=1.0)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SM-fdg", combine="PoE", epochs=25, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=True, precision="bf16",
    )
    train_supervised.main(args, project_root=tmp_path)
    test_supervised.main(args, project_root=tmp_path)
    stats = group_analysis.main(args, project_root=tmp_path)
    assert np.isfinite(stats["auc"]).all()
    assert stats["auc"][0] > 0.6  # bf16 training still learns the signal


def test_bf16_packed_and_grouped_layouts(tmp_path, capsys):
    """--packed_xla composes with --precision bf16 (round 4): the
    mixed-width UCA cohort rides the grouped layout, trains end-to-end and
    learns; short-horizon loss curves track the fp32 grouped run."""
    import jax

    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.train import TrainConfig
    from multi_modal_normative_modeling_tpu.train.grouped import (
        GroupedFoldTrainer,
    )

    # unit-level: bf16 grouped trajectory tracks fp32 over a short horizon
    dims = [24, 24, 72]
    model = build_model("cVAE_multimodal", dims, [12, 10], 6, 5, len(dims))
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(32, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(32, 5)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    fp32 = GroupedFoldTrainer(
        model, TrainConfig(epochs=4, batch_size=16, combine="gpoe"), 32)
    bf16 = GroupedFoldTrainer(
        model, TrainConfig(epochs=4, batch_size=16, combine="gpoe",
                           precision="bf16"), 32)
    assert bf16.loss_meta == {"loss": "packed_grouped",
                              "precision": "bf16", "batch": "16"}
    _, logs32 = fp32.run(params, data, cov, key=key)
    _, logs16 = bf16.run(params, data, cov, key=key)
    np.testing.assert_allclose(logs16["total"], logs32["total"], rtol=2e-2)

    # CLI end-to-end: mixed-width cohort -> grouped layout under bf16
    make_synthetic_resource(tmp_path, "ADNI", n_hc=50,
                            n_disease={0: 25, 1: 25}, effect=1.0,
                            with_early_fusion=True)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="UCA-gPoE", combine="gPoE", epochs=25, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="bf16",
        packed_xla=True,
    )
    train_supervised.main(args, project_root=tmp_path)
    assert "width-grouped modalities" in capsys.readouterr().out
    test_supervised.main(args, project_root=tmp_path)
    stats = group_analysis.main(args, project_root=tmp_path)
    assert np.isfinite(stats["auc"]).all()
    assert stats["auc"][0] > 0.6
