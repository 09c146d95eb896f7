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
