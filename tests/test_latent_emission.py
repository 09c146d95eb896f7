"""--emit_latent writes per-fold latent deviation CSVs."""
import argparse

import numpy as np
import pandas as pd

from multi_modal_normative_modeling_tpu.cli import (
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def test_emit_latent(tmp_path):
    make_synthetic_resource(tmp_path, "ADNI", n_hc=50, n_disease={0: 25},
                            effect=1.0)
    base = dict(
        dataset_resourse="ADNI", hz_para_list=[16, 16, 6],
        procedure="SE-PoE", combine="PoE", epochs=15, n_splits=2,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=False, precision="fp32",
    )
    train_supervised.main(argparse.Namespace(**base), project_root=tmp_path)
    test_supervised.main(argparse.Namespace(**base, emit_latent=True),
                         project_root=tmp_path)

    path = (tmp_path / "outputs" / "kfold_analysis" / "supervised_cvae" /
            "000" / "latent_deviation.csv")
    frame = pd.read_csv(path)
    assert list(frame.columns[:5]) == [
        "participant_id", "DIA", "AGE", "PTGENDER", "Latent deviation"]
    assert "latent 0" in frame.columns and "latent 5" in frame.columns
    assert np.isfinite(frame["Latent deviation"]).all()
    assert (frame["Latent deviation"] > 0).all()
