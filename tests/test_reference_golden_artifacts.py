"""Golden parity against the reference's REAL checked-in artifacts.

The reference repo ships its actual deviation-pipeline outputs
(`deviation/supervised_cvae/<resource>/<procedure>/<modality>/*.csv`,
written by multimodal_kfold_test_cvae_supervised.py:150-176): each set
pairs the model INPUT (`normalized_*.csv`) with the model OUTPUT
(`reconstruction_*.csv`) and the derived deviation artifacts. That makes
the derived files a real-data oracle for this framework's deviation math
(infer/deviation.py) and the emitter column conventions
(infer/emitters.py) — no trained weights needed.

Skipped when the read-only reference checkout is not present (CI without
/root/reference).
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REFERENCE_DEVIATION = Path("/root/reference/deviation/supervised_cvae")

pytestmark = pytest.mark.skipif(
    not REFERENCE_DEVIATION.is_dir(),
    reason="reference checkout with checked-in artifacts not available",
)

META = ["DIA", "AGE", "PTGENDER"]


def artifact_sets():
    if not REFERENCE_DEVIATION.is_dir():
        return []
    sets = []
    for err_csv in sorted(REFERENCE_DEVIATION.rglob("reconstruction_error_*.csv")):
        if "_roi_" in err_csv.name:
            continue
        modality = err_csv.name[len("reconstruction_error_"):-len(".csv")]
        sets.append((err_csv.parent, modality))
    return sets


def _read(directory, stem, modality):
    return pd.read_csv(directory / f"{stem}_{modality}.csv",
                       index_col="participant_id")


def _features(frame):
    return [c for c in frame.columns if c not in META]


@pytest.mark.parametrize(
    "directory,modality",
    artifact_sets(),
    ids=lambda v: v.name if isinstance(v, Path) else v,
)
def test_deviation_math_reproduces_reference_artifacts(directory, modality):
    """reconstruction_deviation / _roi on the reference's real
    (normalized, reconstruction) pairs must reproduce its checked-in
    error CSVs to CSV round-trip precision (reference
    multimodal_kfold_test_cvae_supervised.py:150-176; utils_vae.py
    reconstruction_deviation)."""
    from multi_modal_normative_modeling_tpu.infer.deviation import (
        reconstruction_deviation,
        reconstruction_deviation_roi,
    )

    normalized = _read(directory, "normalized", modality)
    reconstruction = _read(directory, "reconstruction", modality)
    error = _read(directory, "reconstruction_error", modality)
    roi = _read(directory, "reconstruction_error_roi", modality)

    feats = _features(normalized)
    assert feats == _features(reconstruction) == _features(roi)
    assert list(normalized.index) == list(reconstruction.index) \
        == list(error.index) == list(roi.index)

    x = normalized[feats].to_numpy(float)
    x_pred = reconstruction[feats].to_numpy(float)

    np.testing.assert_allclose(
        reconstruction_deviation(x, x_pred),
        error["Reconstruction error"].to_numpy(float),
        atol=1e-7, rtol=0,
    )
    np.testing.assert_allclose(
        reconstruction_deviation_roi(x, x_pred),
        roi[feats].to_numpy(float),
        atol=1e-5, rtol=0,
    )


@pytest.mark.parametrize(
    "directory,modality",
    artifact_sets(),
    ids=lambda v: v.name if isinstance(v, Path) else v,
)
def test_feature_importance_is_numbered_roi_copy(directory, modality):
    """deviation_as_feature_importance_*.csv is the per-ROI error frame
    with feature columns renamed to 1..n — the emitter convention
    infer/emitters.py reproduces (reference test script:171-176)."""
    roi = _read(directory, "reconstruction_error_roi", modality)
    importance = _read(directory, "deviation_as_feature_importance",
                       modality)

    roi_feats = _features(roi)
    imp_feats = _features(importance)
    assert imp_feats == [str(i) for i in range(1, len(roi_feats) + 1)]
    assert list(roi.index) == list(importance.index)
    np.testing.assert_allclose(roi[roi_feats].to_numpy(float),
                               importance[imp_feats].to_numpy(float),
                               atol=0, rtol=0)


def test_reference_artifact_inventory():
    """All 24 checked-in artifact sets (ADNI av45/fdg/vbm/early-fusion ×
    {UCA-gPoE, SM-*} + ADHD fMRI/sMRI/early-fusion × {UCA-gPoE, SM-*},
    each with a path_model twin) are seen and each carries the 5-file
    schema the emitters write."""
    sets = artifact_sets()
    assert len(sets) == 24
    for directory, modality in sets:
        for stem in ("normalized", "reconstruction", "reconstruction_error",
                     "reconstruction_error_roi",
                     "deviation_as_feature_importance"):
            assert (directory / f"{stem}_{modality}.csv").is_file()
