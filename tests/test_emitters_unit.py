"""Direct unit tests for infer/emitters.py: the five per-(fold, modality)
deviation CSVs and the combined all-fold emission (reference
multimodal_kfold_test_cvae_supervised.py:116-178 schemas)."""
import numpy as np
import pandas as pd
import pytest

from multi_modal_normative_modeling_tpu.infer.emitters import (
    DeviationEmitter,
    write_csv,
)

KINDS = ("normalized", "reconstruction", "reconstruction_error",
         "reconstruction_error_roi", "deviation_as_feature_importance")


@pytest.fixture
def emitted(tmp_path):
    rng = np.random.default_rng(0)
    emitter = DeviationEmitter(["av45"])
    cols = ["ROI_a", "ROI_b", "ROI_c"]
    folds = []
    for fold in range(2):
        n = 4 + fold
        cov = pd.DataFrame({
            "participant_id": [f"f{fold}_s{i}" for i in range(n)],
            "DIA": np.zeros(n, dtype=np.int64),
            "AGE": np.full(n, 70.0),
            "PTGENDER": np.ones(n, dtype=np.int64),
        })
        x = rng.normal(size=(n, 3))
        pred = x + 0.1
        dev = ((x - pred) ** 2).mean(axis=1)
        fold_dir = tmp_path / f"fold_{fold}"
        emitter.emit_fold(fold_dir, "av45", cols, cov, x, pred, dev)
        folds.append((fold_dir, x, pred, dev, cov))
    emitter.emit_combined(tmp_path / "combined")
    return tmp_path, cols, folds


def test_five_csvs_per_fold_with_golden_schemas(emitted):
    tmp_path, cols, folds = emitted
    for fold_dir, x, pred, dev, cov in folds:
        for kind in KINDS:
            path = fold_dir / "av45" / f"{kind}_av45.csv"
            assert path.exists(), kind
        norm = pd.read_csv(fold_dir / "av45" / "normalized_av45.csv")
        assert list(norm.columns) == \
            ["participant_id", "DIA", "AGE", "PTGENDER"] + cols
        np.testing.assert_allclose(norm[cols].values, x, rtol=1e-12)
        err = pd.read_csv(fold_dir / "av45" / "reconstruction_error_av45.csv")
        assert list(err.columns)[-1] == "Reconstruction error"
        np.testing.assert_allclose(err["Reconstruction error"].values, dev,
                                   rtol=1e-12)
        roi = pd.read_csv(
            fold_dir / "av45" / "reconstruction_error_roi_av45.csv")
        np.testing.assert_allclose(roi[cols].values, (x - pred) ** 2,
                                   rtol=1e-12)
        # feature-importance renames ROI columns to '1'..'N'
        fi = pd.read_csv(
            fold_dir / "av45" /
            "deviation_as_feature_importance_av45.csv")
        assert list(fi.columns) == \
            ["participant_id", "DIA", "AGE", "PTGENDER", "1", "2", "3"]


def test_combined_concatenates_folds_in_order(emitted):
    tmp_path, cols, folds = emitted
    combined = pd.read_csv(
        tmp_path / "combined" / "av45" / "normalized_av45.csv")
    assert len(combined) == sum(len(cov) for _, _, _, _, cov in folds)
    expected_ids = [pid for _, _, _, _, cov in folds
                    for pid in cov["participant_id"]]
    assert list(combined["participant_id"]) == expected_ids


def test_write_csv_matches_pandas_bytes(tmp_path):
    frame = pd.DataFrame({
        "participant_id": ["a", "b"],
        "DIA": np.array([0, 1], dtype=np.int64),
        "v64": np.array([0.1234567890123, 1e-5]),
        "v32": np.array([0.25, 3.1e-4], dtype=np.float32),
    })
    write_csv(tmp_path / "fast.csv", frame)
    frame.to_csv(tmp_path / "ref.csv", index=False)
    assert (tmp_path / "fast.csv").read_bytes() == \
        (tmp_path / "ref.csv").read_bytes()


def _fold_payload(fold, n=3):
    rng = np.random.default_rng(fold)
    cov = pd.DataFrame({
        "participant_id": [f"f{fold}_s{i}" for i in range(n)],
        "DIA": np.zeros(n, dtype=np.int64),
        "AGE": np.full(n, 70.0),
        "PTGENDER": np.ones(n, dtype=np.int64),
    })
    x = rng.normal(size=(n, 3))
    return cov, x, x + 0.1, ((x - 0.1 - x) ** 2).mean(axis=1)


def test_close_surfaces_write_errors_without_emit_combined(tmp_path):
    """An abort path that never reaches emit_combined must still learn about
    failed per-fold writes (and shut the pool down): close() joins and
    raises; the context manager calls it."""
    emitter = DeviationEmitter(["av45"], write_threads=1)
    cov, x, pred, dev = _fold_payload(0)
    target = tmp_path / "fold_0"
    target.write_text("")  # a FILE where emit_fold needs a directory
    with pytest.raises(OSError):
        emitter.emit_fold(target, "av45", ["a", "b", "c"], cov, x, pred, dev)
    emitter.close()  # idempotent, no pending writes

    bad = DeviationEmitter(["av45"], write_threads=1)
    bad.emit_fold(tmp_path / "fold_1", "av45", ["a", "b", "c"],
                  cov, x, pred, dev)

    def boom(path, frame):
        raise OSError("disk full")

    bad._futures.append(bad._pool.submit(boom, None, None))
    with pytest.raises(RuntimeError, match="write\\(s\\) failed"):
        bad.close()
    assert not bad._futures  # drained


def test_emit_fold_fails_fast_on_completed_write_error(tmp_path):
    """A write that already failed surfaces at the NEXT emit_fold, before
    more device compute, not only at the final join."""
    emitter = DeviationEmitter(["av45"], write_threads=1)

    def boom(path, frame):
        raise OSError("disk full")

    fut = emitter._pool.submit(boom, None, None)
    emitter._futures.append(fut)
    fut.exception()  # wait until it is done
    cov, x, pred, dev = _fold_payload(1)
    with pytest.raises(OSError, match="disk full"):
        emitter.emit_fold(tmp_path / "f", "av45", ["a", "b", "c"],
                          cov, x, pred, dev)
    emitter._futures.clear()
    emitter.close()


def test_context_manager_joins_on_success(tmp_path):
    cov, x, pred, dev = _fold_payload(2)
    with DeviationEmitter(["av45"], write_threads=1) as emitter:
        emitter.emit_fold(tmp_path / "f0", "av45", ["a", "b", "c"],
                          cov, x, pred, dev)
    assert (tmp_path / "f0" / "av45" / "normalized_av45.csv").exists()
