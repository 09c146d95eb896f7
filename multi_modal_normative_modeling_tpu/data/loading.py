"""CSV ingestion and k-fold id generation.

Behavioral parity with the reference data layer:
  * ``load_dataset`` / ``load_demographic_data``  — utils.py:112-168 (merge a
    modality CSV with the demographic table on IID, honoring the three id
    formats Run_ID / Session_ID / plain IID)
  * ``generate_kfold_ids*``                        — utils.py:19-93 (KFold with
    shuffle=True, random_state=42, train ids oversampled with replacement via
    ``np.random.choice``)
  * ``cliff_delta``                                — utils.py:97-109, but
    vectorized (O(n*m) numpy broadcast in chunks instead of Python loops).

All functions take an explicit ``project_root`` instead of the reference's
import-time ``Path.cwd()`` so they are usable as a library.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd


def fast_inner_merge(left: pd.DataFrame, right: pd.DataFrame,
                     on: str = "IID") -> pd.DataFrame:
    """``pd.merge(left, right, on=on)`` replacement for the pipeline's hot
    joins, bit-identical when one side's keys are unique (both pipeline
    cases: modality/demographic tables have unique IIDs; fold-id lists are
    oversampled with duplicates). Builds the row maps with numpy instead of
    pandas' per-call hash-join + string index engines, which dominate
    per-fold data prep (see tests/test_data_layer.py::
    test_fast_inner_merge_matches_pandas). Falls back to pd.merge whenever
    its assumptions don't hold (shared non-key columns, neither side
    unique)."""
    if (on not in left.columns or on not in right.columns
            or len(left.columns.intersection(right.columns)) != 1):
        return pd.merge(left, right, on=on)

    lk = left[on].to_numpy()
    rk = right[on].to_numpy()
    # NaN keys hash-miss in a dict (NaN != NaN) where pd.merge pairs them,
    # and dtype-mismatched key columns should raise pandas' clear error
    # instead of silently matching nothing — both go to pandas
    if (lk.dtype != rk.dtype
            or (lk.dtype.kind == "f" and (np.isnan(lk).any()
                                          or np.isnan(rk).any()))
            or (lk.dtype == object
                and (pd.isna(lk).any() or pd.isna(rk).any()))):
        return pd.merge(left, right, on=on)
    rpos = {k: j for j, k in enumerate(rk)}
    if len(rpos) == len(rk):
        # unique right keys: result = left rows with a match, in left order
        ridx = np.fromiter((rpos.get(k, -1) for k in lk), dtype=np.intp,
                           count=len(lk))
        lrows = np.flatnonzero(ridx >= 0)
        rrows = ridx[lrows]
    else:
        lpos = {k: j for j, k in enumerate(lk)}
        if len(lpos) != len(lk):
            return pd.merge(left, right, on=on)  # M:N join: pandas semantics
        # unique left keys: each right row attaches to its left row; result
        # ordered by left key, right occurrence order within a key (stable)
        lidx = np.fromiter((lpos.get(k, -1) for k in rk), dtype=np.intp,
                           count=len(rk))
        rrows = np.flatnonzero(lidx >= 0)
        order = np.argsort(lidx[rrows], kind="stable")
        rrows = rrows[order]
        lrows = lidx[rrows]
    out_left = left.take(lrows).reset_index(drop=True)
    out_right = right.drop(columns=[on]).take(rrows).reset_index(drop=True)
    return pd.concat([out_left, out_right], axis=1)


def load_demographic_data(demographic_path, ids_path) -> pd.DataFrame:
    """Load the demographic table restricted to the ids in ``ids_path``.

    Handles the three IID formats of utils.py:125-168: composite
    participant/session/run uids, participant/session uids, or plain IIDs.
    Row order follows the merge order of the reference (ids first for the
    composite formats, ids-left merge for the plain format).
    """
    demographic_df = pd.read_csv(demographic_path).dropna()
    ids_df = pd.read_csv(ids_path, usecols=["IID"])

    if "Run_ID" in demographic_df.columns:
        demographic_df = demographic_df.copy()
        demographic_df["uid"] = (
            demographic_df["participant_id"]
            + "_"
            + demographic_df["Session_ID"]
            + "_run-"
            + demographic_df["Run_ID"].apply(str)
        )
        parts = ids_df["IID"].str.split("_")
        ids_df = ids_df.copy()
        ids_df["uid"] = parts.str[0] + "_" + parts.str[1] + "_" + parts.str[2]
        merged = pd.merge(ids_df, demographic_df, on="uid")
        return merged.drop(columns=["uid"])

    if "Session_ID" in demographic_df.columns:
        demographic_df = demographic_df.copy()
        demographic_df["uid"] = (
            demographic_df["participant_id"] + "_" + demographic_df["Session_ID"]
        )
        parts = ids_df["IID"].str.split("_")
        ids_df = ids_df.copy()
        ids_df["uid"] = parts.str[0] + "_" + parts.str[1]
        merged = pd.merge(ids_df, demographic_df, on="uid")
        return merged.drop(columns=["uid"])

    ids_df = ids_df.copy()
    if "participant_id" not in demographic_df.columns:
        # plain-IID tables (the common case) get participant_id synthesized
        # from IID; when the demographic table already carries one, adding
        # it here would collide in the merge (suffixed _x/_y columns that
        # break every downstream participant_id consumer)
        ids_df["participant_id"] = ids_df["IID"]
    return fast_inner_merge(ids_df, demographic_df, on="IID")


def load_dataset(demographic_path, ids_path, modality_path) -> pd.DataFrame:
    """Merge a modality feature CSV with the demographic table (utils.py:112).

    The modality frame is the left side of the merge, so the returned row
    order follows the modality CSV (matching the reference byte-for-byte for
    the emitted deviation CSVs).
    """
    demographic_data = load_demographic_data(demographic_path, ids_path)
    modality_df = pd.read_csv(modality_path)
    return fast_inner_merge(modality_df, demographic_data, on="IID")


def _write_fold_ids(kfold_dir: Path, split_frame: pd.DataFrame,
                    oversample_percentage: float, n_splits: int,
                    test_extra: Optional[pd.Series] = None,
                    random_state: int = 42) -> None:
    """Shared body of the three k-fold id generators."""
    from sklearn.model_selection import KFold

    kfold_dir.mkdir(parents=True, exist_ok=True)
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=random_state)
    for fold, (train_idx, test_idx) in enumerate(kf.split(split_frame)):
        train_ids = split_frame.iloc[train_idx]["IID"]
        test_ids = split_frame.iloc[test_idx]["IID"]
        if test_extra is not None:
            test_ids = pd.concat([test_ids, test_extra])

        oversample_size = int(len(train_ids) * oversample_percentage)
        oversampled = np.random.choice(train_ids, size=oversample_size, replace=True)
        train_out = pd.DataFrame({"IID": oversampled})

        train_out.to_csv(kfold_dir / f"train_ids_{fold:03d}.csv", index=False)
        pd.DataFrame({"IID": test_ids}).to_csv(
            kfold_dir / f"test_ids_{fold:03d}.csv", index=False
        )


def generate_kfold_ids(HC_group, other_group, oversample_percentage=1,
                       n_splits=5, project_root: Optional[Path] = None) -> None:
    """Split the concatenation of both groups; both classes appear in train
    folds (utils.py:73-93 — note the supervised trainer does NOT filter to HC,
    SURVEY.md Q4)."""
    root = Path(project_root) if project_root else Path.cwd()
    full_group = pd.concat([HC_group, other_group])
    _write_fold_ids(root / "outputs" / "kfold_analysis", full_group,
                    oversample_percentage, n_splits)


def generate_kfold_ids_with_unigroup(HC_group, other_group,
                                     oversample_percentage=1, n_splits=5,
                                     project_root: Optional[Path] = None) -> None:
    """Split HC only; every patient joins every test fold (utils.py:50-70)."""
    root = Path(project_root) if project_root else Path.cwd()
    _write_fold_ids(root / "outputs" / "kfold_analysis", HC_group,
                    oversample_percentage, n_splits,
                    test_extra=other_group["IID"])


def generate_kfold_ids_endtoend(HC_group, other_group, oversample_percentage=1,
                                n_splits=5, random_state=42,
                                project_root: Optional[Path] = None) -> None:
    """Same split as ``generate_kfold_ids`` but written to the endtoend dir
    (utils.py:19-42)."""
    root = Path(project_root) if project_root else Path.cwd()
    full_group = pd.concat([HC_group, other_group])
    _write_fold_ids(root / "outputs" / "kfold_analysis_endtoend", full_group,
                    oversample_percentage, n_splits, random_state=random_state)


def cliff_delta(X, Y, chunk: int = 4096) -> float:
    """Cliff's delta effect size, numerically identical to utils.py:97-109
    but computed with chunked numpy broadcasting instead of an O(n*m) Python
    double loop."""
    X = np.asarray(X, dtype=np.float64).ravel()
    Y = np.asarray(Y, dtype=np.float64).ravel()
    total = 0.0
    for start in range(0, len(X), chunk):
        xs = X[start:start + chunk, None]
        total += np.sum(np.sign(xs - Y[None, :]))
    return total / (len(X) * len(Y))
