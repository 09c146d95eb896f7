#!/usr/bin/env python3
"""Pin pooled ROC-AUCs computed from the reference's REAL checked-in
deviation artifacts into tests/fixtures/reference_pooled_auc.json.

The reference ships the actual outputs of its deviation pipeline
(deviation/supervised_cvae/<resource>/<procedure>/[path_model/]<modality>/
reconstruction_error_<modality>.csv, written by
multimodal_kfold_test_cvae_supervised.py:150-176) and its per-fold AUC
table (cvae_auc_and_std.csv:1-11). Per-fold reproduction of that table is
IMPOSSIBLE from the shipped CSVs — they concatenate all 10 test folds with
no fold-boundary column (verified: participant_id carries no fold key and
row counts match the full cohort) — but the POOLED AUC over the
concatenated cohort is deterministic given the CSVs, so it is pinned here
as a characterization golden: evaluation/metrics.py must keep reproducing
these exact values from the reference's own data.

Label direction follows multimodal_kfold_cvae_group_analysis_1x1.py:105-157
('nm' training class: patients are the positive class, higher deviation =
disease); HC labels per registry.get_hc_label (ADNI=2, others=1,
utils.py:760-774).

Run from the repo root; rewrites the fixture in place.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE_DEVIATION = Path("/root/reference/deviation/supervised_cvae")
FIXTURE = REPO / "tests" / "fixtures" / "reference_pooled_auc.json"


def main() -> None:
    from multi_modal_normative_modeling_tpu.evaluation.metrics import (
        classification_performance,
    )
    from multi_modal_normative_modeling_tpu.registry import get_hc_label

    entries = []
    for err_csv in sorted(
            REFERENCE_DEVIATION.rglob("reconstruction_error_*.csv")):
        if "_roi_" in err_csv.name:
            continue
        rel = err_csv.relative_to(REFERENCE_DEVIATION)
        resource = rel.parts[0]
        hc = get_hc_label(resource)
        frame = pd.read_csv(err_csv)
        scores = frame["Reconstruction error"]
        labels = frame["DIA"]
        pairs = {}
        for disease in sorted(set(labels) - {hc}):
            auc, *_ = classification_performance(
                scores[labels == hc], scores[labels == disease], "nm")
            pairs[f"{hc}_vs_{int(disease)}"] = {
                "pooled_auc": round(float(auc), 12),
                "n_hc": int((labels == hc).sum()),
                "n_disease": int((labels == disease).sum()),
            }
        entries.append({"artifact": str(rel.parent).replace("\\", "/"),
                        "modality": err_csv.name[
                            len("reconstruction_error_"):-len(".csv")],
                        "n_rows": len(frame),
                        "pairs": pairs})

    FIXTURE.write_text(json.dumps({
        "comment": "pooled ROC-AUCs from the reference's checked-in "
                   "deviation CSVs; regenerate with "
                   "scripts/make_reference_auc_golden.py",
        "sets": entries,
    }, indent=1) + "\n")
    print(f"pinned {len(entries)} artifact sets "
          f"({sum(len(e['pairs']) for e in entries)} pooled AUCs) "
          f"-> {FIXTURE}")


if __name__ == "__main__":
    main()
