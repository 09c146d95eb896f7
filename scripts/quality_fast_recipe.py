"""Quality-validate the round-5 fast recipe (--batch_size 512 --precision
bf16 on the packed/grouped layout) against the default configuration.

bench.py's round-5 headroom arms measured full-batch-512 bf16 at +38%
subject-epochs/s on the flagship workload (RESULTS.md) — but throughput
headroom is only real if the delivered model quality holds: a larger batch
means fewer optimizer steps per epoch and bf16 changes the numerics. This
script answers that on the SAME de-saturated synthetic parity cohort the
recorded BASELINE.json quality_parity used (reference
multimodal_kfold_train_cvae_supervised.py at its published operating
point): it runs OUR pipeline (train -> test -> group analysis) once per
config and compares pooled HC-vs-AD AUC to the recorded torch-reference
number.

Run (CPU is fine — quality is platform-independent):
    JAX_PLATFORMS=cpu python scripts/quality_fast_recipe.py
Appends one entry per config to BASELINE.json quality_parity_runs.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def hc_vs_ad_auc(root: Path):
    """Pooled HC(2)-vs-AD(0) AUC — the detectable pair on this cohort
    (shared parser: evaluation/reports.parse_result_auc)."""
    from multi_modal_normative_modeling_tpu.evaluation.reports import (
        parse_result_auc,
    )

    return parse_result_auc(root, "2 vs 0")


CONFIGS = {
    # the recorded quality_parity configuration (ours side)
    "default_fp32_b256": ["--fold_parallel"],
    # the round-5 measured fast recipe: bench flagship_b512_bf16 arm
    "fast_b512_bf16": ["--fold_parallel", "--packed_xla",
                       "--batch_size", "512", "--precision", "bf16"],
    # true full-batch analog for this cohort (~630 train rows/fold -> one
    # step/epoch), the exact regime where the MXU 4x showed on-chip
    "fullbatch_b1024_bf16": ["--fold_parallel", "--packed_xla",
                             "--batch_size", "1024", "--precision", "bf16"],
}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--epochs", type=int, default=10,
                    help="parity-cohort epochs (default matches the "
                         "recorded quality_parity run)")
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS),
                    choices=list(CONFIGS))
    ap.add_argument("--no-record", action="store_true",
                    help="print only; do not append to BASELINE.json")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    from multi_modal_normative_modeling_tpu.cli.early_fusion import (
        build_early_fusion,
    )
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    baseline = json.loads((REPO / "BASELINE.json").read_text())
    recorded = baseline.get("quality_parity", {})
    cohort = recorded.get("cohort", {})
    n_hc = cohort.get("n_hc", 400)
    n_ad = cohort.get("n_ad", 150)
    n_mci = cohort.get("n_mci", 150)
    effect = cohort.get("effect", 0.5)
    offset = cohort.get("offset_effect", 0.3)
    noise = cohort.get("label_noise", 0.25)
    n_splits = cohort.get("n_splits", 10)

    work = Path(tempfile.mkdtemp(prefix="mmnm_quality_fast_"))
    print(f"workdir {work}; cohort hc={n_hc} ad={n_ad} mci={n_mci} "
          f"effect={effect} offset={offset} noise={noise} K={n_splits} "
          f"E={args.epochs}")
    make_synthetic_resource(work, "ADNI", n_hc=n_hc,
                            n_disease={0: n_ad, 1: n_mci}, effect=effect,
                            offset_effect=offset, label_noise=noise)
    build_early_fusion(work, "ADNI")

    env = dict(os.environ)
    # PREPEND the repo (the TPU plugin rides PYTHONPATH — append-safe) and
    # force CPU: quality is platform-independent and the remote attach can
    # stall whole sessions in degraded windows (CLAUDE.md)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["JAX_PLATFORMS"] = "cpu"

    flags = ["-R", "ADNI", "-P", "UCA-gPoE", "-K", str(n_splits),
             "-H", "110", "110", "10", "-E", str(args.epochs),
             "-TrainingClass", "nm"]
    results = {}
    for name in args.configs:
        run_dir = work / name
        run_dir.mkdir()
        shutil.copytree(work / "data", run_dir / "data")
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, "-m",
             "multi_modal_normative_modeling_tpu.cli.pipeline"]
            + flags + CONFIGS[name],
            cwd=run_dir, env=env, capture_output=True, text=True)
        if out.returncode != 0:
            sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
            raise RuntimeError(f"pipeline failed for config {name}")
        secs = time.perf_counter() - t0
        auc, std = hc_vs_ad_auc(run_dir)
        results[name] = {"hc_vs_ad_auc": auc, "hc_vs_ad_auc_std": std,
                         "end_to_end_seconds": round(secs, 2)}
        print(f"{name}: AUC {auc} ± {std} ({secs:.1f}s)")

    report = {
        "experiment": "fast_recipe_quality",
        "reference_hc_vs_ad_auc": recorded.get("reference_hc_vs_ad_auc"),
        "reference_hc_vs_ad_auc_std":
            recorded.get("reference_hc_vs_ad_auc_std"),
        "cohort": {"n_hc": n_hc, "n_ad": n_ad, "n_mci": n_mci,
                   "procedure": "UCA-gPoE", "n_splits": n_splits,
                   "epochs": args.epochs, "effect": effect,
                   "offset_effect": offset, "label_noise": noise},
        "configs": results,
        "ours_platform": "cpu",
    }
    print(json.dumps(report, indent=1))
    if not args.no_record:
        doc = json.loads((REPO / "BASELINE.json").read_text())
        doc.setdefault("quality_parity_runs", []).append(report)
        (REPO / "BASELINE.json").write_text(json.dumps(doc, indent=2))
        print("recorded into BASELINE.json quality_parity_runs")


if __name__ == "__main__":
    main()
