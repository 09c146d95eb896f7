#!/usr/bin/env python3
"""Measure the REFERENCE's actual end-to-end wall-clock (torch CPU) on a
synthetic ADNI cohort and record it into BASELINE.json["measured"].

Runs the reference's own scripts (train -> test -> group analysis) unmodified
from a throwaway working directory: the reference sources are copied there AT
RUNTIME (never into this repo), with a tiny `nilearn` stub package providing
`fetch_atlas_aal` from the vendored AAL-116 label list (the real package is
absent from this image and performs a network fetch at import time,
reference utils.py:450-452).

bench.py's vs_baseline uses BASELINE.json["measured"] when present instead of
its in-process hot-loop re-creation.

Usage: python scripts/baseline_probe.py [--epochs 10] [--n-splits 10]
"""
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
REFERENCE = Path(os.environ.get("MMNM_REFERENCE", "/root/reference"))

REF_FILES = [
    "utils.py",
    "utils_vae.py",
    "cVAE.py",
    "multimodal_kfold_train_cvae_supervised.py",
    "multimodal_kfold_test_cvae_supervised.py",
    "multimodal_kfold_cvae_group_analysis_1x1.py",
]

# --variant endtoend: the nm-PM-cont script is self-contained
REF_FILES_ENDTOEND = [
    "utils.py",
    "utils_vae.py",
    "cVAE.py",
    "multimodal_kfold_cvae_nmpmcont.py",
]

# --variant regression: FI-prediction trainer
REF_FILES_REGRESSION = [
    "utils.py",
    "utils_vae.py",
    "cVAE.py",
    "multimodal_kfold_train_cvae_supervised_regression.py",
]

# --variant nmmlp: HC-only normative trainer (train/test/analyze subcommands)
REF_FILES_NMMLP = [
    "utils.py",
    "utils_vae.py",
    "cVAE.py",
    "multimodal_kfold_cvae_nmmlp.py",
]

NILEARN_STUB = '''\
"""Offline stub for the reference's import-time `fetch_atlas_aal` call
(utils.py:450-452): returns the vendored AAL-116 label list."""
import json
from types import SimpleNamespace

def fetch_atlas_aal():
    labels = json.load(open({labels_path!r}))["aal116"]
    return SimpleNamespace(labels=list(labels),
                           indices=[str(i) for i in range(len(labels))])
'''


STATSMODELS_STUB = '''\
"""Offline stub for the reference's statsmodels import (absent from this
image): OLS/Logit with .fit().pvalues backed by the native scipy
implementation (same test statistics; see
multi_modal_normative_modeling_tpu/infer/deviation.py)."""
import sys
# APPEND, never insert(0): the repo root also carries the reference-named
# drop-in shims (cVAE.py, utils.py, ...), which must NOT shadow the staged
# reference's own modules in this work dir (the shims deliberately omit
# dead legacy names like `cVAE` that the reference scripts import)
if {repo!r} not in sys.path:
    sys.path.append({repo!r})
import numpy as np
from multi_modal_normative_modeling_tpu.infer.deviation import (
    _logit_pvalues, _ols_pvalues)


class _Series:
    """ndarray with a .values accessor: the reference does
    sm.OLS(...).fit().pvalues.values (utils_vae.py:167-173)."""

    def __init__(self, arr):
        self.values = np.asarray(arr)

    def __array__(self, dtype=None):
        return np.asarray(self.values, dtype=dtype)

    def __getitem__(self, idx):
        return self.values[idx]


class _Fit:
    def __init__(self, pvalues):
        self.pvalues = _Series(pvalues)


class OLS:
    def __init__(self, y, X):
        self.y, self.X = np.asarray(y, float), np.asarray(X, float)

    def fit(self, **kw):
        return _Fit(_ols_pvalues(self.y, self.X))


class Logit:
    def __init__(self, y, X):
        self.y, self.X = np.asarray(y, float), np.asarray(X, float)

    def fit(self, **kw):
        return _Fit(_logit_pvalues(self.y, self.X))


def _add_constant(x):
    """statsmodels.tools.tools.add_constant: prepend a ones column."""
    x = np.asarray(x, float)
    if x.ndim == 1:
        x = x[:, None]
    return np.column_stack([np.ones(len(x)), x])


class _ToolsInner:
    add_constant = staticmethod(_add_constant)


class _Tools:
    tools = _ToolsInner


tools = _Tools()
'''


def _write_statsmodels_stub(work: Path):
    pkg = work / "statsmodels"
    (pkg / "discrete").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "api.py").write_text(STATSMODELS_STUB.format(repo=str(REPO)))
    (pkg / "discrete" / "__init__.py").write_text("")
    (pkg / "discrete" / "discrete_model.py").write_text(
        "from statsmodels.api import Logit, OLS  # noqa: F401\n")


def _run(cmd, cwd, tag):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(cwd)
    # reference pickles whole torch modules; torch>=2.6 defaults
    # weights_only=True on load, which would break the reference's own test
    # script — restore its original behavior for the probe
    env["TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD"] = "1"
    env.pop("JAX_PLATFORMS", None)
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable] + cmd, cwd=cwd, env=env,
                         capture_output=True, text=True)
    seconds = time.perf_counter() - t0
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
        raise RuntimeError(f"reference {tag} failed (rc={out.returncode})")
    print(f"reference {tag}: {seconds:.1f}s")
    return seconds


def parse_endtoend_results(root: Path):
    """Parse the LAST metrics block of results_endtoend.csv (reference
    nmpmcont:330-338 format: `str(args)` line, then one
    `<metric> $<mean> \\pm <std>$` line per metric)."""
    import re

    text = (Path(root) / "results_endtoend.csv").read_text()
    blocks = [b for b in text.split("Namespace") if "\\pm" in b]
    if not blocks:
        raise RuntimeError("no metrics block in results_endtoend.csv")
    metrics = {}
    for name, mean, std in re.findall(
            r"(\w+) \$([0-9.na-]+) \\pm ([0-9.na-]+)\$", blocks[-1]):
        metrics[name] = [float(mean), float(std)]
    if not metrics:
        raise RuntimeError("unparseable metrics block")
    return metrics


def probe_endtoend(args, work: Path, flags, make_ours_env):
    """Quality parity for the nm-PM-cont (endtoend supervised) variant:
    the reference's own multimodal_kfold_cvae_nmpmcont.py vs cli/nmpmcont.py
    on the identical synthetic cohort, compared on the results_endtoend.csv
    metric block (accuracy/auroc/sensitivity/specificity/f1 — the
    BASELINE.md "End-to-end (nm-PM-cont)" rows)."""
    # reference defect: nmpmcont GENERATES ids into kfold_analysis_endtoend
    # (nmpmcont:167) but READS outputs/kfold_analysis (nmpmcont:170-171),
    # which only exists after a supervised train run. Pre-generate exactly
    # what that run would have written (same groups, seed 42, same
    # np.random.choice stream) so the reference script can run standalone.
    pregen = (
        "import numpy as np, pandas as pd, utils\n"
        "np.random.seed(42)\n"
        "ids = pd.read_csv('data/ADNI/y.csv')\n"
        "hc_label = utils.get_hc_label('ADNI')\n"
        "hc = ids[ids['DIA'] == hc_label]\n"
        "other = ids[ids['DIA'] != hc_label]\n"
        f"utils.generate_kfold_ids(hc, other, oversample_percentage=1, "
        f"n_splits={args.n_splits})\n")
    _run(["-c", pregen], work, "pregen_supervised_ids")
    cmd = ["multimodal_kfold_cvae_nmpmcont.py",
           "-E", str(args.epochs)] + flags
    ref_seconds = _run(cmd, work, "nmpmcont")
    reference = parse_endtoend_results(work)

    ours = work / "ours"
    ours.mkdir()
    shutil.copytree(work / "data", ours / "data")
    env = make_ours_env()
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, str(REPO / "multimodal_kfold_cvae_nmpmcont.py"),
         "-E", str(args.epochs), "--fold_parallel"] + flags,
        cwd=ours, env=env, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
        raise RuntimeError("our nmpmcont failed")
    ours_seconds = time.perf_counter() - t0
    mine = parse_endtoend_results(ours)

    quality = {
        "kind": "endtoend",
        "cohort": {"n_hc": args.n_hc, "n_ad": args.n_ad,
                   "n_mci": args.n_mci, "procedure": args.procedure,
                   "n_splits": args.n_splits, "epochs": args.epochs,
                   "effect": args.effect,
                   "offset_effect": args.offset_effect,
                   "label_noise": args.label_noise},
        "reference_metrics": reference,
        "ours_metrics": mine,
        "reference_seconds": round(ref_seconds, 2),
        "ours_seconds": round(ours_seconds, 2),
    }
    for name in sorted(set(reference) & set(mine)):
        print(f"  {name}: reference {reference[name][0]:.3f} ± "
              f"{reference[name][1]:.3f} vs ours {mine[name][0]:.3f} ± "
              f"{mine[name][1]:.3f}")
    print(f"  wall-clock: reference {ref_seconds:.1f}s vs ours "
          f"{ours_seconds:.1f}s")
    return quality


def regression_scores(root: Path):
    """RMSE/MAE/R²/MAPE over the fold_<k>_{pred,true}.npy pairs both sides
    save under regression_outputs/ (reference regression:147-148 — computed
    here from the artifacts rather than parsed from stdout)."""
    import numpy as np

    out = Path(root) / "regression_outputs"
    per_fold = []
    for pred_path in sorted(out.glob("fold_*_pred.npy")):
        true_path = out / pred_path.name.replace("_pred", "_true")
        pred = np.load(pred_path).ravel()
        true = np.load(true_path).ravel()
        rmse = float(np.sqrt(np.mean((true - pred) ** 2)))
        mae = float(np.mean(np.abs(true - pred)))
        ss_res = float(np.sum((true - pred) ** 2))
        ss_tot = float(np.sum((true - np.mean(true)) ** 2))
        r2 = 1.0 - ss_res / ss_tot
        mape = float(np.mean(np.abs((true - pred) / true)) * 100)
        per_fold.append({"RMSE": rmse, "MAE": mae, "R2": r2, "MAPE": mape})
    if not per_fold:
        raise RuntimeError(f"no fold_*_pred.npy under {out}")
    return {name: [float(np.mean([f[name] for f in per_fold])),
                   float(np.std([f[name] for f in per_fold]))]
            for name in per_fold[0]}


def probe_regression(args, work: Path, flags, make_ours_env):
    """Quality parity for the FI-regression variant: the reference's
    multimodal_kfold_train_cvae_supervised_regression.py vs cli/regression.py
    on the identical synthetic cohort (with the FI target column), compared
    on RMSE/MAE/R²/MAPE computed from the saved per-fold pred/true arrays."""
    cmd = ["multimodal_kfold_train_cvae_supervised_regression.py",
           "-E", str(args.epochs)] + flags
    ref_seconds = _run(cmd, work, "regression")
    reference = regression_scores(work)

    ours = work / "ours"
    ours.mkdir()
    shutil.copytree(work / "data", ours / "data")
    env = make_ours_env()
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable,
         str(REPO / "multimodal_kfold_train_cvae_supervised_regression.py"),
         "-E", str(args.epochs), "--fold_parallel"] + flags,
        cwd=ours, env=env, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
        raise RuntimeError("our regression trainer failed")
    ours_seconds = time.perf_counter() - t0
    mine = regression_scores(ours)

    quality = {
        "kind": "regression",
        "cohort": {"n_hc": args.n_hc, "n_ad": args.n_ad,
                   "n_mci": args.n_mci, "procedure": args.procedure,
                   "n_splits": args.n_splits, "epochs": args.epochs,
                   "effect": args.effect,
                   "offset_effect": args.offset_effect,
                   "label_noise": args.label_noise},
        "reference_metrics": reference,
        "ours_metrics": mine,
        "reference_seconds": round(ref_seconds, 2),
        "ours_seconds": round(ours_seconds, 2),
    }
    for name in sorted(set(reference) & set(mine)):
        print(f"  {name}: reference {reference[name][0]:.4f} ± "
              f"{reference[name][1]:.4f} vs ours {mine[name][0]:.4f} ± "
              f"{mine[name][1]:.4f}")
    print(f"  wall-clock: reference {ref_seconds:.1f}s vs ours "
          f"{ours_seconds:.1f}s")
    return quality


def parse_nmmlp_metrics(root: Path):
    """Parse the LAST 'Overall Performance' block of
    outputs/analysis_results/performance_metrics.txt (reference
    nmmlp:637-643: `Mean <name>: <mean> ± <std>` lines)."""
    import re

    text = (Path(root) / "outputs" / "analysis_results" /
            "performance_metrics.txt").read_text()
    blocks = [b for b in text.split("Overall Performance:") if "Mean" in b]
    if not blocks:
        raise RuntimeError("no Overall Performance block")
    metrics = {}
    for name, mean, std in re.findall(
            r"Mean ([A-Za-z ]+): ([0-9.na-]+) ± ([0-9.na-]+)", blocks[-1]):
        metrics[name.strip()] = [float(mean), float(std)]
    if not metrics:
        raise RuntimeError("unparseable Overall Performance block")
    return metrics


def probe_nmmlp(args, work: Path, flags, make_ours_env):
    """Quality parity for the nm-MLP variant (the reference's only truly
    normative, HC-only trainer): multimodal_kfold_cvae_nmmlp.py `all` vs
    cli/nmmlp.py `all` on the identical synthetic cohort, compared on the
    performance_metrics.txt Overall Performance block."""
    cmd = ["multimodal_kfold_cvae_nmmlp.py", "all",
           "-E", str(args.epochs)] + flags
    ref_seconds = _run(cmd, work, "nmmlp all")
    reference = parse_nmmlp_metrics(work)

    ours = work / "ours"
    ours.mkdir()
    shutil.copytree(work / "data", ours / "data")
    env = make_ours_env()
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, str(REPO / "multimodal_kfold_cvae_nmmlp.py"), "all",
         "-E", str(args.epochs), "--fold_parallel"] + flags,
        cwd=ours, env=env, capture_output=True, text=True)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
        raise RuntimeError("our nmmlp failed")
    ours_seconds = time.perf_counter() - t0
    mine = parse_nmmlp_metrics(ours)

    quality = {
        "kind": "nmmlp",
        "cohort": {"n_hc": args.n_hc, "n_ad": args.n_ad,
                   "n_mci": args.n_mci, "procedure": args.procedure,
                   "n_splits": args.n_splits, "epochs": args.epochs,
                   "effect": args.effect,
                   "offset_effect": args.offset_effect,
                   "label_noise": args.label_noise},
        "reference_metrics": reference,
        "ours_metrics": mine,
        "reference_seconds": round(ref_seconds, 2),
        "ours_seconds": round(ours_seconds, 2),
    }
    for name in sorted(set(reference) & set(mine)):
        print(f"  {name}: reference {reference[name][0]:.4f} ± "
              f"{reference[name][1]:.4f} vs ours {mine[name][0]:.4f} ± "
              f"{mine[name][1]:.4f}")
    print(f"  wall-clock: reference {ref_seconds:.1f}s vs ours "
          f"{ours_seconds:.1f}s")
    return quality


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10,
                    help="training epochs for the probe (per-epoch cost is "
                         "constant; the recorded figure is per fold-epoch)")
    ap.add_argument("--n-splits", type=int, default=10)
    ap.add_argument("--procedure", default="UCA-gPoE")
    ap.add_argument("--n-hc", type=int, default=400)
    ap.add_argument("--n-ad", type=int, default=150)
    ap.add_argument("--n-mci", type=int, default=150)
    ap.add_argument("--quality", action="store_true",
                    help="also run THIS framework's pipeline on the exact "
                         "same cohort and record both deviation AUCs "
                         "(quality parity vs the reference's own code)")
    ap.add_argument("--ours-platform", choices=["default", "cpu"],
                    default="default",
                    help="platform for OUR leg of a quality run: 'default' "
                         "uses the session platform (TPU when attached); "
                         "'cpu' forces local CPU — quality metrics are "
                         "platform-independent, and this sidesteps degraded "
                         "remote-attach windows (ours_seconds is then a CPU "
                         "figure, not a headline)")
    ap.add_argument("--effect", type=float, default=0.8,
                    help="per-subject sparse-ROI disease perturbation scale "
                         "(data/synthetic.py)")
    ap.add_argument("--offset-effect", type=float, default=0.8,
                    help="shared disease mean-offset scale")
    ap.add_argument("--label-noise", type=float, default=0.0,
                    help="fraction of disease-labelled subjects carrying NO "
                         "signal — tune so the reference side lands in its "
                         "published AUC regime (~0.6-0.85) and the parity "
                         "probes discriminate instead of saturating")
    ap.add_argument("--variant",
                    choices=["supervised", "endtoend", "regression",
                             "nmmlp"],
                    default="supervised",
                    help="endtoend = nm-PM-cont quality parity; regression "
                         "= FI-regression quality parity (each runs the "
                         "reference's variant script AND ours on the same "
                         "cohort; implies --quality)")
    args = ap.parse_args()

    if not REFERENCE.exists():
        raise SystemExit(f"reference not found at {REFERENCE}")
    sys.path.insert(0, str(REPO))
    from multi_modal_normative_modeling_tpu.cli.early_fusion import (
        build_early_fusion,
    )
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    work = Path(tempfile.mkdtemp(prefix="mmnm_baseline_probe_"))
    print(f"workdir {work}")

    def make_ours_env():
        env = dict(os.environ)
        # PREPEND the repo: this image routes the TPU plugin through
        # PYTHONPATH (/root/.axon_site), which must survive
        env["PYTHONPATH"] = os.pathsep.join(
            [str(REPO)] + ([env["PYTHONPATH"]]
                           if env.get("PYTHONPATH") else []))
        if args.ours_platform == "cpu":
            # quality metrics are platform-independent; CPU sidesteps
            # degraded remote-attach windows (CLAUDE.md: 300-900 s stalls).
            # ASSIGN, don't setdefault: the image exports JAX_PLATFORMS=axon.
            env["JAX_PLATFORMS"] = "cpu"
        return env

    try:
        ref_files = {"supervised": REF_FILES,
                     "endtoend": REF_FILES_ENDTOEND,
                     "regression": REF_FILES_REGRESSION,
                     "nmmlp": REF_FILES_NMMLP}[args.variant]
        for name in ref_files:
            shutil.copy(REFERENCE / name, work / name)
        stub_dir = work / "nilearn"
        (stub_dir / "datasets").mkdir(parents=True)
        labels_path = str(REPO / "multi_modal_normative_modeling_tpu" /
                          "data" / "roi_labels.json")
        (stub_dir / "__init__.py").write_text("")
        (stub_dir / "datasets" / "__init__.py").write_text(
            NILEARN_STUB.format(labels_path=labels_path))
        _write_statsmodels_stub(work)

        make_synthetic_resource(work, "ADNI", n_hc=args.n_hc,
                                n_disease={0: args.n_ad, 1: args.n_mci},
                                effect=args.effect,
                                offset_effect=args.offset_effect,
                                label_noise=args.label_noise,
                                with_fi=(args.variant == "regression"))
        if args.procedure.startswith("UCA"):
            build_early_fusion(work, "ADNI")

        flags = ["-R", "ADNI", "-P", args.procedure,
                 "-K", str(args.n_splits), "-H", "110", "110", "10"]

        if args.variant != "supervised":
            probe_fn = {"endtoend": probe_endtoend,
                        "regression": probe_regression,
                        "nmmlp": probe_nmmlp}[args.variant]
            quality = probe_fn(args, work, flags, make_ours_env)
            quality["ours_platform"] = args.ours_platform
            baseline_path = REPO / "BASELINE.json"
            doc = json.loads(baseline_path.read_text())
            runs = doc.setdefault("quality_parity_runs", [])
            runs.append(quality)
            baseline_path.write_text(json.dumps(doc, indent=2))
            print(json.dumps(quality, indent=1))
            print(f"recorded into {baseline_path}")
            return

        train_s = _run(["multimodal_kfold_train_cvae_supervised.py",
                        "-E", str(args.epochs), "-TrainingClass", "nm"]
                       + flags, work, "train")
        test_s = _run(["multimodal_kfold_test_cvae_supervised.py"] + flags,
                      work, "test")
        analysis_s = _run(["multimodal_kfold_cvae_group_analysis_1x1.py"]
                          + flags, work, "group_analysis")

        # train folds mix classes (SURVEY Q4: the HC filter is commented out
        # in the reference): ~ (k-1)/k of the whole cohort per fold
        total = args.n_hc + args.n_ad + args.n_mci
        n_train_rows = round(total * (args.n_splits - 1) / args.n_splits)
        per_fold_epoch = train_s / (args.n_splits * args.epochs)
        measured = {
            "machine": "container CPU (torch eager, reference scripts)",
            "cohort": {"n_hc": args.n_hc, "n_ad": args.n_ad,
                       "n_mci": args.n_mci, "procedure": args.procedure,
                       "n_splits": args.n_splits, "epochs": args.epochs,
                       "effect": args.effect,
                       "offset_effect": args.offset_effect,
                       "label_noise": args.label_noise},
            "train_seconds": round(train_s, 2),
            "train_seconds_per_fold_epoch": round(per_fold_epoch, 4),
            "test_seconds": round(test_s, 2),
            "analysis_seconds": round(analysis_s, 2),
            # the flagship job is FIXED at 10 folds x 200 epochs
            # (RESULTS.md), independent of the probe's --n-splits
            "flagship_train_estimate_seconds": round(
                per_fold_epoch * 10 * 200, 1),
            "approx_train_rows_per_fold": n_train_rows,
        }

        def hc_vs_ad_auc(root):
            """HC(2)-vs-AD(0) pooled AUC (the canonical detectable
            comparison; the synthetic cohort injects the SAME effect for AD
            and MCI, so the MCI-vs-AD pair — which is what
            cvae_auc_and_std.csv ends up holding — is 0.5 by construction).
            Shared parser: evaluation/reports.parse_result_auc."""
            from multi_modal_normative_modeling_tpu.evaluation.reports import (
                parse_result_auc,
            )

            return parse_result_auc(root, "2 vs 0")

        quality = {}
        ref_auc, ref_std = hc_vs_ad_auc(work)
        quality["reference_hc_vs_ad_auc"] = ref_auc
        quality["reference_hc_vs_ad_auc_std"] = ref_std

        if args.quality:
            # our pipeline on the IDENTICAL cohort (independent training, so
            # AUCs agree statistically, not bitwise)
            ours = work / "ours"
            ours.mkdir()
            shutil.copytree(work / "data", ours / "data")
            env = make_ours_env()
            t0 = time.perf_counter()
            # ONE pipeline launch (train -> test -> analyze): byte-identical
            # to the three-script chain but pays the per-process session
            # attach once instead of three times (cli/pipeline.py)
            out = subprocess.run(
                [sys.executable, "-m",
                 "multi_modal_normative_modeling_tpu.cli.pipeline",
                 "-E", str(args.epochs), "-TrainingClass", "nm",
                 "--fold_parallel"] + flags,
                cwd=ours, env=env, capture_output=True, text=True)
            if out.returncode != 0:
                sys.stderr.write(out.stdout[-3000:] + out.stderr[-3000:])
                raise RuntimeError("our pipeline failed")
            ours_seconds = time.perf_counter() - t0
            our_auc, our_std = hc_vs_ad_auc(ours)
            quality["ours_hc_vs_ad_auc"] = our_auc
            quality["ours_hc_vs_ad_auc_std"] = our_std
            quality["ours_end_to_end_seconds"] = round(ours_seconds, 2)
            quality["cohort"] = measured["cohort"]
            quality["ours_platform"] = args.ours_platform
            print(f"quality parity on the same cohort: reference HC-vs-AD "
                  f"AUC {ref_auc} ± {ref_std} vs ours {our_auc} ± {our_std} "
                  f"(ours end-to-end {ours_seconds:.1f}s)")

        baseline_path = REPO / "BASELINE.json"
        doc = json.loads(baseline_path.read_text())
        if args.quality:
            # a quality run keeps the canonical timing baseline untouched;
            # runs at different configs accumulate in quality_parity_runs
            # (the cohort dict records procedure/epochs/n_splits)
            doc["quality_parity"] = quality
            runs = doc.setdefault("quality_parity_runs", [])
            runs.append(quality)
        else:
            measured.update(quality)
            doc["measured"] = measured
        baseline_path.write_text(json.dumps(doc, indent=2))
        print(json.dumps(doc.get("quality_parity") if args.quality
                         else measured, indent=1))
        print(f"recorded into {baseline_path}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
