#!/usr/bin/env python3
"""Author + EXECUTE the analysis notebooks (tsne.ipynb,
table_visualization.ipynb, visualization/ROI.ipynb,
classifier_baseline/classifier.ipynb) against a synthetic demo project, and
write the executed notebooks (outputs embedded) into the repo.

Re-run after changing the demo pipeline: python scripts/build_notebooks.py
"""
import sys
from pathlib import Path

import nbformat
from nbclient import NotebookClient

REPO = Path(__file__).resolve().parent.parent

BOOTSTRAP = '''\
# Environment bootstrap: force CPU JAX and locate the repo root (the demo
# cohort is synthesized on first run; see multi_modal_normative_modeling_tpu/demo.py).
# Assignment, not setdefault: this image exports JAX_PLATFORMS=axon, and the
# package's configure_jax_cache() honors the env var — a leftover 'axon'
# would silently re-route the notebook's training to the remote chip.
%matplotlib inline
import os, sys
from pathlib import Path
os.environ["JAX_PLATFORMS"] = "cpu"
repo = Path.cwd()
while not (repo / "multi_modal_normative_modeling_tpu").exists():
    repo = repo.parent
sys.path.insert(0, str(repo))
import jax
jax.config.update("jax_platforms", "cpu")
from multi_modal_normative_modeling_tpu.demo import ensure_demo_project
project = ensure_demo_project(repo / "outputs" / "notebook_demo")
print("demo project:", project)
'''


def md(text):
    return nbformat.v4.new_markdown_cell(text)


def code(text):
    return nbformat.v4.new_code_cell(text)


def tsne_nb():
    cells = [
        md("# t-SNE of modality features and normative latent space\n\n"
           "Executed equivalent of the reference `tsne.ipynb` (which embeds "
           "t-SNE scatters of each modality's ROI table colored by "
           "diagnosis), plus the fused latent space of the trained "
           "normative cVAE. Runs fully offline on the synthetic demo cohort "
           "with an injected disease effect."),
        code(BOOTSTRAP),
        code('''\
# t-SNE per raw modality, colored by diagnosis (reference tsne.ipynb cell 3)
import pandas as pd, numpy as np
import matplotlib.pyplot as plt
from sklearn.manifold import TSNE
from multi_modal_normative_modeling_tpu import registry

y = pd.read_csv(project / "data" / "ADNI" / "y.csv")
names = registry.BASE_MODALITIES["ADNI"]
fig, axes = plt.subplots(1, len(names), figsize=(5 * len(names), 4.5))
for ax, name in zip(axes, names):
    frame = pd.read_csv(project / "data" / "ADNI" / f"{name}.csv").dropna()
    full = pd.merge(frame, y, on="IID")
    cols = registry.get_column_name("ADNI", name)
    emb = TSNE(n_components=2, perplexity=30, random_state=42).fit_transform(
        full[cols].values)
    for dia, label in [(2, "HC"), (1, "MCI"), (0, "AD")]:
        sel = full["DIA"].values == dia
        ax.scatter(emb[sel, 0], emb[sel, 1], s=14, alpha=0.75,
                   label=f"{label} (DIA={dia})")
    ax.set_title(f"t-SNE: {name}")
    ax.legend()
plt.tight_layout()
plt.show()
'''),
        code('''\
# t-SNE of the trained model's FUSED latent means: the normative latent
# space separates deviating subjects even though training never saw labels
from multi_modal_normative_modeling_tpu.demo import load_fold_model, cohort_latents

model, params, config = load_fold_model(project, fold=0)
mus, dia = cohort_latents(project, model, params, combine=config["combine"].lower())
emb = TSNE(n_components=2, perplexity=30, random_state=42).fit_transform(np.asarray(mus))
plt.figure(figsize=(6, 5.5))
for d, label in [(2, "HC"), (1, "MCI"), (0, "AD")]:
    sel = dia == d
    plt.scatter(emb[sel, 0], emb[sel, 1], s=16, alpha=0.75, label=label)
plt.legend(); plt.title("t-SNE of fused latent means (fold-0 cVAE)")
plt.show()
'''),
        md("The latent space is trained normatively (reconstruction + KL "
           "only); group structure visible here comes from the injected "
           "per-subject deviation effect in the synthetic cohort."),
        md("## Per-procedure latent spaces: SM vs SE vs UCA\n\n"
           "The reference's procedure grammar (utils.py:731-755) spans "
           "single-modality (`SM-av45`), simple fusion over the base "
           "modalities (`SE-gPoE`), and early-fusion-augmented fusion "
           "(`UCA-gPoE`, which appends the concatenated table as an extra "
           "modality). One demo model per procedure, same cohort — the "
           "panels below compare their fused latent organisations "
           "(the reference's tsne.ipynb embeds the analogous per-resource/"
           "per-procedure panels for its private cohorts)."),
        code('''\
# train one compact demo model per procedure (cached across rebuilds)
from multi_modal_normative_modeling_tpu.demo import (
    ensure_procedure_projects, load_fold_model, cohort_latents)

projects = ensure_procedure_projects(repo / "outputs" / "notebook_demo_procedures")
list(projects)
'''),
        code('''\
# 3-panel latent t-SNE: one fused latent space per procedure
fig, axes = plt.subplots(1, len(projects), figsize=(5.5 * len(projects), 5))
for ax, (proc, proot) in zip(axes, projects.items()):
    m, p, cfg = load_fold_model(proot, fold=0)
    mus, dia = cohort_latents(proot, m, p, combine=cfg["combine"].lower(),
                              procedure=proc)
    emb = TSNE(n_components=2, perplexity=30,
               random_state=42).fit_transform(np.asarray(mus))
    for d, label in [(2, "HC"), (1, "MCI"), (0, "AD")]:
        sel = dia == d
        ax.scatter(emb[sel, 0], emb[sel, 1], s=14, alpha=0.75, label=label)
    ax.set_title(f"{proc} ({cfg['modalities']} modalities)")
    ax.legend()
plt.suptitle("Fused latent means by procedure (fold-0 models)")
plt.tight_layout()
plt.show()
'''),
        code('''\
# quantify: silhouette of the diagnosis grouping in each latent space
from sklearn.metrics import silhouette_score
import pandas as pd
rows = []
for proc, proot in projects.items():
    m, p, cfg = load_fold_model(proot, fold=0)
    mus, dia = cohort_latents(proot, m, p, combine=cfg["combine"].lower(),
                              procedure=proc)
    rows.append({"procedure": proc, "modalities": cfg["modalities"],
                 "latent_silhouette(DIA)": round(
                     float(silhouette_score(np.asarray(mus), dia)), 3)})
pd.DataFrame(rows)
'''),
    ]
    return cells


def table_nb():
    cells = [
        md("# Result-table visualization\n\n"
           "Executed equivalent of the reference `table_visualization.ipynb`"
           ": parse the appended report blocks in "
           "`result_baseline/result_multimodal.txt` / `result_4.txt` into "
           "structured tables and LaTeX, and chart the per-fold AUCs from "
           "`cvae_auc_and_std.csv`."),
        code(BOOTSTRAP),
        code('''\
# parse result_multimodal.txt blocks -> DataFrame (reference cells 2-3)
import re
import pandas as pd

text = (project / "result_baseline" / "result_multimodal.txt").read_text()
rows = []
for block in [b for b in text.split("\\n\\n") if "Experiment settings" in b]:
    m = re.search(r"Experiment settings: (\\S+)\\. (\\S+): (\\d+) vs (\\d+)", block)
    metrics = dict(re.findall(r"(ROC-AUC|ACC|Sensitivity|Specificity): \\$([0-9.]+) \\\\pm ([0-9.]+)\\$", block))
    vals = dict(re.findall(r"(ROC-AUC|ACC|Sensitivity|Specificity): \\$([0-9.]+)", block))
    stds = dict(re.findall(r"(ROC-AUC|ACC): \\$[0-9.]+ \\\\pm ([0-9.]+)\\$", block))
    if m:
        rows.append({"model": m.group(1), "resource": m.group(2),
                     "labels": f"{m.group(3)} vs {m.group(4)}", **vals})
table = pd.DataFrame(rows)
table
'''),
        code('''\
# LaTeX export, as the reference emits via tabulate
print(table.to_latex(index=False))
'''),
        code('''\
# per-fold AUC chart from cvae_auc_and_std.csv (last value = std)
import numpy as np
import matplotlib.pyplot as plt

values = np.loadtxt(project / "cvae_auc_and_std.csv", delimiter=",")
aucs, std = values[:-1], values[-1]
plt.figure(figsize=(6, 3.5))
plt.bar(range(len(aucs)), aucs)
plt.axhline(aucs.mean(), color="k", ls="--",
            label=f"mean {aucs.mean():.3f} ± {std:.3f}")
plt.xlabel("fold"); plt.ylabel("deviation ROC-AUC"); plt.legend()
plt.title("Per-fold deviation AUC (last group-analysis run)")
plt.show()
'''),
        code('''\
# 3-pair averages (result_4.txt)
text4 = (project / "result_baseline" / "result_4.txt").read_text()
print(text4[-800:])
'''),
        md("## Multi-experiment comparison: procedures x shapes x epochs\n\n"
           "The reference notebook's core analysis is comparing AUC tables "
           "across whole experiment grids (its AE / CVAE / FAAE sections "
           "each parse a different sweep's result file). Here the same "
           "comparison runs live: the whole-grid sweep engine "
           "(`cli/sweep_supervised.py`) trains a procedures x hidden-shapes "
           "x epoch-counts grid on the demo cohort — every point a full "
           "train/test/analysis — and the records pivot into the "
           "comparison tables."),
        code('''\
# run (or reuse) a small sweep grid (own project root: the sweep rewrites
# checkpoints per grid point, which must not disturb the shared demo)
import argparse, json
from multi_modal_normative_modeling_tpu.cli import sweep_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource)

sweep_root = repo / "outputs" / "notebook_demo_sweep"
if not (sweep_root / "data" / "ADNI" / "y.csv").exists():
    make_synthetic_resource(sweep_root, "ADNI", n_hc=90,
                            n_disease={0: 40, 1: 40}, effect=0.8)
sweep_summary = sweep_root / "outputs" / "sweep_supervised_results.json"
if not sweep_summary.exists():
    sweep_args = argparse.Namespace(
        dataset_resourse="ADNI", n_splits=3, oversample_percentage=1,
        model="cVAE_multimodal", training_class="nm", combine="gPoE",
        procedures=["SM-av45", "SE-gPoE"], epochs_list=[20, 60],
        hz_grid="32 32 8;16 8", lr_grid="1e-4:5e-3",
        lr_schedule="constant", precision="fp32", in_memory_fusion=False)
    sweep_supervised.main(sweep_args, project_root=sweep_root)
records = json.loads(sweep_summary.read_text())
len(records)
'''),
        code('''\
# pivot: mean HC-vs-patient AUC per (procedure, shape, epochs)
rows = []
for r in records:
    rows.append({"procedure": r["procedure"],
                 "hz": "x".join(str(h) for h in r["hz_para_list"]),
                 "epochs": r["epochs"],
                 "mean_auc": round(sum(r["stats"]["auc"][:2]) / 2, 4)})
grid = pd.DataFrame(rows).drop_duplicates()
pivot = grid.pivot_table(index=["procedure", "hz"], columns="epochs",
                         values="mean_auc")
pivot
'''),
        code('''\
# LaTeX export of the comparison table (the reference emits its tables
# as LaTeX for the paper)
print(pivot.to_latex(float_format="%.4f"))
'''),
        code('''\
# chart: AUC by epochs per (procedure, shape)
fig, ax = plt.subplots(figsize=(7, 4))
for (proc, hz), sub in grid.groupby(["procedure", "hz"]):
    sub = sub.sort_values("epochs")
    ax.plot(sub["epochs"], sub["mean_auc"], marker="o",
            label=f"{proc} hz={hz}")
ax.set_xlabel("training epochs"); ax.set_ylabel("mean deviation AUC")
ax.legend(); ax.set_title("Sweep grid comparison (HC-vs-AD / HC-vs-MCI mean)")
plt.tight_layout(); plt.show()
'''),
    ]
    return cells


def roi_nb():
    cells = [
        md("# Per-ROI deviation brain map\n\n"
           "Executed equivalent of the reference `visualization/ROI.ipynb` "
           "(which renders per-ROI deviation onto the AAL atlas via nilearn, "
           "producing `enhanced_roi_visualization.png`). nilearn downloads "
           "the atlas at runtime and is unavailable offline, so the brain "
           "geometry here uses the VENDORED approximate AAL-90 MNI "
           "centroids (`data/aal90_mni_centroids.json`) — visualization "
           "only. Effect sizes are computed from the pipeline's "
           "`reconstruction_error_roi_*.csv` artifacts."),
        code(BOOTSTRAP),
        code('''\
# per-ROI deviation effect size (patient vs HC), fold artifacts from the demo run
from multi_modal_normative_modeling_tpu import registry, viz

dev_dir = (project / "deviation" / "supervised_cvae" / "ADNI" / "SE-gPoE"
           / "path_model" / "av45")
table = viz.roi_deviation_table(dev_dir / "reconstruction_error_roi_av45.csv",
                                hc_label=registry.get_hc_label("ADNI"),
                                top_k=None)
table.head(15)
'''),
        code('''\
# glass-brain scatter -> enhanced_roi_visualization.png
import matplotlib.pyplot as plt
from pathlib import Path

values = dict(zip(table["roi"], table["cohens_d"]))
out = Path("enhanced_roi_visualization.png")
viz.glass_brain_scatter(values, out,
                        title="Per-ROI deviation effect size (AD+MCI vs HC, av45)")
from IPython.display import Image
Image(str(out))
'''),
        code('''\
# top-k bar map (same data, exact values)
viz.roi_deviation_map(dev_dir / "reconstruction_error_roi_av45.csv",
                      hc_label=registry.get_hc_label("ADNI"),
                      out_path="roi_deviation_bar.png", top_k=20)
Image("roi_deviation_bar.png")
'''),
    ]
    return cells


def classifier_nb():
    cells = [
        md("# MLP classifier baseline\n\n"
           "Executed port of the reference "
           "`classifier_baseline/classifier.ipynb` (one cell inlining "
           "classifier.py): trains the standalone MLP diagnosis baseline — "
           "full-batch Adam, ReduceLROnPlateau, best-val early stopping — "
           "on a synthetic cohort and reports "
           "accuracy/sensitivity/specificity/F1/AUROC."),
        code(BOOTSTRAP),
        code('''\
# synthesize an ADHD-like fMRI cohort and run the baseline end-to-end
from multi_modal_normative_modeling_tpu.cli import classifier_baseline
from multi_modal_normative_modeling_tpu.data.synthetic import make_synthetic_resource

clf_root = repo / "outputs" / "notebook_demo_classifier"
if not (clf_root / "data" / "ADHD" / "y.csv").exists():
    make_synthetic_resource(clf_root, "ADHD", n_hc=100, n_disease={0: 100},
                            effect=1.2)
os.chdir(clf_root)
args = classifier_baseline.build_parser().parse_args([
    "--fmri_path", str(clf_root / "data" / "ADHD" / "fMRI.csv"),
    "--labels_path", str(clf_root / "data" / "ADHD" / "y.csv"),
    "--num_epochs", "400", "--hidden_layers", "64", "32",
    "--checkpoint_path", str(clf_root / "best_model.pth"),
])
metrics = classifier_baseline.main(args)
os.chdir(repo)
metrics
'''),
        code('''\
# the JSON experiment log the baseline APPENDS one pretty-printed object per
# run (classifier.py:56-79 parity), so parse the concatenated stream
import json
import pandas as pd
text = (clf_root / "experiment_results.json").read_text()
decoder = json.JSONDecoder()
records, i = [], 0
while i < len(text):
    while i < len(text) and text[i].isspace():
        i += 1
    if i >= len(text):
        break
    obj, i = decoder.raw_decode(text, i)
    records.append(obj)
pd.json_normalize(records)
'''),
    ]
    return cells


def build(path: Path, cells, workdir: Path):
    nb = nbformat.v4.new_notebook()
    nb.cells = cells
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    client = NotebookClient(nb, timeout=1200, kernel_name="python3",
                            resources={"metadata": {"path": str(workdir)}})
    client.execute()
    nbformat.write(nb, path)
    print(f"wrote executed {path} ({path.stat().st_size / 1024:.0f} KB)")


def main():
    only = sys.argv[1:] or ["tsne", "table", "roi", "classifier"]
    if "tsne" in only:
        build(REPO / "tsne.ipynb", tsne_nb(), REPO)
    if "table" in only:
        build(REPO / "table_visualization.ipynb", table_nb(), REPO)
    if "roi" in only:
        build(REPO / "visualization" / "ROI.ipynb", roi_nb(),
              REPO / "visualization")
    if "classifier" in only:
        build(REPO / "classifier_baseline" / "classifier.ipynb",
              classifier_nb(), REPO / "classifier_baseline")


if __name__ == "__main__":
    main()
