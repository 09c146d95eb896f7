"""Visualization utilities — script equivalents of the reference's side
notebooks (tsne.ipynb, table_visualization.ipynb, visualization/ROI.ipynb):
latent t-SNE scatter, per-ROI deviation tables/maps, AUC summary tables.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np
import pandas as pd


def tsne_latents(latents: np.ndarray, labels: np.ndarray, out_path,
                 perplexity: float = 30.0, seed: int = 42) -> np.ndarray:
    """2-D t-SNE embedding of latent means, colored by diagnosis; saves a PNG
    and returns the embedding (tsne.ipynb equivalent)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    latents = np.asarray(latents)
    perplexity = min(perplexity, max(2.0, (len(latents) - 1) / 3.0))
    embedding = TSNE(n_components=2, perplexity=perplexity,
                     random_state=seed).fit_transform(latents)
    plt.figure(figsize=(6, 6))
    for value in np.unique(labels):
        sel = np.asarray(labels) == value
        plt.scatter(embedding[sel, 0], embedding[sel, 1], s=12,
                    label=f"DIA={value}", alpha=0.7)
    plt.legend()
    plt.title("t-SNE of latent means")
    plt.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close()
    return embedding


def roi_deviation_table(roi_error_csv, hc_label: int,
                        top_k: Optional[int] = 20) -> pd.DataFrame:
    """Per-ROI mean deviation split HC vs patient + Cohen's d, sorted by
    effect size (visualization/ROI.ipynb equivalent). Input is a
    reconstruction_error_roi_*.csv emitted by the test stage."""
    frame = pd.read_csv(roi_error_csv)
    meta = ["participant_id", "DIA", "AGE", "PTGENDER"]
    roi_cols = [c for c in frame.columns if c not in meta]
    hc = frame[frame["DIA"] == hc_label][roi_cols]
    patient = frame[frame["DIA"] != hc_label][roi_cols]
    pooled = np.sqrt((hc.var(ddof=1) + patient.var(ddof=1)) / 2.0)
    table = pd.DataFrame({
        "roi": roi_cols,
        "hc_mean_dev": hc.mean().values,
        "patient_mean_dev": patient.mean().values,
        "cohens_d": ((patient.mean() - hc.mean()) / pooled).values,
    }).sort_values("cohens_d", ascending=False).reset_index(drop=True)
    return table.head(top_k) if top_k else table


def roi_deviation_map(roi_error_csv, hc_label: int, out_path,
                      top_k: int = 25) -> None:
    """Horizontal-bar deviation map of the top-k ROIs by effect size."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    table = roi_deviation_table(roi_error_csv, hc_label, top_k)
    plt.figure(figsize=(7, max(3, 0.3 * len(table))))
    plt.barh(table["roi"][::-1], table["cohens_d"][::-1])
    plt.xlabel("Cohen's d (patient vs HC deviation)")
    plt.title("ROI deviation map")
    plt.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close()


def auc_summary_table(result_dirs: Sequence, out_csv=None) -> pd.DataFrame:
    """Collect cvae_auc_and_std.csv files into one experiment table
    (table_visualization.ipynb equivalent)."""
    rows = []
    for directory in result_dirs:
        path = Path(directory) / "cvae_auc_and_std.csv"
        if not path.exists():
            continue
        values = np.loadtxt(path, delimiter=",")
        rows.append({
            "experiment": str(directory),
            "mean_auc": float(values[:-1].mean()),
            "std_auc": float(values[-1]),
            "n_folds": int(len(values) - 1),
        })
    table = pd.DataFrame(rows)
    if out_csv is not None and len(table):
        table.to_csv(out_csv, index=False)
    return table
