"""Self-contained demo project for the notebooks (tsne.ipynb,
table_visualization.ipynb, visualization/ROI.ipynb): builds a synthetic ADNI
cohort and runs the full supervised pipeline (train -> test -> group
analysis) once, so every notebook executes end-to-end offline against real
pipeline artifacts. The reference notebooks assume the private cohorts are on
disk; here the cohort is synthesized (data/synthetic.py) with an injected
disease effect so the figures carry real signal.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _args(epochs: int, n_splits: int, procedure: str) -> argparse.Namespace:
    from . import registry

    suffix = procedure.split("-")[1]
    single = procedure.startswith("SM-")
    return argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[32, 32, 8],
        procedure=procedure,
        # SM-<modality>'s suffix is a MODALITY name, not a fusion
        combine="gPoE" if single else suffix,
        epochs=epochs, n_splits=n_splits, oversample_percentage=1,
        model="cVAE_multimodal", single_modality=None,
        base_learning_rate=0.0001, max_learning_rate=0.005,
        training_class="nm", lr_schedule="constant",
        # UCA appends the early-fusion concat modality; build it in memory
        in_memory_fusion=procedure.startswith("UCA"),
    )


def ensure_demo_project(root="outputs/notebook_demo", epochs: int = 60,
                        n_splits: int = 3, procedure: str = "SE-gPoE",
                        force: bool = False) -> Path:
    """Create (once) a synthetic ADNI project with completed train/test/
    analysis artifacts; returns the project root."""
    import os

    # Assignment, not setdefault: the demo is an offline CPU artifact, and
    # this image exports JAX_PLATFORMS=axon — with setdefault the env var
    # survives, configure_jax_cache() honors it, and the "CPU" demo build
    # silently dispatches its training to the remote chip (hanging for
    # minutes when the tunnel session attach is degraded).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

    from .cli import group_analysis, test_supervised, train_supervised
    from .data.synthetic import make_synthetic_resource

    root = Path(root)
    args = _args(epochs, n_splits, procedure)
    if force or not (root / "data" / "ADNI" / "y.csv").exists():
        root.mkdir(parents=True, exist_ok=True)
        make_synthetic_resource(root, "ADNI", n_hc=90,
                                n_disease={0: 40, 1: 40}, effect=0.8)
    model_dir = root / "outputs" / "kfold_analysis" / "supervised_cvae"
    if force or not (model_dir / "000" / "cVAE_model.ckpt").exists():
        train_supervised.main(args, project_root=root)
    dev_dir = (root / "deviation" / "supervised_cvae" / "ADNI" / procedure /
               "path_model")
    if force or not dev_dir.exists():
        test_supervised.main(args, project_root=root)
    if force or not (root / "result_baseline" / "result_multimodal.txt"
                     ).exists():
        group_analysis.main(args, project_root=root)
    return root


def ensure_procedure_projects(base_root="outputs/notebook_demo_procedures",
                              procedures=("SM-av45", "SE-gPoE", "UCA-gPoE"),
                              epochs: int = 60, n_splits: int = 3) -> dict:
    """One demo project per PROCEDURE (SM single-modality / SE simple
    fusion / UCA early-fusion-augmented — the reference's procedure grammar,
    utils.py:731-755), each trained on the same synthetic cohort. Feeds the
    per-procedure latent t-SNE panels (tsne.ipynb) and the procedure
    comparison tables (table_visualization.ipynb)."""
    base = Path(base_root)
    return {proc: ensure_demo_project(base / proc.replace("-", "_"),
                                      epochs=epochs, n_splits=n_splits,
                                      procedure=proc)
            for proc in procedures}


def load_fold_model(project_root, fold: int = 0):
    """(model, params, config) from a demo-project fold checkpoint."""
    from .cli.common import load_model_and_params

    fold_dir = (Path(project_root) / "outputs" / "kfold_analysis" /
                "supervised_cvae" / f"{fold:03d}")
    return load_model_and_params(fold_dir)


def cohort_latents(project_root, model, params, combine: str = "gpoe",
                   procedure: str = None):
    """Fused latent means for the WHOLE cohort (scaled on the full cohort)
    plus diagnosis labels — feeds the latent t-SNE (tsne.ipynb). With
    ``procedure`` the modality set follows the procedure grammar
    (get_datasets_name, utils.py:731-755); the UCA early-fusion modality is
    built in memory by concatenating the scaled base blocks (numerically
    the file-based path, cli/common.fuse_preps)."""
    import pandas as pd
    from sklearn.preprocessing import RobustScaler

    from . import registry
    from .data.preprocess import one_hot_covariates

    project_root = Path(project_root)
    y = pd.read_csv(project_root / "data" / "ADNI" / "y.csv")
    if procedure is None:
        names = [n for n in registry.BASE_MODALITIES["ADNI"]]
        fuse_tail = False
    else:
        names = list(registry.get_datasets_name("ADNI", procedure))
        fuse_tail = procedure.startswith("UCA")
        if fuse_tail:
            names = names[:-1]  # early-fusion block built from the bases
    # one shared subject order: reindex every modality against y's IIDs so
    # rows align across modalities regardless of per-CSV ordering
    iids = y["IID"]
    xes, cs = [], []
    for name in names:
        frame = pd.read_csv(project_root / "data" / "ADNI" / f"{name}.csv"
                            ).set_index("IID").loc[iids]
        merged = frame.join(y.set_index("IID"))
        cols = registry.get_column_name("ADNI", name)
        xes.append(RobustScaler().fit_transform(
            merged[cols].values).astype(np.float32))
        cs.append(one_hot_covariates(merged[["DIA", "PTGENDER", "AGE"]]))
    if procedure is not None and fuse_tail:
        xes.append(np.concatenate(xes, axis=1))
        cs.append(cs[-1])
    mus, _ = model.latent_stats(params, xes, cs, combine)
    return np.asarray(mus), y["DIA"].values
