"""Fold-ensemble scoring core, shared by the serving daemon (cli/serve.py)
and the AOT model exporter (cli/export.py).

Both products score NEW subjects against a trained k-fold ensemble with the
reference's serving convention (multimodal_kfold_test_cvae_supervised.py:
82-90): each fold's RobustScaler is refit from that fold's train ids, each
fold conditions on covariates binned by ITS train cohort, each fold samples
its own PRNG stream, and the ensemble score is the fold mean. This module
owns the per-fold state restore (checkpoints, scaler center/scale arrays,
train covariate cohorts) and the per-fold scale -> encode/decode -> deviate
compute body; callers decide how to batch it (serve: jit(vmap) with
host-side covariate binning; export: in-graph binning baked into a
serialized StableHLO program).
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Tuple

import numpy as np

from .. import registry
from ..parallel.folds import stack_params


@dataclass
class EnsembleState:
    """Everything needed to score new subjects with a trained ensemble."""

    resource: str
    procedure: str
    combine: str
    n_splits: int
    seed: int
    model: object            # the variant model (models/*), shared by folds
    config: dict             # cVAE_model.json of fold 0
    dataset_names: List[str]
    columns: List[List[str]]  # per-modality feature column names
    stacked_params: object   # params pytree with a leading [K] fold axis
    centers: Tuple[np.ndarray, ...]  # per modality [K, F_m] scaler centers
    scales: Tuple[np.ndarray, ...]   # per modality [K, F_m] scaler scales
    seeds: np.ndarray        # [K] int32 per-fold PRNG seeds
    train_covs: list         # per fold: AGE/PTGENDER frame of the train ids


def load_ensemble(resource: str, procedure: str, combine: str = None,
                  n_splits: int = 10, project_root=None,
                  seed: int = 42) -> EnsembleState:
    """Restore every fold's checkpoint + train-cohort preprocessing state
    from a trained experiment directory (outputs/kfold_analysis)."""
    from ..cli import common  # lazy: cli.common configures the jax cache

    project_root = Path(project_root) if project_root else Path.cwd()
    kfold_dir = project_root / 'outputs' / 'kfold_analysis'
    model_dir = kfold_dir / 'supervised_cvae'
    participants_path = project_root / 'data' / resource / 'y.csv'
    dataset_names = registry.get_datasets_name(resource, procedure)

    params_list, centers, scales, train_covs = [], [], [], []
    model = config = None
    for fold in range(n_splits):
        fold_dir = model_dir / f'{fold:03d}'
        train_ids_path = kfold_dir / f'train_ids_{fold:03d}.csv'
        fold_model, params, fold_config = common.load_model_and_params(
            fold_dir)
        if model is None:
            model, config = fold_model, fold_config
        params_list.append(params)
        fold_centers, fold_scales = [], []
        for name in dataset_names:
            prep = common.prepare_modality(
                project_root, resource, name, participants_path,
                train_ids_path)
            fold_centers.append(np.asarray(prep['scaler'].center, np.float32))
            fold_scales.append(np.asarray(prep['scaler'].scale, np.float32))
        centers.append(fold_centers)
        scales.append(fold_scales)
        # covariates ride the demographic merge, identical across modalities
        train_covs.append(prep['train_df'][['AGE', 'PTGENDER']])

    return EnsembleState(
        resource=resource,
        procedure=procedure,
        combine=combine or procedure.split('-')[1],
        n_splits=n_splits,
        seed=seed,
        model=model,
        config=config,
        dataset_names=list(dataset_names),
        columns=[registry.get_column_name(resource, n)
                 for n in dataset_names],
        stacked_params=stack_params(params_list),
        centers=tuple(np.stack([c[m] for c in centers])
                      for m in range(len(dataset_names))),
        scales=tuple(np.stack([s[m] for s in scales])
                     for m in range(len(dataset_names))),
        seeds=np.arange(n_splits, dtype=np.int32) + seed,
        train_covs=train_covs,
    )


def fold_infer_fn(state: EnsembleState):
    """The one-fold compute body: scale raw features by the fold's train
    scaler, stochastic reconstruction (reference quirk Q2: pred_recon
    samples z), per-modality scalar deviations and the concatenated
    per-ROI squared-error plane.

    Returns (devs [M, n], roi [n, sum F_m]); vmap it over the fold axis of
    (params, centers, scales, cov, seed) with features broadcast.
    """
    import jax
    import jax.numpy as jnp

    model, combine = state.model, state.combine
    n_mod = len(state.dataset_names)

    def infer_one(params, center, scale, cov, fold_seed, xes):
        xs = [(x - c) / s for x, c, s in zip(xes, center, scale)]
        key = jax.random.PRNGKey(fold_seed)
        recons = model.pred_recon(params, xs, [cov] * n_mod, key, combine)
        devs = jnp.stack(
            [model.reconstruction_deviation(xs[m], recons[m])
             for m in range(n_mod)])                      # [M, n]
        roi = jnp.concatenate(
            [(xs[m] - recons[m]) ** 2 for m in range(n_mod)],
            axis=1)                                       # [n, sum F]
        return devs, roi

    return infer_one
