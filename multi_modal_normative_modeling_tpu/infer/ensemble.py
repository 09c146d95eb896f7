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
from typing import List, Optional, Tuple

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
    project_root: Optional[Path] = None  # for lazy train-cohort re-reads
    # per-fold train-cohort fused-latent statistics ([K, D] each), feeding
    # latent_deviation / separate_latent_deviation (utils_vae.py:155-161)
    # for NEW subjects; computed lazily by ensure_latent_stats (an extra
    # compile + full-train-cohort encode that most recon-only deployments
    # never need)
    latent_mean: Optional[np.ndarray] = None
    latent_var: Optional[np.ndarray] = None

    @property
    def supports_latent(self) -> bool:
        """Whether the variant has a deterministic fused latent (the DMVAE
        family splits private/shared latents and exposes none)."""
        return hasattr(self.model, 'latent_stats')


def validate_features(features: dict, modalities, feature_dims,
                      error_cls=ValueError):
    """Shared raw-payload feature validation for the scoring front-ends
    (serve.score_raw, ExportedScorer.score): per-modality presence + shape,
    cross-modality subject-count agreement. Returns (mats, n_subjects)."""
    mats = []
    for name, dim in zip(modalities, feature_dims):
        if name not in features:
            raise error_cls(f'missing features for modality {name!r} '
                            f'(need {list(modalities)})')
        try:
            mat = np.asarray(features[name], np.float32)
        except (ValueError, TypeError) as exc:
            # ragged rows / non-numeric cells: keep the error_cls contract
            # (serve maps it to a 400) instead of leaking a raw ValueError
            raise error_cls(f'modality {name!r}: features are not a '
                            f'numeric [n_subjects, {dim}] matrix ({exc})')
        if mat.ndim != 2 or mat.shape[1] != dim:
            raise error_cls(
                f'modality {name!r}: expected [n_subjects, {dim}] '
                f'features, got {list(mat.shape)}')
        mats.append(mat)
    ns = {m.shape[0] for m in mats}
    if len(ns) != 1:
        raise error_cls(f'modalities disagree on subject count: {ns}')
    return mats, ns.pop()


def resolve_combine(combine, config, procedure: str) -> str:
    """Fusion method for a scoring surface: explicit flag > the fusion the
    checkpoint was trained with (config['combine'], written by
    common.model_config_dict on every trainer) > the reference's
    '<datasets>-<fusion>' procedure-suffix convention (train:293). The
    suffix is a MODALITY name for SM-* procedures, so when the heuristic
    must be used it is validated here — a bad guess would otherwise surface
    as ValueError('No such combination method') deep inside jit tracing at
    the first scoring request (or silently score through the M==1
    single-modality shortcut)."""
    if combine:
        return combine
    from_config = (config or {}).get('combine')
    if from_config:
        return from_config
    parts = str(procedure).split('-')
    guess = parts[1] if len(parts) > 1 else ''
    if guess.lower() not in ('poe', 'gpoe', 'moe', 'mopoe'):
        raise ValueError(
            'cannot infer the fusion method: the checkpoint config records '
            f"no 'combine' and procedure {procedure!r} has suffix "
            f"{guess!r}, not one of ('poe', 'gpoe', 'moe', 'mopoe') — pass "
            'the fusion explicitly (--combine)')
    return guess


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
        fold_centers, fold_scales, fold_frames = [], [], []
        for name in dataset_names:
            prep = common.prepare_modality(
                project_root, resource, name, participants_path,
                train_ids_path)
            fold_centers.append(np.asarray(prep['scaler'].center, np.float32))
            fold_scales.append(np.asarray(prep['scaler'].scale, np.float32))
            fold_frames.append(prep['train_df'])
        # the per-fold covariates (and latent stats) pair modality-0 row
        # order with the last modality's frame — only coherent when every
        # modality CSV covers the same subjects in the same order
        common.assert_modalities_aligned(
            fold_frames, f'{resource}/{procedure} fold {fold} train cohort')
        centers.append(fold_centers)
        scales.append(fold_scales)
        # covariates ride the demographic merge, identical across modalities
        train_covs.append(prep['train_df'][['AGE', 'PTGENDER']])

    return EnsembleState(
        resource=resource,
        procedure=procedure,
        combine=resolve_combine(combine, config, procedure),
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
        project_root=project_root,
    )


def ensure_latent_stats(state: EnsembleState) -> None:
    """Fill state.latent_mean/latent_var on first need (idempotent).

    Deferred out of load_ensemble so recon-only serving startups skip the
    extra compile + full-train-cohort encode; the per-fold train matrices
    are re-derived through common.prepare_modality's memo (cheap when the
    load_ensemble entries are still cached, correct either way)."""
    from ..cli import common

    if not state.supports_latent:
        raise ValueError(
            f"model variant {state.config.get('variant', 'cvae')!r} has no "
            'deterministic fused latent; latent deviation scoring is '
            'unavailable')
    if state.latent_mean is not None:
        return
    kfold_dir = state.project_root / 'outputs' / 'kfold_analysis'
    participants_path = (state.project_root / 'data' / state.resource
                         / 'y.csv')
    fold_train_data, fold_train_onehot = [], []
    for fold in range(state.n_splits):
        fold_data = []
        for name in state.dataset_names:
            prep = common.prepare_modality(
                state.project_root, state.resource, name, participants_path,
                kfold_dir / f'train_ids_{fold:03d}.csv')
            fold_data.append(prep['train_data'])
        fold_train_data.append(fold_data)
        fold_train_onehot.append(prep['train_cov'])
    state.latent_mean, state.latent_var = _train_latent_stats(
        state, fold_train_data, fold_train_onehot)


def _train_latent_stats(state: EnsembleState, fold_train_data,
                        fold_train_onehot):
    """Per-fold mean/var ([K, D]) of the fused latent posterior means over
    each fold's (oversampled) train cohort — the ``mu_train`` statistics of
    latent_deviation (utils_vae.py:155-157) — as ONE jitted fold-vmapped
    program (ragged folds padded + masked; masked moments match np.mean /
    np.var ddof=0 on the unpadded rows)."""
    import jax
    import jax.numpy as jnp

    model, combine = state.model, state.combine
    n_mod = len(state.dataset_names)
    sizes = [c.shape[0] for c in fold_train_onehot]
    n_max = max(sizes)

    def pad(a):
        return np.pad(np.asarray(a, np.float32),
                      ((0, n_max - a.shape[0]), (0, 0)))

    xs = tuple(np.stack([pad(data[m]) for data in fold_train_data])
               for m in range(n_mod))
    covs = np.stack([pad(c) for c in fold_train_onehot])
    mask = np.stack([np.arange(n_max) < s for s in sizes]).astype(np.float32)

    def fold_moments(params, xes, cov, msk):
        mu, _ = model.latent_stats(params, list(xes), [cov] * n_mod, combine)
        w = msk[:, None]
        denom = jnp.sum(msk)
        mean = jnp.sum(mu * w, axis=0) / denom
        var = jnp.sum(w * (mu - mean) ** 2, axis=0) / denom
        return mean, var

    mean, var = jax.jit(jax.vmap(fold_moments))(
        state.stacked_params, xs, covs, mask)
    return np.asarray(mean), np.asarray(var)


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


def fold_latent_fn(state: EnsembleState):
    """One-fold latent deviation body: scale raw features, deterministic
    fused-latent posterior (model.latent_stats — no sampling), then z-score
    against the fold's train-cohort latent statistics. Returns
    (scalar [n], per_dim [n, D]) matching latent_deviation /
    separate_latent_deviation (utils_vae.py:155-161); vmap over the fold
    axis of (params, centers, scales, cov, latent_mean, latent_var) with
    features broadcast."""
    import jax.numpy as jnp

    model, combine = state.model, state.combine
    n_mod = len(state.dataset_names)

    def latent_one(params, center, scale, cov, mean_train, var_train, xes):
        xs = [(x - c) / s for x, c, s in zip(xes, center, scale)]
        mu, var = model.latent_stats(params, xs, [cov] * n_mod, combine)
        z = (mu - mean_train) / jnp.sqrt(var_train + var)  # [n, D]
        scalar = jnp.sum(jnp.abs(z), axis=1) / mu.shape[1]
        return scalar, z

    return latent_one


# -------------------------------------------------- expert-parallel serving

def pack_ensemble_ep(state: EnsembleState, stacked):
    """EnsembleState -> packed-modality operands for the expert-parallel
    scoring program: (packed_params [K, M, ...], centers_p [K, M, d_max],
    scales_p [K, M, d_max]). Scale padding is 1.0 (centers 0.0) so the
    padded feature columns scale to exactly zero."""
    import jax

    from ..train.packed import _pack_params_host

    k = int(np.shape(state.seeds)[0])
    # _pack_params_host: the O(folds x modalities x layers) pad/concat ops
    # run on the LOCAL cpu backend — each would otherwise be an eager
    # remote op (~0.4s compile + RTT) through the TPU tunnel at serve
    # startup
    per_fold = [
        _pack_params_host(stacked, jax.tree_util.tree_map(
            lambda leaf: np.asarray(leaf)[f], state.stacked_params))
        for f in range(k)
    ]
    packed_params = jax.tree_util.tree_map(
        lambda *leaves: np.stack([np.asarray(x) for x in leaves]), *per_fold)
    centers_p = np.zeros((k, stacked.modalities, stacked.d_max), np.float32)
    scales_p = np.ones((k, stacked.modalities, stacked.d_max), np.float32)
    for m, (c, s) in enumerate(zip(state.centers, state.scales)):
        centers_p[:, m, : c.shape[1]] = c
        scales_p[:, m, : s.shape[1]] = s
    return packed_params, centers_p, scales_p


def fold_infer_fn_ep(state: EnsembleState, stacked):
    """Packed-modality (expert-parallel) counterpart of fold_infer_fn: the
    scale -> reconstruct -> deviate body on the [M, rows, d_max] layout so
    a ('fold', 'modality', 'data') mesh shards per-modality experts
    (cli/test_supervised._ep_infer_program's layout, with the fold's train
    scaler applied in-program). PRNG stream matches the per-modality body
    (one [rows, Z] draw per fold), so values agree to fusion-reorder float
    tolerance. Returns (devs [M, n], sq [M, n, d_max]) — callers slice the
    padded squared-error plane into the per-ROI layout."""
    import jax

    combine = state.combine
    col = stacked.col_mask_np()[:, None, :]  # [M, 1, d_max]

    def infer_one(packed_params, center_p, scale_p, cov, fold_seed,
                  x_packed):
        xs = (x_packed - center_p[:, None, :]) / scale_p[:, None, :]
        key = jax.random.PRNGKey(fold_seed)
        recons = stacked.pred_recon(packed_params, xs, cov, key, combine)
        devs = stacked.reconstruction_deviation(xs, recons)      # [M, n]
        sq = ((xs - recons) ** 2) * col                          # padded 0
        return devs, sq

    return infer_one


def pack_ensemble_grouped(state: EnsembleState, grouped):
    """EnsembleState -> width-grouped operands for the expert-parallel
    scoring program (round 5): (packed_params with [K, ...] fold-stacked
    grouped leaves, centers/scales as tuples per width group of
    [K, G_g, d_g] at EXACT width — no padding, so no sentinel scale/center
    values are needed)."""
    import jax

    from ..train.packed import _pack_params_host

    k = int(np.shape(state.seeds)[0])
    per_fold = [
        _pack_params_host(grouped, jax.tree_util.tree_map(
            lambda leaf: np.asarray(leaf)[f], state.stacked_params))
        for f in range(k)
    ]
    packed_params = jax.tree_util.tree_map(
        lambda *leaves: np.stack([np.asarray(x) for x in leaves]), *per_fold)
    centers_g = tuple(
        np.stack([np.asarray(state.centers[m]) for m in idx], axis=1)
        for _, idx in grouped.groups)                  # [K, G_g, d_g]
    scales_g = tuple(
        np.stack([np.asarray(state.scales[m]) for m in idx], axis=1)
        for _, idx in grouped.groups)
    return packed_params, centers_g, scales_g


def fold_infer_fn_grouped(state: EnsembleState, grouped):
    """Width-grouped counterpart of fold_infer_fn_ep: scale -> reconstruct
    -> deviate on the pad-free tuple-per-width-group layout, so EP serving
    of mixed-width cohorts stops paying the padded layout's width tax.
    Returns (devs [M, n] in ORIGINAL modality order, sq tuple per group of
    [G_g, n, d_g]); PRNG stream matches the per-modality body (one
    [rows, Z] draw per fold)."""
    import jax
    import jax.numpy as jnp

    combine = state.combine
    inv = np.asarray(grouped.inv_perm)

    def infer_one(packed_params, centers_g, scales_g, cov, fold_seed,
                  x_groups):
        xs = tuple((xg - cg[:, None, :]) / sg[:, None, :]
                   for xg, cg, sg in zip(x_groups, centers_g, scales_g))
        key = jax.random.PRNGKey(fold_seed)
        recons = grouped.pred_recon(packed_params, xs, cov, key, combine)
        devs = grouped.reconstruction_deviation(xs, recons)  # grouped order
        devs = jnp.take(devs, jnp.asarray(inv), axis=0)      # original
        sq = tuple((xg - rg) ** 2 for xg, rg in zip(xs, recons))
        return devs, sq

    return infer_one
