"""AOT model export: package a trained fold-ensemble as a portable,
self-contained StableHLO scoring artifact (jax.export).

Beyond-reference capability. The reference's only deployment format is a
whole-model torch pickle per fold (multimodal_kfold_train_cvae_supervised
.py:211-212) — unpicklable without the exact source tree, torch, and the
training-time preprocessing re-derived by hand. The `.mmnm` artifact this
CLI writes embeds the ENTIRE scoring pipeline as one serialized StableHLO
program with the trained state baked in as constants:

  * per-fold RobustScaler center/scale (refit from each fold's train ids —
    the reference's serving convention, test script:82-90),
  * per-fold covariate bin edges (train-quantile/nearest-value binning,
    data/preprocess.binned_covariate_graph_spec) applied ON DEVICE,
  * per-fold PRNG seeds (stochastic reconstruction, SURVEY.md Q2),
  * per-fold train-cohort latent statistics (latent_deviation z-scoring,
    utils_vae.py:155-161, when the variant has a deterministic fused
    latent),
  * all fold checkpoints, vmapped into one ensemble dispatch.

The program takes raw per-modality feature matrices plus numeric AGE /
PTGENDER vectors and returns per-fold reconstruction (and latent)
deviations; the batch dimension is
shape-polymorphic (jax.export symbolic shapes), and the artifact carries
both CPU and TPU lowerings by default — callable from any JAX process via
`load_scorer`, with none of this package's model code on the unpickle path.

  python -m multi_modal_normative_modeling_tpu.cli.export \
      -R ADNI -P UCA-gPoE -K 10 -o model.mmnm
  scorer = load_scorer('model.mmnm')
  out = scorer.score({'av45': X, ...}, {'AGE': ages, 'PTGENDER': genders})

Scoring semantics match cli/serve.py's raw-payload path (same scalers,
binning, PRNG streams, fold-ensemble mean) — asserted against it in
tests/test_export.py.
"""
from __future__ import annotations

import argparse
import json
import zipfile
from pathlib import Path

import numpy as np

from ..data.preprocess import (
    apply_binned_covariate_spec,
    binned_covariate_graph_spec,
)
from ..infer.ensemble import (
    EnsembleState,
    ensure_latent_stats,
    fold_infer_fn,
    fold_latent_fn,
    load_ensemble,
    validate_features,
)

FORMAT = 'mmnm-export/1'
PROGRAM_MEMBER = 'scoring.stablehlo'
META_MEMBER = 'meta.json'
COVARIATES = ('AGE', 'PTGENDER')


def build_score_fn(state: EnsembleState):
    """The jitted whole-ensemble scoring program with all trained state
    closed over as constants.

    Signature: (x_0, ..., x_{M-1}, age, gender) -> (devs [K, M, n],
    roi [K, n, sum F]) — plus (latent_dev [K, n], latent_z [K, n, D]) when
    the variant exposes a deterministic fused latent — where x_m is [n, F_m]
    raw (unscaled) features and age/gender are [n] numeric covariate
    vectors.
    """
    import jax
    import jax.numpy as jnp

    n_mod = len(state.dataset_names)
    specs = [binned_covariate_graph_spec(tc) for tc in state.train_covs]
    stacked = jax.tree_util.tree_map(jnp.asarray, state.stacked_params)
    centers = tuple(jnp.asarray(c) for c in state.centers)
    scales = tuple(jnp.asarray(s) for s in state.scales)
    seeds = jnp.asarray(state.seeds)
    infer_one = fold_infer_fn(state)
    has_latent = state.supports_latent
    if has_latent:
        ensure_latent_stats(state)
        latent_one = fold_latent_fn(state)
        lat_mean = jnp.asarray(state.latent_mean)
        lat_var = jnp.asarray(state.latent_var)

    def score(*args):
        xes = tuple(args[:n_mod])
        age, gender = args[n_mod], args[n_mod + 1]
        covs = jnp.stack([apply_binned_covariate_spec(spec, age, gender)
                          for spec in specs])             # [K, n, C]
        devs, roi = jax.vmap(infer_one, in_axes=(0, 0, 0, 0, 0, None))(
            stacked, centers, scales, covs, seeds, xes)
        if not has_latent:
            return devs, roi
        lat_s, lat_z = jax.vmap(
            latent_one, in_axes=(0, 0, 0, 0, 0, 0, None))(
            stacked, centers, scales, covs, lat_mean, lat_var, xes)
        return devs, roi, lat_s, lat_z

    return jax.jit(score)


def export_artifact(state: EnsembleState, out_path,
                    platforms=('cpu', 'tpu')) -> dict:
    """Serialize the scoring program + metadata into a `.mmnm` zip."""
    import jax
    from jax import export as jexport

    fn = build_score_fn(state)
    n = jexport.symbolic_shape('n')[0]
    arg_specs = [jax.ShapeDtypeStruct((n, len(cols)), np.float32)
                 for cols in state.columns]
    arg_specs += [jax.ShapeDtypeStruct((n,), np.float32)] * len(COVARIATES)
    exported = jexport.export(fn, platforms=list(platforms))(*arg_specs)

    meta = {
        'format': FORMAT,
        'resource': state.resource,
        'procedure': state.procedure,
        'combine': state.combine,
        'n_folds': state.n_splits,
        'seed': state.seed,
        'variant': state.config.get('variant', 'cvae'),
        'modalities': state.dataset_names,
        'feature_dims': [len(c) for c in state.columns],
        'columns': {name: cols for name, cols
                    in zip(state.dataset_names, state.columns)},
        'covariates': list(COVARIATES),
        'platforms': list(exported.platforms),
        'jax_version': jax.__version__,
        'has_latent': state.supports_latent,
        'inputs': [f'{name}[n, {len(cols)}] float32 raw features'
                   for name, cols in zip(state.dataset_names, state.columns)]
                  + [f'{c}[n] float32' for c in COVARIATES],
        'outputs': ['deviations[n_folds, n_modalities, n] float32',
                    f'roi_sq_error[n_folds, n, '
                    f'{sum(len(c) for c in state.columns)}] float32']
                   + (['latent_deviation[n_folds, n] float32',
                       f'latent_z[n_folds, n, '
                       f'{state.latent_mean.shape[1]}] float32']
                      if state.supports_latent else []),
    }
    out_path = Path(out_path)
    tmp = out_path.with_name(out_path.name + '.tmp')
    with zipfile.ZipFile(tmp, 'w', zipfile.ZIP_DEFLATED) as z:
        z.writestr(META_MEMBER, json.dumps(meta, indent=1))
        z.writestr(PROGRAM_MEMBER, exported.serialize())
    tmp.replace(out_path)
    return meta


class ExportedScorer:
    """Score raw payloads with a deserialized `.mmnm` artifact.

    Needs only jax + numpy at runtime (the StableHLO program carries the
    model, scalers, and covariate binning as constants)."""

    def __init__(self, path):
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            self.meta = json.loads(z.read(META_MEMBER))
            if self.meta.get('format') != FORMAT:
                raise ValueError(
                    f'{path}: unsupported artifact format '
                    f'{self.meta.get("format")!r} (want {FORMAT!r})')
            self._exported = jexport.deserialize(z.read(PROGRAM_MEMBER))

    def score(self, features: dict, covariates: dict, roi: bool = False,
              fold: int = None, latent: bool = False) -> dict:
        """serve.py-shaped result dict: fold-ensemble mean deviation per
        subject, per-modality means, optional per-ROI squared errors and
        latent z-scores."""
        meta = self.meta
        if fold is not None and not 0 <= fold < meta['n_folds']:
            raise ValueError(f"fold must be in [0, {meta['n_folds']})")
        if latent and not meta.get('has_latent'):
            raise ValueError(
                'this artifact was exported without latent outputs (model '
                f"variant {meta.get('variant')!r} has no deterministic "
                'fused latent)')
        mats, n = validate_features(features, meta['modalities'],
                                    meta['feature_dims'])
        covs = []
        for name in meta['covariates']:
            try:
                vec = np.asarray(covariates[name], np.float32)
            except (KeyError, TypeError, ValueError) as e:
                raise ValueError(
                    f'covariates must carry numeric equal-length '
                    f"{meta['covariates']} lists: {e}") from None
            if vec.shape != (n,):
                raise ValueError(f'covariate {name}: expected [{n}] values, '
                                 f'got {list(vec.shape)}')
            covs.append(vec)

        devs, rois, *lat = self._exported.call(*mats, *covs)
        devs = np.asarray(devs)                            # [K, M, n]
        folds = slice(None) if fold is None else slice(fold, fold + 1)
        per_mod = devs[folds].mean(axis=0)                 # [M, n]
        out = {
            'deviation': per_mod.mean(axis=0).tolist(),
            'per_modality': {name: per_mod[m].tolist()
                             for m, name in enumerate(meta['modalities'])},
            'n_folds': meta['n_folds'] if fold is None else 1,
        }
        if roi:
            out['roi_columns'] = [f'{c}_{name}' for name in meta['modalities']
                                  for c in meta['columns'][name]]
            out['roi'] = np.asarray(rois)[folds].mean(axis=0).tolist()
        if latent:
            lat_s, lat_z = (np.asarray(a) for a in lat)
            out['latent_deviation'] = lat_s[folds].mean(axis=0).tolist()
            out['latent_per_dim'] = lat_z[folds].mean(axis=0).tolist()
        return out


def load_scorer(path) -> ExportedScorer:
    return ExportedScorer(path)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Export a trained fold-ensemble as a portable StableHLO '
                    'scoring artifact.')
    parser.add_argument('-R', '--dataset_resourse', type=str, default='ADNI')
    parser.add_argument('-P', '--procedure', type=str, default='UCA-gPoE')
    parser.add_argument('-C', '--combine', type=str, default=None)
    parser.add_argument('-K', '--n_splits', type=int, default=10)
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('-o', '--output', required=True,
                        help='artifact path to write (convention: .mmnm)')
    parser.add_argument('--platforms', default='cpu,tpu',
                        help='comma-separated jax.export lowering targets')
    return parser


def run(argv=None, project_root=None):
    from ..utils.jaxconfig import warm_device_session

    args = build_parser().parse_args(argv)
    platforms = [p.strip() for p in args.platforms.split(',') if p.strip()]
    if not platforms:
        raise SystemExit(f'--platforms {args.platforms!r}: no lowering '
                         'targets given')
    warm_device_session()  # overlap the session attach with host prep
    state = load_ensemble(
        args.dataset_resourse, args.procedure, combine=args.combine,
        n_splits=args.n_splits, project_root=project_root, seed=args.seed)
    meta = export_artifact(state, args.output, platforms=platforms)
    size = Path(args.output).stat().st_size
    print(f"exported {meta['resource']}/{meta['procedure']} "
          f"({meta['n_folds']}-fold {meta['variant']} ensemble, "
          f"{'+'.join(meta['modalities'])}) -> {args.output} "
          f"[{size / 1e6:.2f} MB, platforms {','.join(meta['platforms'])}]")
    return meta


if __name__ == '__main__':
    run()
