"""Batch deviation scoring of new subjects ("serving" path).

Beyond-reference capability: the reference can only score the k-fold test
splits inside its test script. This CLI loads trained fold checkpoints and
scores an arbitrary subject list (an ids CSV) against the normative model,
emitting per-subject deviation scores and per-ROI deviations — optionally
ensembled over all folds (mean deviation across fold models, one jitted
program reused throughout).

Scalers are re-fit from each fold's train ids (the reference's convention,
multimodal_kfold_test_cvae_supervised.py:82-90), so the experiment directory
must contain outputs/kfold_analysis/{train_ids_*.csv} and the fold
checkpoints.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from .. import registry
from ..data.preprocess import train_binned_covariates
from ..infer.emitters import write_csv
from ..train import checkpoint_exists, load_checkpoint
from . import common


def score(args, project_root=None) -> pd.DataFrame:
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep
    project_root = Path(project_root) if project_root else Path.cwd()
    kfold_dir = project_root / 'outputs' / 'kfold_analysis'
    model_dir = kfold_dir / 'supervised_cvae'
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)

    folds = list(range(args.n_splits) if args.fold is None else [args.fold])
    emit_latent = getattr(args, 'latent', False)
    # --mesh F,D: the fold-ensemble scores as ONE vmapped program with
    # folds sharded over 'fold' and the padded subject rows over 'data' —
    # the scoring mirror of the test stage's fold_infer_jit (rows are
    # independent, so this is pure scale-out; PPMI-width scoring is where
    # the axes pay, parallel/modality.py:17-22).
    mesh = common.parse_infer_mesh(getattr(args, 'mesh', None))
    if mesh is not None:
        if emit_latent:
            raise SystemExit(
                '--latent is unmeshed (per-fold train-cohort stats have '
                'ragged row counts); run --latent without --mesh')
        if len(folds) % mesh.shape['fold']:
            raise SystemExit(
                f"--mesh: {len(folds)} fold(s) not divisible by the "
                f"fold axis ({mesh.shape['fold']})")
    model = None
    infer_fn = stats_fn = None
    template = None
    per_fold_dev = []
    per_fold_roi = []
    per_fold_lat = []
    collected = []
    subject_ids = None

    for fold in folds:
        fold_model_dir = model_dir / f'{fold:03d}'
        if not checkpoint_exists(fold_model_dir):
            raise FileNotFoundError(
                f'no checkpoint in {fold_model_dir}; train first')
        train_ids_path = kfold_dir / f'train_ids_{fold:03d}.csv'

        data_list, columns_list, frames, train_data_list = [], [], [], []
        for dataset_name in dataset_names:
            prep = common.prepare_modality(
                project_root, args.dataset_resourse, dataset_name,
                participants_path, train_ids_path, args.ids,
            )
            data_list.append(prep['test_data'])
            columns_list.append(prep['columns'])
            frames.append(prep['test_df'])
            train_data_list.append(prep['train_data'])
            subject_df = prep['test_df']
        common.assert_modalities_aligned(frames, f'score fold {fold}')
        # serving covariates: train-quantile binning, NOT the k-fold
        # test-split re-binning (which would make a subject's score depend
        # on the rest of the ids CSV and break for 1 subject). Frames are
        # aligned, so one modality's demographics stand for all (last
        # modality wins, matching the reference's test:102 convention).
        cov = train_binned_covariates(
            prep['train_df'][['AGE', 'PTGENDER']],
            subject_df[['AGE', 'PTGENDER']])
        subject_ids = subject_df['participant_id'].values

        config = json.loads(
            (fold_model_dir / 'cVAE_model.json').read_text())
        if model is None:
            from ..infer.ensemble import resolve_combine

            model = common.build_model_from_config(config)
            combine = resolve_combine(args.combine, config, args.procedure)

            @jax.jit
            def infer_fn(params, xes, cs, key):
                recons = model.pred_recon(params, list(xes), list(cs), key,
                                          combine)
                devs = [model.reconstruction_deviation(xes[m], recons[m])
                        for m in range(len(xes))]
                return recons, devs

            if emit_latent:
                if not hasattr(model, 'latent_stats'):
                    raise SystemExit(
                        f"--latent: model variant "
                        f"{config.get('variant', 'cvae')!r} has no "
                        'deterministic fused latent')
                stats_fn = jax.jit(lambda p, xes, cs: model.latent_stats(
                    p, list(xes), list(cs), combine))

        if template is None:
            # abstract shapes/dtypes only (eager init costs a round trip
            # per op through the remote-TPU tunnel)
            shapes = jax.eval_shape(model.init_params,
                                    jax.ShapeDtypeStruct((2,), np.uint32))
            template = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes)
        params, _ = load_checkpoint(fold_model_dir, template_params=template)

        if mesh is not None:
            collected.append((data_list, cov, params))
            continue

        n_rows = data_list[0].shape[0]
        padded = -(-n_rows // 64) * 64
        pad = lambda a: np.pad(np.asarray(a, np.float32),
                               ((0, padded - n_rows), (0, 0)))
        recons, devs = infer_fn(params, tuple(pad(x) for x in data_list),
                                (pad(cov),) * len(dataset_names),
                                jax.random.PRNGKey(args.seed + fold))
        devs = np.stack([np.asarray(d)[:n_rows] for d in devs])  # [M, N]
        per_fold_dev.append(devs.mean(axis=0))
        roi = np.concatenate(
            [(data_list[m] - np.asarray(recons[m])[:n_rows]) ** 2
             for m in range(len(dataset_names))], axis=1)
        per_fold_roi.append(roi)

        if emit_latent:
            # latent z-scores vs this fold's train-cohort latent stats
            # (utils_vae.py:155-157; deterministic — no sampling)
            from ..infer.deviation import latent_deviation

            mu_train, _ = stats_fn(
                params, tuple(np.asarray(t, np.float32)
                              for t in train_data_list),
                (prep['train_cov'],) * len(dataset_names))
            mu_s, var_s = stats_fn(params,
                                   tuple(pad(x) for x in data_list),
                                   (pad(cov),) * len(dataset_names))
            per_fold_lat.append(latent_deviation(
                np.asarray(mu_train), np.asarray(mu_s)[:n_rows],
                np.asarray(var_s)[:n_rows]))

    if mesh is not None:
        from ..infer.ensemble import resolve_combine  # noqa: F811
        from ..parallel.folds import stack_params

        n_rows = collected[0][0][0].shape[0]
        tile = common.infer_row_tile(mesh)
        padded = -(-n_rows // tile) * tile
        pad = lambda a: np.pad(np.asarray(a, np.float32),
                               ((0, padded - n_rows), (0, 0)))
        combine = resolve_combine(args.combine, config, args.procedure)

        def infer_one(params, xes, cs, seed):
            # same PRNG stream as the sequential path: PRNGKey(seed+fold),
            # derived on-device (a host PRNGKey is an eager tunnel RTT)
            k = jax.random.PRNGKey(seed)
            recons = model.pred_recon(params, list(xes), list(cs), k,
                                      combine)
            devs = [model.reconstruction_deviation(xes[m], recons[m])
                    for m in range(len(xes))]
            return recons, devs

        vinfer = common.fold_infer_jit(infer_one, mesh)
        stacked_params = stack_params([p for _, _, p in collected])
        xes = tuple(np.stack([pad(d[m]) for d, _, _ in collected])
                    for m in range(len(dataset_names)))
        cs = tuple(np.stack([pad(c) for _, c, _ in collected])
                   for _ in range(len(dataset_names)))
        seeds = np.asarray([args.seed + f for f in folds], np.uint32)
        recons, devs = vinfer(stacked_params, xes, cs, seeds)
        # one bulk fetch, then numpy slicing (per-fold device indexing
        # would issue an eager op per leaf per fold through the tunnel)
        recons = [np.asarray(r) for r in recons]
        devs = np.stack([np.asarray(d)[:, :n_rows] for d in devs])  # [M,F,N]
        per_fold_dev = list(devs.mean(axis=0))
        per_fold_roi = [
            np.concatenate(
                [(collected[f][0][m] - recons[m][f, :n_rows]) ** 2
                 for m in range(len(dataset_names))], axis=1)
            for f in range(len(folds))]

    deviation = np.mean(per_fold_dev, axis=0)
    roi_dev = np.mean(per_fold_roi, axis=0)

    out = pd.DataFrame({'participant_id': subject_ids,
                        'deviation': deviation})
    if emit_latent:
        out['latent_deviation'] = np.mean(per_fold_lat, axis=0)
    if args.output:
        out.to_csv(args.output, index=False)
        if args.roi_output:
            # modality-suffixed names: ADHD/UCA modalities share raw ROI
            # names, which would collide into duplicate CSV headers
            all_cols = [f'{c}_{name}' for cols, name
                        in zip(columns_list, dataset_names) for c in cols]
            roi_frame = pd.DataFrame(roi_dev, columns=all_cols)
            roi_frame.insert(0, 'participant_id', subject_ids)
            write_csv(args.roi_output, roi_frame)
        print(f'scored {len(out)} subjects '
              f'({"ensemble of " + str(len(per_fold_dev)) + " folds" if args.fold is None else f"fold {args.fold}"}) '
              f'-> {args.output}')
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Score subjects against a trained normative model.')
    parser.add_argument('-R', '--dataset_resourse', type=str, default='ADNI')
    parser.add_argument('-P', '--procedure', type=str, default='UCA-gPoE')
    parser.add_argument('-C', '--combine', type=str, default=None)
    parser.add_argument('-K', '--n_splits', type=int, default=10)
    parser.add_argument('--ids', required=True,
                        help='CSV with an IID column listing subjects to '
                             'score (must exist in the modality tables).')
    parser.add_argument('--fold', type=int, default=None,
                        help='score with one fold model instead of the '
                             'all-fold ensemble.')
    parser.add_argument('--output', default='deviation_scores.csv')
    parser.add_argument('--roi_output', default=None,
                        help='also write per-ROI squared deviations here.')
    parser.add_argument('--latent', action='store_true',
                        help='add a latent_deviation column (latent '
                             'z-scores against each fold train cohort, '
                             'utils_vae.py:155-157 semantics).')
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--mesh', default=None, metavar='F,D',
                        help='score the fold ensemble as ONE device program '
                             'sharded over a (fold x data) mesh: fold '
                             'models over F, padded subject rows over D '
                             '(axis product must equal the visible device '
                             'count; F must divide the fold count). '
                             'Values match the unmeshed ensemble to '
                             'float-reorder tolerance. --latent stays '
                             'unmeshed.')
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    # combine resolution happens in score() once the checkpoint config is
    # in hand (infer.ensemble.resolve_combine: config beats the
    # procedure-suffix heuristic, which is wrong for SM-* procedures)
    return score(args, project_root=project_root)


if __name__ == '__main__':
    run()
