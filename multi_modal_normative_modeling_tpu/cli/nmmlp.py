"""nm-MLP variant: train / test / analyze subcommands.

Drop-in CLI for multimodal_kfold_cvae_nmmlp.py — the only truly *normative*
trainer in the reference (train rows filtered to HC, nmmlp:314) and the only
one whose cyclic LR schedule actually works (param_groups assignment,
nmmlp:380-381; base 1e-6 -> max 5e-5). Test emits per-fold CSVs (feature
columns first, participant_id appended last — nmmlp:498-511) plus
diagnosis_results.csv where the diagnosis score is the mean reconstruction
deviation across modalities (nmmlp:513-521); analyze computes ROC/Youden
metrics from those CSVs and appends outputs/analysis_results/
performance_metrics.txt.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np
import pandas as pd
from sklearn.model_selection import KFold

from .. import registry
from ..infer.emitters import write_csv
from ..data.loading import generate_kfold_ids
from .common import load_dataset_cached as load_dataset
from . import common
from ..data.preprocess import one_hot_covariates
from ..evaluation.reports import append_performance_metrics
from ..models.multimodal import MultimodalCVAE
from ..train import TrainConfig, checkpoint_exists, load_checkpoint


def _dirs(project_root: Path):
    outputs = project_root / 'outputs'
    kfold = outputs / 'kfold_analysis'
    model = kfold / 'supervised_cvae'
    for d in (outputs, kfold, model):
        d.mkdir(exist_ok=True, parents=True)
    return outputs, kfold, model


def _build_model(args, input_dim_list, c_dim, modalities):
    return MultimodalCVAE(input_dim_list, args.hz_para_list[:-1],
                          args.hz_para_list[-1], c_dim, modalities,
                          non_linear=True, variant='nmmlp')


def train(args, project_root: Path):
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep
    outputs, kfold_dir, model_dir = _dirs(project_root)
    np.random.seed(42)

    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    modalities = len(dataset_names)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)
    hc_label = registry.get_hc_label(args.dataset_resourse)

    HC_group = ids_df[ids_df['DIA'] == hc_label]
    other_group = ids_df[ids_df['DIA'] == 0]  # nmmlp:295 — AD only
    generate_kfold_ids(HC_group, other_group,
                       oversample_percentage=args.oversample_percentage,
                       n_splits=args.n_splits, project_root=project_root)

    kf = KFold(n_splits=args.n_splits, shuffle=True, random_state=42)
    folds, input_dim_list, c_dim = [], [], None
    for fold, _ in enumerate(kf.split(HC_group)):
        train_ids_path = kfold_dir / f'train_ids_{fold:03d}.csv'
        (model_dir / f'{fold:03d}').mkdir(exist_ok=True)

        data_list, cov_list = [], []
        input_dim_list = []
        for dataset_name in dataset_names:
            from ..data.preprocess import fit_robust_scaler

            columns_name = registry.get_column_name(args.dataset_resourse,
                                                    dataset_name)
            modality_path = (project_root / 'data' / args.dataset_resourse /
                             f'{dataset_name}.csv')
            train_df = load_dataset(participants_path, train_ids_path,
                                    modality_path)
            # normative training: HC rows only (nmmlp:314)
            train_df = train_df.loc[train_df['DIA'] == hc_label]
            data = fit_robust_scaler(
                train_df[columns_name].values
            )[0].astype(np.float32)
            cov = one_hot_covariates(train_df[['DIA', 'PTGENDER', 'AGE']])
            data_list.append(data)
            cov_list.append(cov)
            input_dim_list.append(data.shape[1])
            c_dim = cov.shape[1]
        folds.append((data_list, cov_list))

    model = _build_model(args, input_dim_list, c_dim, modalities)
    # working cyclic schedule here (nmmlp:363-364, :380-381)
    config = TrainConfig(epochs=args.epochs, batch_size=256,
                         combine=args.combine, lr_schedule='cyclic',
                         base_lr=1e-6, max_lr=5e-5, shuffle=False, seed=42)
    n_folds = len(folds)
    # the reference re-seeds 42 per fold, so every fold's init is identical:
    # init once on the LOCAL CPU backend and share (bit-identical threefry;
    # remote eager init costs ~0.4s/op through the tunnel)
    from .common import host_init_params, host_prng_key
    init_params = host_init_params(model)
    params_list = [init_params for _ in range(n_folds)]
    key42 = host_prng_key(42)
    keys = [key42 for _ in range(n_folds)]  # reference parity

    print('Training model...')
    from .common import run_folds

    mesh, mesh_shardings = common.parse_run_mesh(args, n_folds,
                                                 config.batch_size)
    per_fold_params, per_fold_logs = run_folds(
        model, config, folds, params_list, keys,
        getattr(args, 'fold_parallel', False),
        mesh=mesh, shardings_fn=mesh_shardings, state_dir=model_dir,
        checkpoint_every=getattr(args, 'checkpoint_every', 0) or 0,
        resume=getattr(args, 'resume', False),
        packed=getattr(args, 'packed_xla', False))

    common.emit_fold_artifacts(model_dir, per_fold_logs, per_fold_params, {
        'model': 'nmmlp', 'input_dim_list': list(map(int, input_dim_list)),
        'hidden_dim': list(args.hz_para_list[:-1]),
        'latent_dim': int(args.hz_para_list[-1]), 'c_dim': int(c_dim),
        'modalities': modalities, 'non_linear': True,
        'combine': args.combine,
    }, n_folds)


def test(args, project_root: Path):
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep
    outputs, kfold_dir, model_dir = _dirs(project_root)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)
    hc_label = registry.get_hc_label(args.dataset_resourse)
    HC_group = ids_df[ids_df['DIA'] == hc_label]
    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    kf = KFold(n_splits=args.n_splits, shuffle=True, random_state=42)

    # ---- phase 1: per-fold host prep + checkpoint restore ------------------
    model = None
    pending = []
    for fold, _ in enumerate(kf.split(HC_group)):
        train_ids_path = kfold_dir / f'train_ids_{fold:03d}.csv'
        test_ids_path = kfold_dir / f'test_ids_{fold:03d}.csv'
        fold_model_dir = model_dir / f'{fold:03d}'
        fold_model_dir.mkdir(exist_ok=True)

        test_data_list, clinical_df_list, columns_list = [], [], []
        test_cov = None
        for dataset_name in dataset_names:
            from ..data.preprocess import fit_robust_scaler

            columns_name = registry.get_column_name(args.dataset_resourse,
                                                    dataset_name)
            modality_path = (project_root / 'data' / args.dataset_resourse /
                             f'{dataset_name}.csv')
            train_df = load_dataset(participants_path, train_ids_path,
                                    modality_path)
            train_df = train_df.loc[train_df['DIA'] == hc_label]
            test_df = load_dataset(participants_path, test_ids_path,
                                   modality_path)
            _, scaler = fit_robust_scaler(train_df[columns_name].values)
            # float64 for CSV formatting parity; downcast at the jit boundary
            test_data_list.append(
                scaler.transform(test_df[columns_name].values)
            )
            clinical_df_list.append(test_df)
            columns_list.append(columns_name)
            test_cov = one_hot_covariates(test_df[['DIA', 'AGE', 'PTGENDER']])

        from .common import assert_modalities_aligned

        assert_modalities_aligned(clinical_df_list,
                                  f'nmmlp test fold {fold}')
        if not checkpoint_exists(fold_model_dir):
            print('Model not found, please train the model first.')
            return
        print('Loading trained model...')
        _, config = load_checkpoint(fold_model_dir)
        if model is None:
            # rebuild from the SAVED architecture, not args: the reference
            # unpickles whole torch modules at test time, so its test stage
            # always runs the trained -H shape regardless of the flags
            model = MultimodalCVAE(
                config['input_dim_list'], config['hidden_dim'],
                config['latent_dim'], config['c_dim'], config['modalities'],
                non_linear=config.get('non_linear', True), variant='nmmlp')
            # abstract shapes/dtypes only: eager init costs a round trip
            # per op through the remote-TPU tunnel
            shapes = jax.eval_shape(model.init_params,
                                    jax.ShapeDtypeStruct((2,), np.uint32))
            template = jax.tree_util.tree_map(
                lambda s: np.zeros(s.shape, s.dtype), shapes)
        params, _ = load_checkpoint(fold_model_dir, template_params=template)
        pending.append({
            'fold': fold, 'dir': fold_model_dir, 'params': params,
            'test_data_list': test_data_list,
            'clinical_df': clinical_df_list[0],
            'columns_list': columns_list, 'test_cov': test_cov,
        })

    if not pending:
        return

    # ---- phase 2: ONE vmapped inference program over the stacked fold axis
    # (rows are independent through the model, so pad rows + slicing gives
    # per-fold outputs identical to sequential calls; deviations computed
    # in-program with the same jnp formula as the eager path) ---------------
    n_mod = len(dataset_names)
    max_rows = max(j['test_data_list'][0].shape[0] for j in pending)
    # --mesh F,D: shard the inference program (folds over F, rows over D)
    infer_mesh = common.parse_infer_mesh(getattr(args, 'mesh', None))
    common.check_infer_fold_axis(infer_mesh, len(pending),
                                 'folds with checkpoints')
    tile = common.infer_row_tile(infer_mesh)
    padded_rows = -(-max_rows // tile) * tile

    def pad(a):
        a = np.asarray(a, dtype=np.float32)
        return np.pad(a, ((0, padded_rows - a.shape[0]), (0, 0)))

    xes = tuple(np.stack([pad(j['test_data_list'][m]) for j in pending])
                for m in range(n_mod))
    cs = (np.stack([pad(j['test_cov']) for j in pending]),) * n_mod
    seeds = np.array([1000 + j['fold'] for j in pending], dtype=np.uint32)
    stacked_params = jax.tree_util.tree_map(
        lambda *leaves: np.stack(leaves), *[j['params'] for j in pending])

    def infer_one(params, xes, cs, seed):
        preds = model.pred_recon(params, list(xes), list(cs),
                                 jax.random.PRNGKey(seed), args.combine)
        devs = [model.reconstruction_deviation(xes[m], preds[m])
                for m in range(n_mod)]
        return preds, devs

    all_preds, all_devs = common.fold_infer_jit(infer_one, infer_mesh)(
        stacked_params, xes, cs, seeds)
    # one bulk device->host fetch, then numpy slicing
    all_preds = [np.asarray(p) for p in all_preds]
    all_devs = [np.asarray(d) for d in all_devs]

    # ---- phase 3: per-fold CSV emission ------------------------------------
    for i, job in enumerate(pending):
        fold, fold_model_dir = job['fold'], job['dir']
        n_rows = job['test_data_list'][0].shape[0]
        test_data_list = job['test_data_list']
        columns_list = job['columns_list']
        predictions = [all_preds[m][i, :n_rows] for m in range(n_mod)]
        deviations = [all_devs[m][i, :n_rows] for m in range(n_mod)]

        participant_ids = job['clinical_df']['participant_id'].values
        for idx, dataset_name in enumerate(dataset_names):
            out_dir = fold_model_dir / dataset_name
            out_dir.mkdir(exist_ok=True)
            normalized = pd.DataFrame(test_data_list[idx],
                                      columns=columns_list[idx])
            normalized['participant_id'] = participant_ids
            write_csv(out_dir / f'normalized_{dataset_name}.csv', normalized)
            recon = pd.DataFrame(predictions[idx], columns=columns_list[idx])
            recon['participant_id'] = participant_ids
            write_csv(out_dir / f'reconstruction_{dataset_name}.csv', recon)
            pd.DataFrame({
                'participant_id': participant_ids,
                'Reconstruction error': deviations[idx],
            }).to_csv(out_dir / f'reconstruction_error_{dataset_name}.csv',
                      index=False)

        diagnosis = np.mean(np.stack(deviations), axis=0)
        pd.DataFrame({
            'participant_id': participant_ids,
            'Diagnosis': diagnosis.ravel(),
            'True_Label': (job['clinical_df']['DIA'] != hc_label
                           ).astype(int).values,
        }).to_csv(fold_model_dir / 'diagnosis_results.csv', index=False)
        print(f'Fold {fold}:')


def analyze(args, project_root: Path):
    from sklearn.metrics import auc, roc_curve

    outputs, kfold_dir, model_dir = _dirs(project_root)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)
    hc_label = registry.get_hc_label(args.dataset_resourse)
    HC_group = ids_df[ids_df['DIA'] == hc_label]
    kf = KFold(n_splits=args.n_splits, shuffle=True, random_state=42)

    aucs, accs, sens, specs, sigs = [], [], [], [], []
    for fold, _ in enumerate(kf.split(HC_group)):
        path = model_dir / f'{fold:03d}' / 'diagnosis_results.csv'
        if not path.exists():
            print(f'Diagnosis results not found for fold {fold}. '
                  'Please run the test function first.')
            continue
        frame = pd.read_csv(path)
        labels = frame['True_Label'].values
        scores = frame['Diagnosis'].values
        fpr, tpr, thresholds = roc_curve(labels, scores)
        roc_auc = auc(fpr, tpr)
        aucs.append(roc_auc)
        threshold = thresholds[np.argmax(tpr - fpr)]
        predicted = (scores >= threshold).astype(int)
        accs.append(np.mean(predicted == labels))
        tp = np.sum((predicted == 1) & (labels == 1))
        tn = np.sum((predicted == 0) & (labels == 0))
        fp = np.sum((predicted == 1) & (labels == 0))
        fn = np.sum((predicted == 0) & (labels == 1))
        sens.append(tp / (tp + fn) if (tp + fn) > 0 else 0)
        specs.append(tn / (tn + fp) if (tn + fp) > 0 else 0)
        sigs.append(roc_auc / (1 - roc_auc) if roc_auc < 1 else float('inf'))
        print(f'Fold {fold}: ROC AUC: {roc_auc:.4f}')

    if not aucs:
        # no fold produced diagnosis CSVs (reference would np.mean([]) into a
        # NaN + RuntimeWarning, nmmlp:637); report cleanly instead
        print('No diagnosis results found for any fold; nothing to analyze.')
        return {'auc': None, 'auc_std': None}
    print('Overall Performance:')
    print(f'Mean ROC AUC: {np.mean(aucs):.4f} ± {np.std(aucs):.4f}')
    append_performance_metrics(
        outputs / 'analysis_results', np.mean(aucs), np.std(aucs),
        np.mean(accs), np.std(accs), np.mean(sens), np.std(sens),
        np.mean(specs), np.std(specs), np.mean(sigs), np.std(sigs),
    )
    return {'auc': np.mean(aucs), 'auc_std': np.std(aucs)}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Train, Test, and Analyze the model.')
    parser.add_argument('action', choices=['train', 'test', 'analyze', 'all'],
                        help='Action to perform, train, test, analyze, or all.')
    parser.add_argument('-R', '--dataset_resourse', type=str, default='ADNI',
                        help='Dataset to use for training test and evaluation.')
    parser.add_argument('-H', '--hz_para_list', nargs='+', type=int,
                        default=[110, 110, 10],
                        help='List of paras to perform the analysis.')
    parser.add_argument('-C', '--combine', type=str,
                        help='How to combine all modalities.')
    parser.add_argument('-P', '--procedure', type=str, default='SE-MoE',
                        help='Procedure to perform the analysis.')
    parser.add_argument('-E', '--epochs', type=int, default=200,
                        help='Number of epochs to train the model.')
    parser.add_argument('-K', '--n_splits', type=int, default=5,
                        help='Number of splits for k-fold cross-validation.')
    parser.add_argument('-O', '--oversample_percentage', type=float, default=1,
                        help='Percentage of oversampling of the training data.')
    parser.add_argument('--fold_parallel', dest='fold_parallel',
                        action='store_true',
                        help='train every CV fold concurrently as one '
                             'vmapped device program.')
    parser.add_argument('--packed_xla', dest='packed_xla',
                        action='store_true',
                        help='train on the packed-modality layout (the '
                             'nm-MLP variant shares the cvae skeleton, so '
                             'every layer becomes one batched einsum over '
                             'all modalities; falls back loudly when the '
                             'cohort does not support it).')
    common.add_mesh_flag(parser)
    common.add_resume_flags(parser)
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    if args.combine is None:
        args.combine = args.procedure.split('-')[1]
    project_root = Path(project_root) if project_root else Path.cwd()
    if args.action in ('train', 'all'):
        train(args, project_root)
    if args.action in ('test', 'all'):
        test(args, project_root)
    if args.action in ('analyze', 'all'):
        analyze(args, project_root)


if __name__ == '__main__':
    run()
