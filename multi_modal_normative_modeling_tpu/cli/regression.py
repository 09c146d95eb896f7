"""Regression-head k-fold training (continuous score FI).

Drop-in CLI for multimodal_kfold_train_cvae_supervised_regression.py: KFold
over the whole cohort (all subjects, :51-53), raw [AGE, PTGENDER] covariates
(c_dim=2), batch 128 with per-epoch shuffling (:94), RMSE/MAE/R2/MAPE eval,
fold_<k>_{pred,true}.npy + scatter PNG, and full-cohort ROI-wise deviation
CSVs regression_outputs/deviation_fold_<k>_<modality>_roiwise.csv with the
``IID,ROI_0..`` header (:163-192, golden files confirm).
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
from ..models.regression import RegressionCVAE
from ..train import TrainConfig


def evaluate_regression(y_true, y_pred) -> dict:
    from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score

    rmse = np.sqrt(mean_squared_error(y_true, y_pred))
    mae = mean_absolute_error(y_true, y_pred)
    r2 = r2_score(y_true, y_pred)
    mape = np.mean(np.abs((y_true - y_pred) / (y_true + 1e-6))) * 100
    return {'RMSE': rmse, 'MAE': mae, 'R2': r2, 'MAPE': mape}


def train_and_test(args, project_root=None):
    from ..data.preprocess import fit_robust_scaler
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep

    project_root = Path(project_root) if project_root else Path.cwd()
    np.random.seed(42)
    output_dir = project_root / 'regression_outputs'
    output_dir.mkdir(exist_ok=True)

    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)

    kf = KFold(n_splits=args.n_splits, shuffle=True, random_state=42)
    model = None
    all_scores = []

    # ---- phase 1: per-fold data prep --------------------------------------
    fold_data = []
    for fold, (train_idx, test_idx) in enumerate(kf.split(ids_df)):
        train_ids = ids_df.iloc[train_idx]['IID'].tolist()
        test_ids = ids_df.iloc[test_idx]['IID'].tolist()

        train_data_list, test_data_list = [], []
        train_cov = test_cov = None
        train_fi = test_fi = None
        input_dim_list = []
        train_frames, test_frames = [], []

        for dataset_name in dataset_names:
            columns_name = registry.get_column_name(args.dataset_resourse,
                                                    dataset_name)
            modality_path = (project_root / 'data' / args.dataset_resourse /
                             f'{dataset_name}.csv')
            # cached read: the reference re-parses each modality CSV (and
            # y.csv, = ids_df) once per fold (multi-second waste at PPMI
            # widths); the merge math below is unchanged
            from .common import read_csv_cached

            modality_df = read_csv_cached(modality_path)
            demo_df = ids_df
            train_df = pd.merge(
                modality_df[modality_df['IID'].isin(train_ids)], demo_df,
                on='IID')
            test_df = pd.merge(
                modality_df[modality_df['IID'].isin(test_ids)], demo_df,
                on='IID')
            train_frames.append(train_df)
            test_frames.append(test_df)

            train_scaled, scaler = fit_robust_scaler(
                train_df[columns_name].values)
            train_data_list.append(train_scaled.astype(np.float32))
            test_data_list.append(
                scaler.transform(test_df[columns_name].values)
                .astype(np.float32))
            train_cov = train_df[['AGE', 'PTGENDER']].values.astype(np.float32)
            test_cov = test_df[['AGE', 'PTGENDER']].values.astype(np.float32)
            train_fi = train_df['FI'].values.astype(np.float32)
            test_fi = test_df['FI'].values.astype(np.float32)
            input_dim_list.append(train_data_list[-1].shape[1])

        from .common import assert_modalities_aligned

        assert_modalities_aligned(train_frames,
                                  f'regression train fold {fold}', key='IID')
        assert_modalities_aligned(test_frames,
                                  f'regression test fold {fold}', key='IID')
        fold_data.append({
            'train': (train_data_list, [train_cov] * len(dataset_names)),
            'train_fi': train_fi,
            'test_data_list': test_data_list,
            'test_cov': test_cov,
            'test_fi': test_fi,
            'input_dim_list': input_dim_list,
        })

    # ---- phase 2: train (sequential or fold-parallel) ----------------------
    h_dim = args.hz_para_list[:-1]
    z_dim = args.hz_para_list[-1]
    input_dim_list = fold_data[0]['input_dim_list']
    model = RegressionCVAE(input_dim_list, h_dim, z_dim, c_dim=2,
                           modalities=len(dataset_names), non_linear=True)
    config = TrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                         learning_rate=args.base_learning_rate,
                         combine=args.combine, shuffle=True, seed=42)

    def loss_fn(p, batch, k):
        fwd = model.forward(p, list(batch['x']), list(batch['c']), k,
                            config.combine)
        losses = model.loss(p, list(batch['x']), fwd,
                            batch['extras']['fi'][:, 0],
                            lambda_reg=1.0, mask=batch['mask'])
        return losses['total'], losses

    n_folds = len(fold_data)
    # the reference re-seeds 42 per fold, so every fold's init is identical:
    # init once on the LOCAL CPU backend and share (bit-identical threefry;
    # remote eager init costs ~0.4s/op through the tunnel)
    from .common import host_init_params, host_prng_key
    init_params = host_init_params(model)
    params_list = [init_params for _ in range(n_folds)]
    key42 = host_prng_key(42)
    keys = [key42 for _ in range(n_folds)]  # reference parity
    from .common import (
        parse_run_mesh,
        require_checkpoint_for_resume,
        run_folds,
    )

    mesh, mesh_shardings = parse_run_mesh(args, n_folds, config.batch_size)
    require_checkpoint_for_resume(args)
    checkpoint_every = getattr(args, 'checkpoint_every', 0) or 0
    resume = getattr(args, 'resume', False)
    fold_parallel = getattr(args, 'fold_parallel', False)
    packed = getattr(args, 'packed_xla', False)
    if packed:
        # covariates are uniform by construction here (one train_cov block
        # repeated per modality); fusion/mesh are the live constraints
        reasons = [r for r, on in [
            ('--mesh', mesh is not None),
            (f'fusion {config.combine!r}',
             config.combine.lower() not in ('poe', 'gpoe', 'moe', 'mopoe')),
        ] if on]
        if reasons:
            print(f'--packed_xla unavailable ({"; ".join(reasons)}); '
                  'using the per-modality layout')
            packed = False
    if packed and fold_parallel:
        nbs = {max(1, -(-f['train'][0][0].shape[0] // config.batch_size))
               for f in fold_data}
        if len(nbs) > 1:
            # same contract as run_folds: vmapped folds share one batch
            # grid, and the per-epoch shuffle permutes over it
            print('fold-parallel disabled for this packed run: '
                  'shuffle=True with unequal fold batch grids would '
                  'diverge from the sequential numerics; training folds '
                  'sequentially')
            fold_parallel = False
    if packed:
        from ..train.packed_regression import (
            GroupedRegressionMultiTrainer,
            GroupedRegressionTrainer,
            regression_state_dirname,
        )

        reg_folds = [(f['train'][0], f['train'][1][0], f['train_fi'])
                     for f in fold_data]
        if fold_parallel:
            max_n = max(f['train'][0][0].shape[0] for f in fold_data)
            tr = GroupedRegressionMultiTrainer(model, config, max_n)
            print('train model (all folds fold-parallel, width-grouped '
                  'regression modalities)')
            if checkpoint_every:
                per_fold_params, per_fold_logs = tr.run_resumable(
                    params_list, reg_folds, list(keys),
                    state_dir=output_dir / regression_state_dirname(),
                    checkpoint_every=checkpoint_every, resume=resume)
            else:
                per_fold_params, per_fold_logs = tr.run(
                    params_list, reg_folds, list(keys))
        else:
            tr = GroupedRegressionTrainer(
                model, config, fold_data[0]['train'][0][0].shape[0])
            print('train model (width-grouped regression modalities)')
            per_fold_params, per_fold_logs = [], []
            for f_i, (d, c, fi) in enumerate(reg_folds):
                if checkpoint_every:
                    p, lg = tr.run_resumable(
                        params_list[f_i], d, c, fi, keys[f_i],
                        state_dir=output_dir
                        / regression_state_dirname(f_i),
                        checkpoint_every=checkpoint_every, resume=resume)
                else:
                    p, lg = tr.run(params_list[f_i], d, c, fi, keys[f_i])
                per_fold_params.append(p)
                per_fold_logs.append(lg)
    else:
        per_fold_params, per_fold_logs = run_folds(
            model, config, [f['train'] for f in fold_data], params_list,
            keys, fold_parallel, loss_fn=loss_fn,
            per_fold_extras=[{'fi': f['train_fi'][:, None]}
                             for f in fold_data],
            mesh=mesh, shardings_fn=mesh_shardings, state_dir=output_dir,
            checkpoint_every=checkpoint_every, resume=resume)

    # ---- phase 3: fold-stacked eval + artifacts -----------------------------
    # The full-cohort blocks are IDENTICAL across folds (the reference re-reads
    # and re-scales the modality CSV per fold, :163-179 — pure waste): read +
    # scale once, then run every per-fold device program as ONE vmapped call
    # over the stacked fold axis (per-fold PRNG streams preserved on-device).
    stacked_params = jax.tree_util.tree_map(
        lambda *leaves: np.stack([np.asarray(l) for l in leaves]),
        *per_fold_params)
    n_mod = len(dataset_names)

    # FI predictions: pad test rows to a common bucket (fold sizes differ by
    # +-1; rows are independent through the model)
    max_rows = max(f['test_data_list'][0].shape[0] for f in fold_data)
    # --mesh F,D also shards the eval program (folds over F, rows over D)
    from .common import (
        check_infer_fold_axis,
        fold_infer_jit,
        infer_row_tile,
        parse_infer_mesh,
    )

    infer_mesh = parse_infer_mesh(getattr(args, 'mesh', None))
    check_infer_fold_axis(infer_mesh, n_folds)
    tile = infer_row_tile(infer_mesh)
    padded_rows = -(-max_rows // tile) * tile

    def pad(a):
        a = np.asarray(a, dtype=np.float32)
        return np.pad(a, ((0, padded_rows - a.shape[0]), (0, 0)))

    xes = tuple(np.stack([pad(f['test_data_list'][m]) for f in fold_data])
                for m in range(n_mod))
    cs = (np.stack([pad(f['test_cov']) for f in fold_data]),) * n_mod
    seeds = np.array([900 + f for f in range(n_folds)], dtype=np.uint32)

    def fi_one(params, xes, cs, seed):
        return model.pred_fi(params, list(xes), list(cs),
                             jax.random.PRNGKey(seed), args.combine)

    all_fi = np.asarray(fold_infer_jit(fi_one, infer_mesh)(
        stacked_params, xes, cs, seeds))

    for fold in range(n_folds):
        print(f'=== Fold {fold} ===')
        logs = per_fold_logs[fold]
        test_fi = fold_data[fold]['test_fi']
        print(f"[Fold {fold}] final loss: {float(logs['total'][-1]):.4f}, "
              f"FI MSE: {float(logs['regression'][-1]):.4f}")

        n_rows = fold_data[fold]['test_data_list'][0].shape[0]
        preds = all_fi[fold, :n_rows].reshape(-1, 1)
        trues = test_fi.reshape(-1, 1)

        np.save(output_dir / f'fold_{fold}_pred.npy', preds)
        np.save(output_dir / f'fold_{fold}_true.npy', trues)
        scores = evaluate_regression(trues, preds)
        all_scores.append(scores)
        print(f"[Fold {fold}] RMSE: {scores['RMSE']:.4f}, "
              f"MAE: {scores['MAE']:.4f}, R²: {scores['R2']:.4f}, "
              f"MAPE: {scores['MAPE']:.2f}%")

        from matplotlib.figure import Figure
        fig = Figure(figsize=(6, 6))
        ax = fig.add_subplot(1, 1, 1)
        ax.scatter(trues, preds, alpha=0.5)
        ax.plot([trues.min(), trues.max()], [trues.min(), trues.max()], 'r--')
        ax.set_xlabel('True FI')
        ax.set_ylabel('Predicted FI')
        ax.set_title(f'Fold {fold} - FI Prediction')
        ax.grid(True)
        fig.savefig(output_dir / f'fold_{fold}_scatter.png')

    # full-cohort ROI-wise deviation per modality, scaler refit on the
    # whole cohort (reference quirk, :177-179)
    all_ids = ids_df['IID'].tolist()
    demo_df = pd.read_csv(participants_path)
    seeds800 = np.array([800 + f for f in range(n_folds)], dtype=np.uint32)
    for modal_idx, dataset_name in enumerate(dataset_names):
        print(f'Extracting ROI-wise deviation for {dataset_name} '
              f'(all {n_folds} folds)...')
        columns_name = registry.get_column_name(args.dataset_resourse,
                                                dataset_name)
        modality_df = pd.read_csv(
            project_root / 'data' / args.dataset_resourse /
            f'{dataset_name}.csv')
        full_df = pd.merge(
            modality_df[modality_df['IID'].isin(all_ids)], demo_df,
            on='IID')
        x = fit_robust_scaler(
            full_df[columns_name].values)[0].astype(np.float32)
        c = full_df[['AGE', 'PTGENDER']].values.astype(np.float32)

        def roi_one(params, seed, xx, cc, _mi=modal_idx):
            return model.roiwise_deviation(params, xx, cc,
                                           jax.random.PRNGKey(seed), _mi)

        deviations = np.asarray(jax.jit(
            jax.vmap(roi_one, in_axes=(0, 0, None, None)))(
                stacked_params, seeds800, x, c))
        iids = full_df['IID'].tolist()
        for fold in range(n_folds):
            out = pd.DataFrame(
                deviations[fold],
                columns=[f'ROI_{i}' for i in range(deviations.shape[2])])
            out.insert(0, 'IID', iids)
            write_csv(output_dir /
                      f'deviation_fold_{fold}_{dataset_name}_roiwise.csv', out)

    print('Training & evaluation complete.')
    return all_scores


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('-R', '--dataset_resourse', type=str, default='ADNI')
    parser.add_argument('-H', '--hz_para_list', nargs='+', type=int,
                        default=[110, 110, 10])
    parser.add_argument('-C', '--combine', type=str, default='gpoe')
    parser.add_argument('-P', '--procedure', type=str, default='UCA-gPoE')
    parser.add_argument('-E', '--epochs', type=int, default=500)
    parser.add_argument('-K', '--n_splits', type=int, default=5)
    parser.add_argument('--batch_size', type=int, default=128)
    parser.add_argument('-BaseLR', '--base_learning_rate', type=float,
                        default=0.0001)
    parser.add_argument('--fold_parallel', dest='fold_parallel',
                        action='store_true',
                        help='train every CV fold concurrently as one '
                             'vmapped device program.')
    parser.add_argument('--packed_xla', dest='packed_xla',
                        action='store_true',
                        help='train on the packed (width-grouped) layout: '
                             'the cvae skeleton rides batched [M] einsums '
                             'with the residual-concat regressor on top; '
                             'the per-epoch shuffle is preserved')
    from .common import add_mesh_flag

    add_mesh_flag(parser)
    from .common import add_resume_flags
    add_resume_flags(parser)
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    train_and_test(args, project_root=project_root)


if __name__ == '__main__':
    run()
