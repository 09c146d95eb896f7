"""Whole-grid nm-PM-cont hyperparameter sweep in ONE device program.

TPU-native replacement for commands_list9_endtoend.sh's bash loop over
margins x contrastive weights: every (margin, weight) grid point x every CV
fold trains concurrently via parallel/sweep.py (the training step is
dependency-chain bound, so the grid costs roughly the wall-clock of a single
run). Per-config metric blocks append to results_endtoend.csv exactly like
sequential nmpmcont runs.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .. import registry
from ..data.loading import generate_kfold_ids_endtoend
from ..evaluation.metrics import binary_prediction_metrics
from ..evaluation.reports import append_endtoend_results
from ..models.endtoend import EndToEndCVAE
from ..parallel.folds import stack_fold_batches
from ..parallel.sweep import SweepTrainer
from ..train import TrainConfig
from . import common
from .common import load_dataset_cached as load_dataset
from .nmpmcont import process_dataset, process_test


def main(args, project_root=None):
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep
    project_root = Path(project_root) if project_root else Path.cwd()
    output_dir = project_root / 'outputs'
    kfold_dir = output_dir / 'kfold_analysis'
    kfold_dir.mkdir(parents=True, exist_ok=True)

    np.random.seed(42)
    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    modalities = len(dataset_names)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)
    hc_label = registry.get_hc_label(args.dataset_resourse)
    HC_group = ids_df[ids_df['DIA'] == hc_label]
    other_group = ids_df[ids_df['DIA'] != hc_label]
    generate_kfold_ids_endtoend(HC_group, other_group,
                                oversample_percentage=args.oversample_percentage,
                                n_splits=args.n_splits,
                                project_root=project_root)
    ids_source = kfold_dir
    if not (kfold_dir / 'train_ids_000.csv').exists():
        ids_source = output_dir / 'kfold_analysis_endtoend'

    # ---- data prep ----------------------------------------------------------
    fold_data = []
    input_dim_list, c_dim = [], None
    for fold in range(args.n_splits):
        train_ids = ids_source / f'train_ids_{fold:03d}.csv'
        test_ids = ids_source / f'test_ids_{fold:03d}.csv'
        train_x, train_c, test_x, test_c = [], [], [], []
        train_labels = test_labels = None
        input_dim_list = []
        train_frames, test_frames = [], []
        for dataset_name in dataset_names:
            columns = registry.get_column_name(args.dataset_resourse,
                                               dataset_name)
            path = (project_root / 'data' / args.dataset_resourse /
                    f'{dataset_name}.csv')
            train_df = load_dataset(participants_path, train_ids, path)
            test_df = load_dataset(participants_path, test_ids, path)
            data, cov, labels, scaler = process_dataset(train_df, columns,
                                                        hc_label)
            tdata, tcov, tlabels = process_test(test_df, columns, scaler,
                                                hc_label)
            train_x.append(data)
            train_c.append(cov)
            test_x.append(tdata)
            test_c.append(tcov)
            train_labels, test_labels = labels, tlabels
            input_dim_list.append(data.shape[1])
            c_dim = cov.shape[1]
            train_frames.append(train_df)
            test_frames.append(test_df)
        common.assert_modalities_aligned(train_frames,
                                         f'sweep_endtoend train fold {fold}')
        common.assert_modalities_aligned(test_frames,
                                         f'sweep_endtoend test fold {fold}')
        fold_data.append({'train': (train_x, train_c),
                          'labels': train_labels,
                          'test': (test_x, test_c, test_labels)})

    # ---- grid ----------------------------------------------------------------
    configs = [{'margin': m, 'wcon': w}
               for m in args.margins for w in args.weightcontrastives]
    n_folds = len(fold_data)
    model = EndToEndCVAE(input_dim_list, args.hz_para_list[:-1],
                         args.hz_para_list[-1], c_dim, modalities,
                         non_linear=True, classifier_layers=args.layers,
                         dropout_rate=0.5, num_classes=2)
    train_config = TrainConfig(epochs=args.epochs, batch_size=256,
                               learning_rate=0.0001, combine='poe', seed=42)

    def loss_fn(p, batch, k, hyper):
        labels = batch['extras']['labels'][:, 0].astype(jnp.int32)
        fwd = model.forward(p, list(batch['x']), list(batch['c']), k,
                            train=True, mask=batch['mask'])
        losses = model.loss(p, list(batch['x']), fwd, labels,
                            margin=hyper['margin'],
                            weight_contrastive=hyper['wcon'],
                            mask=batch['mask'])
        losses['__bn_state__'] = fwd['bn_state']
        return losses['total_loss'], losses

    state_update = lambda p, aux: {**p, 'bn_state': aux['__bn_state__']}
    batches = stack_fold_batches(
        [f['train'][0] for f in fold_data],
        [f['train'][1] for f in fold_data], train_config.batch_size,
        extras=[{'labels': f['labels'].astype(np.float32)[:, None]}
                for f in fold_data])
    # identical per-fold seeding (reference re-seeds 42 per fold,
    # train:119), computed once on the local CPU backend
    key42 = common.host_prng_key(42)
    keys = jnp.stack([np.stack([key42] * n_folds)] * len(configs))
    init_params = common.host_init_params(model)
    params_list = [init_params for _ in range(n_folds)]

    mesh = common.parse_sweep_mesh(getattr(args, 'mesh', None),
                                   len(configs), n_folds)
    print(f'training grid: {len(configs)} configs x {n_folds} folds '
          f'in one program'
          + (f' over a {dict(mesh.shape)} device mesh' if mesh else ''))
    sweep = SweepTrainer(model, train_config, fold_data[0]['train'][0][0].shape[0],
                         loss_fn, state_update, mesh=mesh)
    params_grid, _ = sweep.run(params_list, jax.device_put(batches), keys,
                               configs)

    # ---- evaluate + report per config ---------------------------------------
    results = {}
    for s, hyper in enumerate(configs):
        metrics_rows = []
        for f in range(n_folds):
            test_x, test_c, test_labels = fold_data[f]['test']
            logits = model.predict(params_grid[s][f],
                                   [np.asarray(x) for x in test_x],
                                   [np.asarray(c) for c in test_c])
            preds = np.argmax(np.asarray(logits), axis=1)
            metrics_rows.append(binary_prediction_metrics(test_labels, preds))
        frame = pd.DataFrame(metrics_rows)
        cfg_args = argparse.Namespace(**vars(args), margin=hyper['margin'],
                                      weightcontrastive=hyper['wcon'])
        append_endtoend_results(project_root / 'results_endtoend.csv',
                                cfg_args, frame)
        results[(hyper['margin'], hyper['wcon'])] = frame
        print(f"margin={hyper['margin']} wcon={hyper['wcon']}: "
              f"acc {frame['accuracy'].mean():.3f} "
              f"auroc {frame['auroc'].mean():.3f}")
    return results


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Whole-grid nm-PM-cont hyperparameter sweep.')
    common.add_common_flags(parser, default_n_splits=5)
    parser.add_argument('-Margins', '--margins', nargs='+', type=float,
                        default=[0.5, 1.0])
    parser.add_argument('-Weightcontrastives', '--weightcontrastives',
                        nargs='+', type=float, default=[0.1, 1.0])
    parser.add_argument('-Layers', '--layers', nargs='+', type=int,
                        default=[128, 64, 32])
    parser.add_argument('--mesh', default=None, metavar='S,F',
                        help='shard the sweep over a (config,fold) device '
                             'mesh, e.g. 4,2 (product must equal the '
                             'visible device count)')
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    common.apply_post_parse_defaults(args, default_procedure='SE-MoE')
    return main(args, project_root=project_root)


if __name__ == '__main__':
    run()
