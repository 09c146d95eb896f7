"""Supervised multimodal cVAE k-fold training.

Drop-in CLI for the reference multimodal_kfold_train_cvae_supervised.py with
the same flags, fold-id files, per-fold checkpoints and loss-curve PNGs — but
the per-fold hot loop is one jitted scan on the accelerator instead of a
Python batch loop (train/trainer.py), and all folds can train concurrently
with --fold_parallel (parallel/folds.py).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np
import pandas as pd
from sklearn.model_selection import KFold

from .. import registry
from ..data.loading import generate_kfold_ids
from ..train import FoldTrainer, TrainConfig, save_checkpoint
from ..utils.logging import Logger, plot_losses
from . import common


def main(args, project_root=None):
    project_root = Path(project_root) if project_root else Path.cwd()
    kf = KFold(n_splits=args.n_splits, shuffle=True, random_state=42)
    model_name = 'supervised_cvae'

    output_dir = project_root / 'outputs'
    output_dir.mkdir(exist_ok=True)
    kfold_dir = output_dir / 'kfold_analysis'
    kfold_dir.mkdir(exist_ok=True)
    model_dir = kfold_dir / model_name
    model_dir.mkdir(exist_ok=True)

    np.random.seed(42)

    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    modalities = len(dataset_names)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)

    hc_label = registry.get_hc_label(args.dataset_resourse)
    disease_label = 0
    training_class_label = hc_label if args.training_class == 'nm' else disease_label
    training_class_group = ids_df[ids_df['DIA'] == training_class_label]
    other_group = ids_df[ids_df['DIA'] != training_class_label]

    generate_kfold_ids(training_class_group, other_group,
                       oversample_percentage=args.oversample_percentage,
                       n_splits=args.n_splits, project_root=project_root)

    # Parity note (SURVEY.md Q1): the reference's cyclic LR assignment is a
    # no-op on torch Adam, so the effective LR is the constant 1e-4 passed to
    # the model constructor (train:161-169). We default to that; pass
    # --lr_schedule cyclic to enable the intended schedule.
    lr_schedule = getattr(args, 'lr_schedule', 'constant')

    trainer = None
    for fold, _ in enumerate(kf.split(training_class_group)):
        train_ids_path, _ = common.fold_paths(kfold_dir, fold)
        fold_model_dir = model_dir / f'{fold:03d}'
        fold_model_dir.mkdir(exist_ok=True)

        data_list, cov_list, input_dim_list = [], [], []
        c_dim = None
        for dataset_name in dataset_names:
            prep = common.prepare_modality(
                project_root, args.dataset_resourse, dataset_name,
                participants_path, train_ids_path,
            )
            data_list.append(prep['train_data'])
            cov_list.append(prep['train_cov'])
            input_dim_list.append(prep['train_data'].shape[1])
            c_dim = prep['train_cov'].shape[1]

        config_dict = common.model_config_dict(args, input_dim_list, c_dim,
                                               modalities)
        model = common.build_model_from_config(config_dict)
        params = model.init_params(jax.random.PRNGKey(42 + fold))

        if trainer is None:
            train_config = TrainConfig(
                epochs=args.epochs,
                batch_size=256,
                learning_rate=0.0001,
                combine=args.combine,
                lr_schedule=lr_schedule,
                base_lr=args.base_learning_rate,
                max_lr=args.max_learning_rate,
                shuffle=False,
                seed=42,
            )
            trainer = FoldTrainer(model, train_config,
                                  data_list[0].shape[0])
        print('train model')
        params, logs = trainer.run(params, data_list, cov_list,
                                   key=jax.random.PRNGKey(42 + fold))

        logger = Logger()
        logger.extend(logs)
        last = {k: float(v[-1]) for k, v in logs.items()}
        print('Train fold:', fold, ' final-epoch ',
              ', '.join(f'{k}: {round(v, 3)}' for k, v in last.items()))
        plot_losses(logger, fold_model_dir, 'training')
        save_checkpoint(fold_model_dir, params, config_dict)
        print('fold_model_dir:', fold_model_dir)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser)
    parser.add_argument('--lr_schedule', dest='lr_schedule',
                        default='constant', choices=['constant', 'cyclic'],
                        help='constant reproduces the reference (its cyclic '
                             'assignment is a no-op); cyclic enables the '
                             'intended triangular schedule.')
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    common.apply_post_parse_defaults(args)
    main(args, project_root=project_root)


if __name__ == '__main__':
    run()
