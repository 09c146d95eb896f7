"""End-to-end supervised variant (nm-PM-cont).

Drop-in CLI for multimodal_kfold_cvae_nmpmcont.py: trains the dual-decoder
contrastive+classifier model per fold and appends per-metric mean±std lines to
results_endtoend.csv.

Reference quirks reproduced:
  * fold ids are *generated* into outputs/kfold_analysis_endtoend
    (nmpmcont:167) but *read* from outputs/kfold_analysis (nmpmcont:170-171);
    we do the same, falling back to the endtoend dir (with a note) when the
    main dir has no ids so a standalone run still works.
  * loss_function is called with only margin and weightcontrastive
    (nmpmcont:298): the -Weightkl / -Weightrec flags are accepted but unused;
    the effective weights are the method defaults 0.1/0.1 (cVAE.py:2140).
  * -Dropout and -Learningrateclassifier are likewise parsed but unused:
    the reference hardcodes dropout_rate=0.5 (nmpmcont:267) and comments
    out the classifier learning rate.
  * the cyclic LR assignment is a no-op (SURVEY.md Q1): constant 1e-4.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np
import pandas as pd
from sklearn.model_selection import KFold

from .. import registry
from ..data.loading import generate_kfold_ids_endtoend
from .common import load_dataset_cached as load_dataset
from ..data.preprocess import binary_labels, one_hot_covariates
from ..evaluation.metrics import binary_prediction_metrics
from ..evaluation.reports import append_endtoend_results
from ..models.endtoend import EndToEndCVAE
from ..train import TrainConfig
from . import common


def process_dataset(dataset_df, columns_name, hc_label):
    """Scale + one-hot covariates + binary labels (nmpmcont:75-123)."""
    from ..data.preprocess import fit_robust_scaler

    data, scaler = fit_robust_scaler(dataset_df[columns_name].values)
    covariates = one_hot_covariates(dataset_df[["DIA", "PTGENDER", "AGE"]])
    labels = binary_labels(dataset_df["DIA"], hc_label)
    return data.astype(np.float32), covariates, labels, scaler


def process_test(dataset_df, columns_name, scaler, hc_label):
    data = scaler.transform(dataset_df[columns_name].values)
    covariates = one_hot_covariates(dataset_df[["DIA", "PTGENDER", "AGE"]])
    labels = binary_labels(dataset_df["DIA"], hc_label)
    return data.astype(np.float32), covariates, labels


def main(args, project_root=None):
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep
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

    HC_group = ids_df[ids_df['DIA'] == hc_label]
    other_group = ids_df[ids_df['DIA'] != hc_label]

    generate_kfold_ids_endtoend(HC_group, other_group,
                                oversample_percentage=args.oversample_percentage,
                                n_splits=args.n_splits,
                                project_root=project_root)

    ids_source = kfold_dir
    if not (kfold_dir / 'train_ids_000.csv').exists():
        ids_source = output_dir / 'kfold_analysis_endtoend'
        print('note: no ids in kfold_analysis, using kfold_analysis_endtoend')

    all_metrics = []
    model = None
    fold_data = []

    for fold, _ in enumerate(kf.split(HC_group)):
        train_ids_path = ids_source / f'train_ids_{fold:03d}.csv'
        test_ids_path = ids_source / f'test_ids_{fold:03d}.csv'
        fold_model_dir = model_dir / f'{fold:03d}'
        fold_model_dir.mkdir(exist_ok=True)

        train_data_list, train_cov_list = [], []
        test_data_list, test_cov_list = [], []
        train_labels = test_labels = None
        input_dim_list, c_dim = [], None
        train_frames, test_frames = [], []

        for dataset_name in dataset_names:
            columns_name = registry.get_column_name(args.dataset_resourse,
                                                    dataset_name)
            modality_path = (project_root / 'data' / args.dataset_resourse /
                             f'{dataset_name}.csv')
            train_df = load_dataset(participants_path, train_ids_path,
                                    modality_path)
            test_df = load_dataset(participants_path, test_ids_path,
                                   modality_path)
            data, cov, labels, scaler = process_dataset(train_df, columns_name,
                                                        hc_label)
            tdata, tcov, tlabels = process_test(test_df, columns_name, scaler,
                                                hc_label)
            train_data_list.append(data)
            train_cov_list.append(cov)
            test_data_list.append(tdata)
            test_cov_list.append(tcov)
            train_labels, test_labels = labels, tlabels
            input_dim_list.append(data.shape[1])
            c_dim = cov.shape[1]
            train_frames.append(train_df)
            test_frames.append(test_df)

        common.assert_modalities_aligned(train_frames,
                                         f'nmpmcont train fold {fold}')
        common.assert_modalities_aligned(test_frames,
                                         f'nmpmcont test fold {fold}')
        fold_data.append({
            'train': (train_data_list, train_cov_list),
            'train_labels': train_labels,
            'test_data_list': test_data_list,
            'test_cov_list': test_cov_list,
            'test_labels': test_labels,
        })

    h_dim = args.hz_para_list[:-1]
    z_dim = args.hz_para_list[-1]
    model = EndToEndCVAE(input_dim_list, h_dim, z_dim, c_dim, modalities,
                         non_linear=True, classifier_layers=args.layers,
                         dropout_rate=0.5, num_classes=2)
    config = TrainConfig(epochs=args.epochs, batch_size=256,
                         learning_rate=0.0001, combine='poe',
                         shuffle=False, seed=42)

    def loss_fn(p, batch, k):
        labels = batch['extras']['labels'][:, 0].astype(np.int32)
        fwd = model.forward(p, list(batch['x']), list(batch['c']), k,
                            train=True, mask=batch['mask'])
        losses = model.loss(
            p, list(batch['x']), fwd, labels,
            margin=args.margin,
            weight_contrastive=args.weightcontrastive,
            mask=batch['mask'],
        )
        losses['__bn_state__'] = fwd['bn_state']
        return losses['total_loss'], losses

    def state_update(p, aux):
        return {**p, 'bn_state': aux['__bn_state__']}

    n_folds = len(fold_data)
    # the reference re-seeds 42 per fold, so every fold's init is identical:
    # init once on the LOCAL CPU backend and share (bit-identical threefry;
    # remote eager init costs ~0.4s/op through the tunnel)
    init_params = common.host_init_params(model)
    params_list = [init_params for _ in range(n_folds)]
    key42 = common.host_prng_key(42)
    keys = [key42 for _ in range(n_folds)]  # reference parity

    from .common import run_folds

    mesh, mesh_shardings = common.parse_run_mesh(args, n_folds,
                                                 config.batch_size)
    common.require_checkpoint_for_resume(args)
    checkpoint_every = getattr(args, 'checkpoint_every', 0) or 0
    resume = getattr(args, 'resume', False)
    packed = getattr(args, 'packed_xla', False)
    ep_mesh = ep_shardings = None
    if getattr(args, 'ep_mesh', None):
        # expert-parallel F,M,D on the packed dual-bank layout (implies
        # --packed_xla + fold-parallel); explicit mesh requests fail loud
        sizes = common.parse_axis_sizes(
            args.ep_mesh, '--ep_mesh', (3,), '2,2,2 (fold,modality,data)')
        if mesh is not None:
            raise SystemExit('--ep_mesh is mutually exclusive with --mesh')
        cov_reason = common.uniform_covariates(
            [f['train'] for f in fold_data])
        if cov_reason:
            raise SystemExit(f'--ep_mesh unavailable ({cov_reason})')
        # shared fast gates (common.ep_mesh_divisibility — the same owner
        # the doctor preflight and train_supervised use) with the
        # dual-bank override: this trainer's EP axis is [2M], not [M]
        indivisible = common.ep_mesh_divisibility(
            sizes, n_folds, config.batch_size, modalities,
            modality_axis_len=2 * modalities,
            modality_axis_desc='dual-bank axis 2M')
        if indivisible:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {indivisible}')
        from ..parallel.modality import (
            grouped_e2e_fold_shardings,
            make_ep_mesh3,
        )

        try:
            ep_mesh = make_ep_mesh3(n_fold=sizes[0], n_modality=sizes[1],
                                    n_data=sizes[2])
        except ValueError as exc:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {exc}')
        ep_shardings = grouped_e2e_fold_shardings
        packed = True
    if packed:
        reasons = [r for r, on in [('--mesh', mesh is not None)] if on]
        if not reasons:
            cov_reason = common.uniform_covariates(
                [f['train'] for f in fold_data])
            if cov_reason:
                reasons.append(cov_reason)
        if reasons:
            print(f'--packed_xla unavailable ({"; ".join(reasons)}); '
                  'using the per-modality layout')
            packed = False
    if packed:
        from ..train.packed_endtoend import (
            GroupedEndToEndMultiTrainer,
            GroupedEndToEndTrainer,
            endtoend_state_dirname,
        )

        labels_f = [f['train_labels'].astype(np.float32) for f in fold_data]
        if ep_mesh is not None or getattr(args, 'fold_parallel', False):
            max_n = max(f['train'][0][0].shape[0] for f in fold_data)
            tr = GroupedEndToEndMultiTrainer(
                model, config, max_n, args.margin, args.weightcontrastive,
                mesh=ep_mesh, shardings_fn=ep_shardings)
            if ep_mesh is not None:
                axes = dict(zip(ep_mesh.axis_names, ep_mesh.devices.shape))
                print('train model (all folds fold-parallel, '
                      'expert-parallel packed dual-bank endtoend '
                      f'modalities, mesh {axes})')
                state_dirname = 'ep-grouped-e2e-state'
            else:
                print('train model (all folds fold-parallel, packed '
                      'dual-bank endtoend modalities)')
                state_dirname = endtoend_state_dirname()
            e2e_folds = [(f['train'][0], f['train'][1][0], lab)
                         for f, lab in zip(fold_data, labels_f)]
            if checkpoint_every:
                per_fold_params, per_fold_logs = tr.run_resumable(
                    params_list, e2e_folds, list(keys),
                    state_dir=model_dir / state_dirname,
                    checkpoint_every=checkpoint_every, resume=resume)
            else:
                per_fold_params, per_fold_logs = tr.run(
                    params_list, e2e_folds, list(keys))
        else:
            tr = GroupedEndToEndTrainer(
                model, config, fold_data[0]['train'][0][0].shape[0],
                args.margin, args.weightcontrastive)
            print('train model (packed dual-bank endtoend modalities)')
            per_fold_params, per_fold_logs = [], []
            for f_i, (f, lab) in enumerate(zip(fold_data, labels_f)):
                data_list, cov_list = f['train']
                if checkpoint_every:
                    p, lg = tr.run_resumable(
                        params_list[f_i], data_list, cov_list[0], lab,
                        keys[f_i],
                        state_dir=model_dir / endtoend_state_dirname(f_i),
                        checkpoint_every=checkpoint_every, resume=resume)
                else:
                    p, lg = tr.run(params_list[f_i], data_list,
                                   cov_list[0], lab, keys[f_i])
                per_fold_params.append(p)
                per_fold_logs.append(lg)
    else:
        print('train model')
        per_fold_params, per_fold_logs = run_folds(
            model, config, [f['train'] for f in fold_data], params_list,
            keys, getattr(args, 'fold_parallel', False), loss_fn=loss_fn,
            state_update=state_update,
            per_fold_extras=[
                {'labels': f['train_labels'].astype(np.float32)[:, None]}
                for f in fold_data
            ], mesh=mesh, shardings_fn=mesh_shardings, state_dir=model_dir,
            checkpoint_every=checkpoint_every, resume=resume)

    # ---- eval: ONE vmapped predict over the stacked fold axis (rows are
    # independent through the model; pad test rows to a common bucket) -------
    n_mod = len(fold_data[0]['test_data_list'])
    max_rows = max(f['test_data_list'][0].shape[0] for f in fold_data)
    # --mesh F,D also shards the eval program (folds over F, rows over D)
    infer_mesh = common.parse_infer_mesh(getattr(args, 'mesh', None))
    common.check_infer_fold_axis(infer_mesh, n_folds)
    tile = common.infer_row_tile(infer_mesh)
    padded_rows = -(-max_rows // tile) * tile

    def pad(a):
        a = np.asarray(a, dtype=np.float32)
        return np.pad(a, ((0, padded_rows - a.shape[0]), (0, 0)))

    stacked_params = jax.tree_util.tree_map(
        lambda *leaves: np.stack([np.asarray(l) for l in leaves]),
        *per_fold_params)
    xes = tuple(np.stack([pad(f['test_data_list'][m]) for f in fold_data])
                for m in range(n_mod))
    cs = tuple(np.stack([pad(f['test_cov_list'][m]) for f in fold_data])
               for m in range(n_mod))
    all_logits = np.asarray(common.fold_infer_jit(
        lambda p, x, c: model.predict(p, list(x), list(c)),
        infer_mesh, with_key=False)(stacked_params, xes, cs))

    common.emit_fold_artifacts(model_dir, per_fold_logs, per_fold_params, {
        'model': 'cVAE_multimodal_endtoend',
        'input_dim_list': list(map(int, input_dim_list)),
        'hidden_dim': list(h_dim), 'latent_dim': int(z_dim),
        'c_dim': int(c_dim), 'modalities': modalities,
        'classifier_layers': list(args.layers),
    }, n_folds)

    for fold in range(n_folds):
        n_rows = fold_data[fold]['test_data_list'][0].shape[0]
        preds = np.argmax(all_logits[fold, :n_rows], axis=1)
        metrics = binary_prediction_metrics(fold_data[fold]['test_labels'],
                                            preds)
        print(f'Fold {fold} metrics:')
        print(metrics)
        all_metrics.append(metrics)

    all_metrics_df = pd.DataFrame(all_metrics)
    print(all_metrics_df.mean())
    print(all_metrics_df.std())
    append_endtoend_results(project_root / 'results_endtoend.csv', args,
                            all_metrics_df)
    return all_metrics_df


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser, default_n_splits=5)
    parser.add_argument('-Learningrateclassifier', '--learning_rate_classifier',
                        dest='learning_rate_classifier', type=float,
                        default=0.001, help='Learning rate for the classifier.')
    parser.add_argument('-Margin', '--margin', dest='margin', type=float,
                        default=1, help='Margin for the contrastive loss.')
    parser.add_argument('-Weightcontrastive', '--weightcontrastive',
                        dest='weightcontrastive', type=float, default=1,
                        help='weight for the contrastive loss.')
    parser.add_argument('-Weightkl', '--weight_kl', dest='weight_kl',
                        type=float, default=1,
                        help='Weight for the kl divergence loss.')
    parser.add_argument('-Weightrec', '--weight_rec', dest='weight_rec',
                        type=float, default=1,
                        help='Weight for the reconstruction loss.')
    parser.add_argument('-Dropout', '--dropout', dest='dropout', type=float,
                        default=0.5, help='Dropout rate for the classifier.')
    parser.add_argument('-Layers', '--layers', dest='layers', nargs='+',
                        default=[128, 64, 32], type=int,
                        help='Layers for the classifier.')
    parser.add_argument('--fold_parallel', dest='fold_parallel',
                        action='store_true',
                        help='train every CV fold concurrently as one '
                             'vmapped device program.')
    parser.add_argument('--packed_xla', dest='packed_xla',
                        action='store_true',
                        help='train on the packed dual-bank layout: both '
                             'decoder banks ride one [2M] batched-einsum '
                             'modality axis, width-dependent ops run per '
                             'width group at exact width (the endtoend '
                             'model has the longest serialized matmul '
                             'chain in the zoo — packing it cuts the most '
                             'chain links)')
    parser.add_argument('--ep_mesh', dest='ep_mesh', default=None,
                        metavar='F,M,D',
                        help='expert-parallel fold x modality x data GSPMD '
                             'mesh for the packed dual-bank trainer '
                             '(implies --packed_xla and fold-parallelism; '
                             'the [2M] dual-bank decoder axis shards over '
                             "'modality', batch rows over 'data')")
    common.add_mesh_flag(parser)
    common.add_resume_flags(parser)
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    common.apply_post_parse_defaults(args, default_procedure='SE-MoE')
    # reference post-parse quirk (nmpmcont:463-470)
    if args.procedure.startswith('SingleModality'):
        if args.dataset_resourse == 'ADNI':
            args.single_modality = 'av45'
        elif args.dataset_resourse == 'HCP':
            args.single_modality = 'T1_volume'
        else:
            raise ValueError('Unknown dataset resource')
    main(args, project_root=project_root)


if __name__ == '__main__':
    run()
