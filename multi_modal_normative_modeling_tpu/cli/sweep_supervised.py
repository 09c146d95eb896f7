"""Whole-grid supervised sweep engine.

The reference's flagship sweep (commands_list11_adhd.sh:7-84) is a bash loop
re-launching train -> test -> group-analysis once per grid point: procedures
x epoch counts x (base,max) learning-rate pairs x 16 hidden shapes. Each
launch retrains from scratch on one device.

This engine runs the same grid with the compute deduplicated the TPU-first
way, producing the same per-point artifacts (per-fold checkpoints, deviation
CSVs, result_baseline blocks):

* every grid point trains all CV folds concurrently (one vmapped device
  program, parallel/folds.py);
* the epochs axis collapses: ONE training run to max(E) with snapshots taken
  at each requested E (MultiFoldTrainer.run_milestones). Chunked scans are
  bit-identical to a single scan, and an E-epoch prefix of a longer run is
  bit-identical to an E-epoch run, so every snapshot equals the standalone
  run at that epoch count (tests/test_sweep_supervised.py);
* under the reference's EFFECTIVE learning-rate behavior (SURVEY.md Q1: the
  cyclic LR assignment is a no-op on torch Adam, so every (base,max) pair
  trains at the constant 1e-4) the lr axis is computed once and the
  duplicate points are recorded as deduped in the summary. With
  --lr_schedule cyclic the pairs genuinely differ and each is trained;
* fold-id files and per-fold data prep are shared across all grid points of
  a procedure (the CSV cache already dedupes reads across procedures).

Summary: outputs/sweep_supervised_results.json, one record per grid point.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .. import registry
from ..data.loading import generate_kfold_ids
from ..parallel import MultiFoldTrainer, stack_fold_batches, stack_params
from ..parallel.folds import unstack_params
from ..train import TrainConfig
from ..utils.logging import RunLog
from . import common, group_analysis, test_supervised


def parse_hz_grid(spec: str):
    """'110 110 10;1024 512 256 32;20 10' -> [[110,110,10], ...]."""
    shapes = []
    for part in spec.split(';'):
        part = part.strip()
        if part:
            shapes.append([int(tok) for tok in part.replace(',', ' ').split()])
    if not shapes:
        raise ValueError(f'empty hz grid: {spec!r}')
    return shapes


def parse_lr_grid(spec: str):
    """'1e-4:5e-3,1e-5:5e-4' -> [(1e-4, 5e-3), (1e-5, 5e-4)]."""
    pairs = []
    for part in spec.split(','):
        part = part.strip()
        if part:
            base, _, mx = part.partition(':')
            pairs.append((float(base), float(mx or base)))
    if not pairs:
        raise ValueError(f'empty lr grid: {spec!r}')
    return pairs


def _point_args(args, procedure: str, hz, epochs: int, base_lr: float,
                max_lr: float) -> argparse.Namespace:
    """Full per-grid-point namespace (what one reference launch would parse);
    feeds the test/analysis stages and the result_baseline block headers."""
    if getattr(args, 'combine', None):
        combine = args.combine
    else:
        combine = procedure.split('-')[1] if '-' in procedure else procedure
    return argparse.Namespace(
        dataset_resourse=args.dataset_resourse,
        hz_para_list=list(hz),
        procedure=procedure,
        combine=combine,
        epochs=int(epochs),
        n_splits=args.n_splits,
        oversample_percentage=args.oversample_percentage,
        model=args.model,
        single_modality=None,
        base_learning_rate=base_lr,
        max_learning_rate=max_lr,
        training_class=args.training_class,
        lr_schedule=args.lr_schedule,
        precision=getattr(args, 'precision', 'fp32'),
        in_memory_fusion=getattr(args, 'in_memory_fusion', False),
        emit_latent=False,
        fused_inference=False,
        threshold_method='roc',
    )


def main(args, project_root=None):
    import os
    import time
    from collections import Counter
    from contextlib import contextmanager

    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep

    # MMNM_SWEEP_TIMING=1 prints cumulative wall-clock per sweep phase at the
    # end (observability: the tunnel makes device/compile time hard to
    # attribute from outside)
    timing = os.environ.get('MMNM_SWEEP_TIMING')
    phases = Counter()
    t_start = time.perf_counter()

    @contextmanager
    def phase(label):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            phases[label] += time.perf_counter() - t0

    def timed_iter(gen, label):
        """Attribute the generator's own (next-call) time to ``label``."""
        while True:
            t0 = time.perf_counter()
            try:
                item = next(gen)
            except StopIteration:
                return
            finally:
                phases[label] += time.perf_counter() - t0
            yield item

    project_root = Path(project_root) if project_root else Path.cwd()
    model_name = 'supervised_cvae'

    output_dir = project_root / 'outputs'
    output_dir.mkdir(exist_ok=True)
    kfold_dir = output_dir / 'kfold_analysis'
    kfold_dir.mkdir(exist_ok=True)
    model_dir = kfold_dir / model_name
    model_dir.mkdir(exist_ok=True)

    procedures = args.procedures
    epochs_list = sorted(set(int(e) for e in args.epochs_list))
    if epochs_list[0] < 1:
        raise ValueError(f'epoch counts must be >= 1: {args.epochs_list}')
    hz_grid = parse_hz_grid(args.hz_grid)
    lr_grid = parse_lr_grid(args.lr_grid)
    max_epochs = epochs_list[-1]

    if args.lr_schedule == 'cyclic':
        lr_points, lr_deduped = lr_grid, []
    else:
        # SURVEY.md Q1: constant effective LR — every (base,max) pair trains
        # identically; compute the first, record the rest as deduped.
        lr_points, lr_deduped = lr_grid[:1], lr_grid[1:]

    n_points = (len(procedures) * len(hz_grid) * len(epochs_list)
                * len(lr_grid))
    n_runs = len(procedures) * len(hz_grid) * len(lr_points)
    print(f'sweep grid: {len(procedures)} procedures x {len(hz_grid)} shapes'
          f' x {len(epochs_list)} epoch counts x {len(lr_grid)} lr pairs '
          f'= {n_points} points -> {n_runs} training runs '
          f'(fold-parallel, epoch milestones'
          f'{", lr axis deduped" if lr_deduped else ""})')

    run_log = RunLog(model_dir / 'run_log.jsonl')
    run_log.event('sweep_start', points=n_points, runs=n_runs,
                  args={k: v for k, v in vars(args).items()})

    np.random.seed(42)

    # fold-id files depend only on (resource, training_class, K, oversample)
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'
    ids_df = pd.read_csv(participants_path)
    hc_label = registry.get_hc_label(args.dataset_resourse)
    training_label = hc_label if args.training_class == 'nm' else 0
    training_class_group = ids_df[ids_df['DIA'] == training_label]
    other_group = ids_df[ids_df['DIA'] != training_label]
    generate_kfold_ids(training_class_group, other_group,
                       oversample_percentage=args.oversample_percentage,
                       n_splits=args.n_splits, project_root=project_root)

    records = []
    n_folds = args.n_splits
    # --mesh F,D[,M]: every grid point's fold-parallel program shards over
    # the same device mesh (the MultiFoldTrainer per point inherits it)
    mesh, mesh_shardings = common.parse_mesh(getattr(args, 'mesh', None),
                                             n_folds=n_folds, batch_size=256)
    if mesh is not None:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        print(f'sweep training programs run over a {axes} device mesh')
    # --ep_mesh F,M,D: every grid point trains on the PACKED layout over a
    # ('fold','modality','data') mesh — GSPMD shards the per-modality
    # encoder/decoder stacks (expert-parallel) on top of fold-parallelism,
    # exactly the train CLI's 3-axis form (cli/train_supervised.py). The
    # PPMI-class wide-feature grids are where the modality axis pays:
    # per-device FLOPs/params drop by the axis size while only latent-sized
    # fusion all-reduces cross the interconnect (parallel/modality.py:17-22).
    if getattr(args, 'packed_xla', False):
        conflicts = [n for n, on in [('--mesh', mesh is not None),
                                     ('--ep_mesh',
                                      bool(getattr(args, 'ep_mesh', None)))]
                     if on]
        if conflicts:
            raise SystemExit('--packed_xla is mutually exclusive with '
                             + ', '.join(conflicts))
        print('sweep training runs on the packed-modality layout '
              '(--packed_xla)')
    ep_mesh = None
    if getattr(args, 'ep_mesh', None):
        if mesh is not None:
            raise SystemExit('--ep_mesh is mutually exclusive with --mesh')
        ep_sizes = common.parse_axis_sizes(
            args.ep_mesh, '--ep_mesh', (3,), '2,2,2 (fold,modality,data)')
        from ..parallel.modality import make_ep_mesh3

        try:
            ep_mesh = make_ep_mesh3(n_fold=ep_sizes[0],
                                    n_modality=ep_sizes[1],
                                    n_data=ep_sizes[2])
        except ValueError as exc:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {exc}')
        axes = dict(zip(ep_mesh.axis_names, ep_mesh.devices.shape))
        print(f'sweep training programs run expert-parallel over a {axes} '
              f'device mesh')
    for procedure in procedures:
        dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                                   procedure)
        if ep_mesh is not None:
            indivisible = common.ep_mesh_divisibility(
                ep_sizes, n_folds, 256, len(dataset_names))
            if indivisible:
                raise SystemExit(
                    f'--ep_mesh {args.ep_mesh} ({procedure}): {indivisible}')
        prep_args = _point_args(args, procedure, hz_grid[0], max_epochs,
                                *lr_grid[0])
        with phase('prep (host fold x modality)'):
            folds, input_dim_list, c_dim = common.prepare_folds(
                prep_args, project_root, kfold_dir, model_dir, dataset_names,
                participants_path)
            max_n = max(f[0][0].shape[0] for f in folds)
            # with a mesh, keep batches on the host: jit's in_shardings
            # place the shards (an eager device_put would commit them to
            # one device first). The --ep_mesh and --packed_xla paths
            # train exclusively on their packed batches below —
            # building/uploading the per-modality stack too would double
            # host->HBM traffic and residency.
            batches = None
            if ep_mesh is None and not getattr(args, 'packed_xla', False):
                batches = stack_fold_batches(
                    [f[0] for f in folds], [f[1] for f in folds], 256)
                if mesh is None:
                    batches = jax.device_put(batches)
        if ep_mesh is not None or getattr(args, 'packed_xla', False):
            # the packed layouts feed ONE covariate block to every modality
            # — only equivalent when the per-modality blocks are identical
            # (same gate as the train CLI's --ep_mesh path: never assume
            # it silently)
            flag = '--ep_mesh' if ep_mesh is not None else '--packed_xla'
            cov_reason = common.uniform_covariates(folds)
            if cov_reason:
                raise SystemExit(
                    f'{flag} unavailable ({procedure}): {cov_reason}')
        ep_batches = None  # packed+placed once per procedure, reused per point
        pk_batches = None  # --packed_xla layout batches, ditto

        for hz in hz_grid:
            for base_lr, max_lr in lr_points:
                pa = _point_args(args, procedure, hz, max_epochs,
                                 base_lr, max_lr)
                config_dict = common.model_config_dict(
                    pa, input_dim_list, c_dim, len(dataset_names))
                model = common.build_model_from_config(config_dict)
                train_config = TrainConfig(
                    epochs=max_epochs, batch_size=256, learning_rate=1e-4,
                    combine=pa.combine, lr_schedule=args.lr_schedule,
                    base_lr=base_lr, max_lr=max_lr, shuffle=False, seed=42,
                    precision=pa.precision,
                    fused_heads=not getattr(args, 'no_fused_heads', False),
                )
                # same per-fold seeding as the standalone trainer
                # (reference re-seeds 42 per fold, train:119): identical
                # inits, computed once on the local CPU backend
                init_params = common.host_init_params(model)
                if ep_mesh is not None:
                    from ..parallel.modality import packed_fold_shardings
                    from ..train.packed import (
                        PackedMultiFoldTrainer,
                        packed_supported,
                    )

                    ok, reason = packed_supported(model, train_config)
                    if not ok:
                        raise SystemExit(
                            f'--ep_mesh unavailable ({reason})')
                    ep_mft = PackedMultiFoldTrainer(
                        model, train_config, max_n, mesh=ep_mesh,
                        shardings_fn=packed_fold_shardings)
                    if ep_batches is None:
                        # packed layout depends only on (folds, batch,
                        # input dims) — build + mesh-place once per
                        # procedure, not per grid point
                        ep_batches = ep_mft.prepare_batches(folds)
                    milestone_stream = ep_mft.run_milestones(
                        [init_params] * n_folds, folds,
                        [common.host_prng_key(42)] * n_folds, epochs_list,
                        packed_batches=ep_batches)
                elif getattr(args, 'packed_xla', False):
                    # packed-modality fold-parallel grid points (mixed-width
                    # cvae -> the pad-free grouped layout, RESULTS round-4;
                    # otherwise the padded stacked layout) — same milestone
                    # engine, batches packed+placed once per procedure
                    from ..train.grouped import select_packed_trainer
                    from ..train.packed import packed_supported

                    ok, reason = packed_supported(model, train_config)
                    if not ok:
                        raise SystemExit(f'--packed_xla unavailable '
                                         f'({reason})')
                    pk_cls, _, _ = select_packed_trainer(
                        model, fold_parallel=True)
                    pk_mft = pk_cls(model, train_config, max_n)
                    if pk_batches is None:
                        pk_batches = pk_mft.prepare_batches(folds)
                    milestone_stream = pk_mft.run_milestones(
                        [init_params] * n_folds, folds,
                        [common.host_prng_key(42)] * n_folds, epochs_list,
                        packed_batches=pk_batches)
                else:
                    stacked = stack_params([init_params] * n_folds)
                    keys = jnp.stack([common.host_prng_key(42)] * n_folds)
                    mft = MultiFoldTrainer(model, train_config, max_n,
                                           mesh=mesh,
                                           shardings_fn=mesh_shardings)
                    milestone_stream = (
                        (epochs,
                         unstack_params(host_params, n_folds),
                         [{k: v[f] for k, v in logs.items()}
                          for f in range(n_folds)])
                        for epochs, host_params, logs in mft.run_milestones(
                            stacked, batches, keys, epochs_list))

                for epochs, per_fold, fold_logs in timed_iter(
                        milestone_stream,
                        'train (compile + device + fetch)'):
                    point = _point_args(args, procedure, hz, epochs,
                                        base_lr, max_lr)
                    with phase('artifacts (plots + checkpoints)'):
                        # checkpoints every milestone (the test stage reads
                        # them); loss-curve PNGs only at the run's last
                        # milestone — intermediate ones are overwritten
                        # before any consumer reads them (exactly like the
                        # reference loop's transient per-point plots), and
                        # matplotlib rendering is GIL-bound so it doesn't
                        # thread away
                        final = epochs == epochs_list[-1]
                        common.emit_fold_artifacts(
                            model_dir, fold_logs if final else None,
                            per_fold, config_dict, n_folds, plot=final)
                    with phase('test stage'):
                        test_supervised.main(point, project_root=project_root)
                    with phase('group analysis'):
                        stats = group_analysis.main(
                            point, project_root=project_root)
                    stats = {k: [float(x) for x in v]
                             for k, v in stats.items()}
                    rec = dict(procedure=procedure, hz_para_list=list(hz),
                               epochs=epochs, base_learning_rate=base_lr,
                               max_learning_rate=max_lr, stats=stats)
                    records.append(rec)
                    run_log.event('point_done', **rec)
                    print(f'[sweep] {procedure} hz={hz} E={epochs} '
                          f'lr=({base_lr:g},{max_lr:g}) '
                          f'auc={stats["auc"]}')
                    for dbase, dmax in lr_deduped:
                        records.append(dict(
                            procedure=procedure, hz_para_list=list(hz),
                            epochs=epochs, base_learning_rate=dbase,
                            max_learning_rate=dmax, stats=stats,
                            deduped_from=dict(base_learning_rate=base_lr,
                                              max_learning_rate=max_lr),
                        ))
                if lr_deduped:
                    print(f'[sweep] {procedure} hz={hz}: '
                          f'{len(lr_deduped)} lr pairs deduped (constant '
                          f'effective LR — SURVEY.md Q1); pass '
                          f'--lr_schedule cyclic to train them')

    summary_path = output_dir / 'sweep_supervised_results.json'
    summary_path.write_text(json.dumps(records, indent=1))
    run_log.event('sweep_end', points=len(records), summary=str(summary_path))
    print(f'sweep summary: {summary_path} ({len(records)} grid points)')
    if timing:
        from ..utils import jaxconfig

        total = time.perf_counter() - t_start
        accounted = sum(phases.values())
        for label, secs in phases.most_common():
            print(f'[sweep timing] {label}: {secs:.1f}s')
        print(f'[sweep timing] other (model build/init/glue): '
              f'{total - accounted:.1f}s')
        if jaxconfig.attach_seconds is not None:
            print(f'[sweep timing] (one-time session attach, overlapped; '
                  f'residual waits land in the first blocking phase: '
                  f'{jaxconfig.attach_seconds:.1f}s)')
        print(f'[sweep timing] total: {total:.1f}s')
    return records


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    parser.add_argument('-R', '--dataset_resourse', dest='dataset_resourse',
                        default='ADNI', type=str)
    parser.add_argument('-K', '--n_splits', dest='n_splits', type=int,
                        default=10)
    parser.add_argument('-O', '--oversample_percentage',
                        dest='oversample_percentage', type=float, default=1)
    parser.add_argument('-Model', '--model', dest='model',
                        default='cVAE_multimodal', type=str)
    parser.add_argument('-TrainingClass', '--training_class',
                        dest='training_class', default='nm', type=str)
    parser.add_argument('-C', '--combine', dest='combine', default=None,
                        type=str,
                        help='override the per-procedure fusion (defaults to '
                             'procedure.split("-")[1], the reference rule).')
    parser.add_argument('--procedures', dest='procedures', nargs='+',
                        default=['UCA-gPoE'],
                        help='procedure grid axis (e.g. SM-sMRI SM-fMRI '
                             'SE-MoE SE-PoE SE-gPoE).')
    parser.add_argument('--epochs_list', dest='epochs_list', nargs='+',
                        type=int, default=[200],
                        help='epoch-count grid axis; collapsed into one '
                             'training run to max(E) with snapshots.')
    parser.add_argument('--hz_grid', dest='hz_grid',
                        default='110 110 10',
                        help="semicolon-separated hidden shapes, e.g. "
                             "'110 110 10;1024 512 256 32;20 10'.")
    parser.add_argument('--lr_grid', dest='lr_grid', default='1e-4:5e-3',
                        help="comma-separated base:max pairs, e.g. "
                             "'1e-5:5e-5,1e-4:5e-3'. Deduped unless "
                             "--lr_schedule cyclic (SURVEY.md Q1).")
    parser.add_argument('--lr_schedule', dest='lr_schedule',
                        default='constant', choices=['constant', 'cyclic'])
    parser.add_argument('--precision', dest='precision', default='fp32',
                        choices=['fp32', 'bf16'])
    parser.add_argument('--mesh', dest='mesh', default=None, metavar='F,D',
                        help='shard every grid point\'s fold-parallel '
                             'program over a device mesh: F,D (folds x '
                             'data-parallel) or F,D,M (+ tensor-parallel '
                             'model axis); product must equal the visible '
                             'device count')
    parser.add_argument('--ep_mesh', dest='ep_mesh', default=None,
                        metavar='F,M,D',
                        help='train every grid point expert-parallel on the '
                             'packed layout over a (fold, modality, data) '
                             'device mesh (GSPMD places the fusion '
                             'all-reduces); mutually exclusive with --mesh')
    parser.add_argument('--packed_xla', dest='packed_xla',
                        action='store_true',
                        help='train every grid point on the packed-modality '
                             'fold-parallel layout (mixed-width cvae-skeleton '
                             'cohorts ride the pad-free width-grouped '
                             'layout — measured +72%% over per-modality at '
                             'flagship shapes, RESULTS round-4). Mutually '
                             'exclusive with --mesh/--ep_mesh.')
    parser.add_argument('--no_fused_heads', dest='no_fused_heads',
                        action='store_true',
                        help='disable the default merged mu/logvar encoder '
                             'heads for every grid point (numeric '
                             'consistency with --no_fused_heads '
                             'standalone runs)')
    parser.add_argument('--in_memory_fusion', dest='in_memory_fusion',
                        action='store_true')
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    return main(args, project_root=project_root)


if __name__ == '__main__':
    run()
