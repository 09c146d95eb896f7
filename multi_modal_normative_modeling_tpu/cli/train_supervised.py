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
import jax.numpy as jnp
import numpy as np
import pandas as pd

from .. import registry
from ..data.loading import generate_kfold_ids
from ..train import FoldTrainer, TrainConfig
from ..utils.logging import RunLog
from . import common


def main(args, project_root=None):
    import os
    import time

    # MMNM_TRAIN_TIMING=1 prints wall-clock per stage phase (observability;
    # the tunnel makes device phases hard to attribute from outside)
    from ..utils.jaxconfig import warm_device_session

    if getattr(args, 'mesh', None) and not getattr(args, 'fold_parallel',
                                                   False) \
            and not getattr(args, 'stream_shards', 0):
        raise SystemExit('--mesh requires --fold_parallel (the mesh shards '
                         'the stacked fold-parallel program) — except with '
                         '--stream_shards, where --mesh 1,D shards each '
                         'streamed shard\'s rows over the data axis')

    warm_device_session()  # attach the remote device session during host prep

    timing = os.environ.get('MMNM_TRAIN_TIMING')
    marks = [time.perf_counter()]

    def mark(label):
        if timing:
            marks.append(time.perf_counter())
            print(f'[train timing] {label}: {marks[-1] - marks[-2]:.2f}s')

    project_root = Path(project_root) if project_root else Path.cwd()
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

    run_log = RunLog(model_dir / 'run_log.jsonl')
    run_log.event('train_start', args=vars(args))

    # ---- per-fold data prep (host side, threaded over fold x modality;
    # --in_memory_fusion builds the UCA early-fusion modality from the scaled
    # base blocks instead of its CSV — identical up to the round-trip ulp) ---
    n_folds = args.n_splits
    folds, input_dim_list, c_dim = common.prepare_folds(
        args, project_root, kfold_dir, model_dir, dataset_names,
        participants_path)
    config_dict = common.model_config_dict(args, input_dim_list, c_dim,
                                           modalities)
    mark('host prep (fold x modality, threaded)')

    model = common.build_model_from_config(config_dict)
    batch_size = getattr(args, 'batch_size', None)
    batch_size = 256 if batch_size is None else int(batch_size)
    if batch_size < 1:
        raise SystemExit(f'--batch_size must be >= 1, got {batch_size}')
    train_config = TrainConfig(
        epochs=args.epochs,
        batch_size=batch_size,
        learning_rate=0.0001,
        combine=args.combine,
        lr_schedule=lr_schedule,
        base_lr=args.base_learning_rate,
        max_lr=args.max_learning_rate,
        shuffle=False,
        seed=42,
        precision=getattr(args, 'precision', 'fp32'),
        remat=getattr(args, 'remat', False),
        fused_heads=not getattr(args, 'no_fused_heads', False),
    )
    # The reference re-seeds 42 per fold (train:119), so every fold's init is
    # IDENTICAL — init once on the LOCAL CPU backend (bit-identical threefry;
    # remote eager init costs ~0.4s/op through the tunnel) and share the
    # pytree (no trainer donates these buffers; stack_params copies).
    init_params = common.host_init_params(model)
    params_list = [init_params for _ in range(n_folds)]
    key42 = common.host_prng_key(42)
    keys = [key42 for _ in range(n_folds)]  # reference parity
    mark('model build + param init')

    fold_parallel = getattr(args, 'fold_parallel', False)
    checkpoint_every = getattr(args, 'checkpoint_every', 0) or 0
    resume = getattr(args, 'resume', False)
    common.require_checkpoint_for_resume(args)
    mesh, mesh_shardings = common.parse_mesh(getattr(args, 'mesh', None),
                                             n_folds,
                                             train_config.batch_size)

    def covariates_uniform():
        # the packed/fused layouts feed ONE covariate block to every
        # modality (common.uniform_covariates has the full rationale)
        return common.uniform_covariates(folds) is None

    fused_trainer = None
    if getattr(args, 'remat', False) and (
            getattr(args, 'fused_train_step', False)
            or getattr(args, 'packed_xla', False)
            or getattr(args, 'ep_mesh', None)):
        print('--remat applies to the standard XLA loss; ignoring it for '
              '--fused_train_step/--packed_xla/--ep_mesh')
    if mesh is not None and (getattr(args, 'fused_train_step', False)
                             or getattr(args, 'packed_xla', False)):
        print('--mesh runs on the standard fold-parallel path; ignoring '
              '--fused_train_step/--packed_xla')
        args.fused_train_step = False
        args.packed_xla = False
    if getattr(args, 'fused_train_step', False) and getattr(
            args, 'warmup_only', False):
        print('fused train step unavailable (--warmup_only runs on the XLA '
              'path); using the XLA path')
    elif getattr(args, 'fused_train_step', False):
        # fully-fused Pallas fwd+bwd train step (kernels/train_step.py), with
        # automatic fallback to the XLA path when shapes/config are out of the
        # kernel's scope or Mosaic cannot compile it on this core
        from ..train.fused import FusedFoldTrainer, supported

        ok, reason = supported(model, train_config,
                               train_config.batch_size, fold_parallel)
        if ok and not covariates_uniform():
            ok, reason = False, ('per-modality covariates differ across '
                                 'modalities (fused layout shares one block)')
        if ok:
            fused_trainer = FusedFoldTrainer(
                model, train_config, folds[0][0][0].shape[0])
            print('train model (fused Pallas train-step kernel)')
        else:
            print(f'fused train step unavailable ({reason}); '
                  'using the XLA path')

    ep_trainer = None
    ep_pmft = None
    ep_mesh = None
    if getattr(args, 'ep_mesh', None):
        # expert-parallel: packed modality axis sharded over devices —
        # M,D schedules the fusion psums by hand (shard_map,
        # parallel/modality.py), F,M,D runs all folds fold-parallel with
        # GSPMD placing the same collectives. An explicit mesh request
        # fails loud (parse_mesh-style) instead of falling back.
        sizes = common.parse_axis_sizes(
            args.ep_mesh, '--ep_mesh', (2, 3),
            '4,2 (modality,data) or 2,2,2 (fold,modality,data)')
        conflicts = [name for name, on in [
            ('--mesh', mesh is not None),
            ('--fold_parallel', fold_parallel and len(sizes) == 2),
            ('--packed_xla', getattr(args, 'packed_xla', False)),
            ('--fused_train_step', getattr(args, 'fused_train_step', False)),
        ] if on]
        if conflicts:
            raise SystemExit('--ep_mesh is mutually exclusive with '
                             + ', '.join(conflicts))
        from ..train.packed import packed_supported

        ok, reason = packed_supported(model, train_config)
        if ok and not covariates_uniform():
            ok, reason = False, ('per-modality covariates differ across '
                                 'modalities (packed layout shares one block)')
        if not ok:
            raise SystemExit(f'--ep_mesh unavailable ({reason})')
        indivisible = common.ep_mesh_divisibility(
            sizes, n_folds, train_config.batch_size, model.modalities)
        if indivisible:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {indivisible}')
        if getattr(model, 'variant', None) not in ('cvae', 'mmjsd',
                                                   'mvtcae', 'nmmlp'):
            # packed_supported also admits the DMVAE family (round 5), but
            # its split-latent layout has no EP sharding story
            raise SystemExit('--ep_mesh supports the cvae skeleton only '
                             '(cvae/mmjsd/mvtcae/nmmlp)')
        ep_grouped = False
        try:
            if len(sizes) == 3:
                from ..parallel.modality import (
                    grouped_fold_shardings,
                    make_ep_mesh3,
                    packed_fold_shardings,
                )
                from ..train.grouped import (
                    GroupedMultiFoldTrainer,
                    grouped_routing,
                )
                from ..train.packed import PackedMultiFoldTrainer

                ep_mesh = make_ep_mesh3(n_fold=sizes[0], n_modality=sizes[1],
                                        n_data=sizes[2])
                max_n = max(f[0][0].shape[0] for f in folds)
                ep_grouped = grouped_routing(model)
                if ep_grouped:
                    # round 5: EP composed with the pad-free layout —
                    # divisible width groups shard over 'modality', ragged
                    # groups replicate (parallel/modality.py
                    # grouped_fold_shardings)
                    ep_pmft = GroupedMultiFoldTrainer(
                        model, train_config, max_n, mesh=ep_mesh,
                        shardings_fn=grouped_fold_shardings)
                else:
                    ep_pmft = PackedMultiFoldTrainer(
                        model, train_config, max_n, mesh=ep_mesh,
                        shardings_fn=packed_fold_shardings)
            else:
                from ..parallel.modality import EPFoldTrainer, make_ep_mesh

                ep_mesh = make_ep_mesh(n_modality=sizes[0], n_data=sizes[1])
                ep_trainer = EPFoldTrainer(model, train_config,
                                           folds[0][0][0].shape[0], ep_mesh)
        except ValueError as exc:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {exc}')

    packed_xla = False
    if getattr(args, 'packed_xla', False) and fused_trainer is None:
        # packed-modality XLA path: each layer is one batched einsum over
        # all modalities (~22% faster per step single-fold; RESULTS.md)
        from ..train.packed import packed_supported

        packed_xla, reason = packed_supported(model, train_config)
        if packed_xla and not covariates_uniform():
            packed_xla, reason = False, (
                'per-modality covariates differ across modalities '
                '(packed layout shares one block)')
        if not packed_xla:
            print(f'packed XLA path unavailable ({reason}); '
                  'using the per-modality path')

    fd_loss = None
    if getattr(args, 'fused_decoder', False):
        # fused decoder-head + NLL Pallas op (kernels/decoder_nll.py): the
        # wide-regime partial fusion — works under the plain and
        # fold-parallel trainers (pallas batches through vmap); the other
        # specialized paths have their own kernels/shardings
        conflicts = [name for name, on in [
            ('--mesh', mesh is not None),
            ('--packed_xla', packed_xla),
            ('--fused_train_step', fused_trainer is not None),
            ('--ep_mesh', getattr(args, 'ep_mesh', None) is not None
             and bool(getattr(args, 'ep_mesh', None))),
        ] if on]
        if conflicts:
            print('fused decoder unavailable (mutually exclusive with '
                  + ', '.join(conflicts) + '); using the plain loss')
        elif getattr(model, 'variant', None) != 'cvae' \
                or train_config.precision != 'fp32':
            print('fused decoder unavailable (cvae variant, fp32 only); '
                  'using the plain loss')
        else:
            from ..kernels.decoder_nll import fused_decoder_loss_fn

            if getattr(args, 'remat', False):
                print('--remat applies to the standard XLA loss; ignoring '
                      'it for --fused_decoder')
            fd_loss = fused_decoder_loss_fn(model, train_config)
            print('train model (fused decoder+NLL Pallas op)')

    stream_mesh = None
    if getattr(args, 'stream_shards', 0):
        stream_conflicts = [name for name, on in [
            ('--fold_parallel', fold_parallel),
            ('--packed_xla', packed_xla),
            ('--fused_train_step', fused_trainer is not None),
            ('--ep_mesh', bool(getattr(args, 'ep_mesh', None))),
        ] if on]
        if stream_conflicts:
            raise SystemExit('--stream_shards is mutually exclusive with '
                             + ', '.join(stream_conflicts)
                             + ' (out-of-core streaming is a sequential '
                               'whole-fold path)')
        if mesh is not None:
            # --mesh 1,D composes: rows of each streamed shard shard over
            # 'data' (train/streaming.py). Fold/model axes need the
            # resident fold-parallel path.
            bad = [n for n in mesh.axis_names
                   if n != 'data' and mesh.shape[n] != 1]
            if bad:
                raise SystemExit(
                    f'--stream_shards composes only with --mesh 1,D '
                    f'(data-axis sharding); axis {bad[0]!r} has size '
                    f'{mesh.shape[bad[0]]} — use --fold_parallel --mesh '
                    'for fold/tensor parallelism')
            stream_mesh = mesh

    if fused_trainer is not None:
        per_fold_params, per_fold_logs = [], []
        for fold, (data_list, cov_list) in enumerate(folds):
            try:
                if checkpoint_every:
                    # fused state is the padded PACKED pytree — a different
                    # format (and a numerically distinct trajectory) from
                    # the XLA path's, so it gets its own state dir
                    params, logs = fused_trainer.run_resumable(
                        params_list[fold], data_list, cov_list[0],
                        keys[fold],
                        state_dir=model_dir / f'{fold:03d}-fused-state',
                        checkpoint_every=checkpoint_every, resume=resume)
                else:
                    params, logs = fused_trainer.run(
                        params_list[fold], data_list, cov_list[0],
                        key=keys[fold])
            except Exception as exc:  # Mosaic compile/alloc failure
                if checkpoint_every:
                    # NEVER silently fall back on the resumable path: the
                    # XLA trajectory differs, and a restore error (torn
                    # state, architecture mismatch) must surface instead of
                    # a from-scratch retrain that discards the checkpointed
                    # progress the user asked to resume
                    raise
                print(f'fused train step failed to compile ({exc!r}); '
                      'falling back to the XLA path')
                fused_trainer = None
                break
            per_fold_params.append(params)
            per_fold_logs.append(logs)

    if ep_pmft is not None:
        axes = dict(zip(ep_mesh.axis_names, ep_mesh.devices.shape))
        if getattr(args, 'warmup_only', False):
            secs = ep_pmft.compile(params_list, folds, keys)
            print(f'warmup: fold-parallel expert-parallel train program '
                  f'compiled in {secs:.1f}s (persistent cache populated)')
            run_log.event('warmup_done', seconds=secs)
            return
        layout = 'width-grouped ' if ep_grouped else ''
        print(f'train model (all folds fold-parallel, expert-parallel '
              f'{layout}modalities, mesh {axes})')
        if checkpoint_every:
            # GSPMD EP state is the stacked packed-layout pytree on its own
            # dir (the mesh reorders partial sums, so its trajectory is not
            # the unmeshed packed-state's bit-for-bit; the grouped layout's
            # pytree differs structurally, hence its own name)
            if ep_grouped and resume:
                # round-5 routing migration: this mixed-width cohort's EP
                # run previously wrote the padded layout's state
                from ..train.grouped import notice_stale_padded_state

                notice_stale_padded_state(
                    model_dir, 'grouped',
                    stale_dirname='ep-packed-state',
                    new_dirname='ep-grouped-state')
            per_fold_params, per_fold_logs = ep_pmft.run_resumable(
                params_list, folds, keys,
                state_dir=model_dir / ('ep-grouped-state' if ep_grouped
                                       else 'ep-packed-state'),
                checkpoint_every=checkpoint_every, resume=resume)
        else:
            per_fold_params, per_fold_logs = ep_pmft.run(params_list, folds,
                                                         keys)
    elif ep_trainer is not None:
        if getattr(args, 'warmup_only', False):
            data_list, cov_list = folds[0]
            secs = ep_trainer.compile(params_list[0], data_list, cov_list[0],
                                      key=keys[0])
            print(f'warmup: expert-parallel train program compiled in '
                  f'{secs:.1f}s (persistent cache populated)')
            run_log.event('warmup_done', seconds=secs)
            return
        axes = dict(zip(ep_mesh.axis_names, ep_mesh.devices.shape))
        print(f'train model (expert-parallel modalities, mesh {axes})')
        per_fold_params, per_fold_logs = [], []
        for fold, (data_list, cov_list) in enumerate(folds):
            if checkpoint_every:
                # EP state is the PACKED pytree (its own dir, like packed)
                params, logs = ep_trainer.run_resumable(
                    params_list[fold], data_list, cov_list[0], keys[fold],
                    state_dir=model_dir / f'{fold:03d}-ep-state',
                    checkpoint_every=checkpoint_every, resume=resume)
            else:
                params, logs = ep_trainer.run(params_list[fold], data_list,
                                              cov_list[0], key=keys[fold])
            per_fold_params.append(params)
            per_fold_logs.append(logs)
    elif fused_trainer is None and packed_xla and fold_parallel:
        # mixed-width cvae-skeleton cohorts ride the pad-free width-grouped layout
        # (measured +72% over per-modality at flagship 5-fold vs the
        # padded layout's +23% — RESULTS.md round-4); uniform widths /
        # non-cvae skeleton variants keep the padded stacked layout
        # (identical math there). Routing owner: train/grouped.py.
        from ..train.grouped import (
            notice_stale_padded_state,
            packed_state_dirname,
            select_packed_trainer,
        )

        cls, layout, grouped = select_packed_trainer(model,
                                                     fold_parallel=True)
        max_n = max(f[0][0].shape[0] for f in folds)
        pmft = cls(model, train_config, max_n)
        if getattr(args, 'warmup_only', False):
            secs = pmft.compile(params_list, folds, keys)
            print(f'warmup: {layout} fold-parallel train program compiled '
                  f'in {secs:.1f}s (persistent cache populated)')
            run_log.event('warmup_done', seconds=secs)
            return
        print(f'train model (all folds fold-parallel, {layout} modalities)')
        if checkpoint_every:
            # packed/grouped states are stacked layout-specific pytrees —
            # each layout gets its own state dir
            if resume:
                notice_stale_padded_state(model_dir, grouped)
            per_fold_params, per_fold_logs = pmft.run_resumable(
                params_list, folds, keys,
                state_dir=model_dir / packed_state_dirname(grouped),
                checkpoint_every=checkpoint_every, resume=resume)
        else:
            per_fold_params, per_fold_logs = pmft.run(params_list, folds,
                                                      keys)
    elif fused_trainer is None and packed_xla:
        from ..train.grouped import (
            notice_stale_padded_state,
            packed_state_dirname,
            select_packed_trainer,
        )

        cls, layout, grouped = select_packed_trainer(model,
                                                     fold_parallel=False)
        ptr = cls(model, train_config, folds[0][0][0].shape[0])
        if getattr(args, 'warmup_only', False):
            data_list, cov_list = folds[0]
            secs = ptr.compile(params_list[0], data_list, cov_list[0],
                               key=keys[0])
            print(f'warmup: {layout} train program compiled in '
                  f'{secs:.1f}s (persistent cache populated)')
            run_log.event('warmup_done', seconds=secs)
            return
        print(f'train model ({layout} modalities)')
        per_fold_params, per_fold_logs = [], []
        for fold, (data_list, cov_list) in enumerate(folds):
            if checkpoint_every:
                if resume:
                    notice_stale_padded_state(model_dir, grouped, fold)
                params, logs = ptr.run_resumable(
                    params_list[fold], data_list, cov_list[0], keys[fold],
                    state_dir=model_dir / packed_state_dirname(grouped,
                                                               fold),
                    checkpoint_every=checkpoint_every, resume=resume)
            else:
                params, logs = ptr.run(params_list[fold], data_list,
                                       cov_list[0], key=keys[fold])
            per_fold_params.append(params)
            per_fold_logs.append(logs)
    elif fused_trainer is None and fold_parallel:
        # all folds train concurrently: stacked params, one vmapped program
        from ..parallel import (
            MultiFoldTrainer,
            stack_fold_batches,
            stack_params,
        )
        from ..parallel.folds import unstack_params

        if mesh is not None:
            axes = dict(zip(mesh.axis_names, mesh.devices.shape))
            print(f'train model (all folds fold-parallel, mesh {axes})')
        else:
            print('train model (all folds fold-parallel)')
        max_n = max(f[0][0].shape[0] for f in folds)
        mft = MultiFoldTrainer(model, train_config, max_n, mesh=mesh,
                               shardings_fn=mesh_shardings,
                               loss_fn=fd_loss)
        stacked = stack_params(params_list)
        batches = stack_fold_batches([f[0] for f in folds],
                                     [f[1] for f in folds],
                                     train_config.batch_size)
        # with a mesh, keep batches on the host: jit's in_shardings place the
        # shards; a plain device_put would commit them to one device first
        batches = jax.device_put(batches) if mesh is None else batches
        if getattr(args, 'warmup_only', False):
            secs = mft.compile(stacked, batches, jnp.stack(keys))
            print(f'warmup: fold-parallel train program compiled in '
                  f'{secs:.1f}s (persistent cache populated)')
            run_log.event('warmup_done', seconds=secs)
            return
        if checkpoint_every:
            out_params, logs = mft.run_resumable(
                stacked, batches, jnp.stack(keys),
                state_dir=model_dir, checkpoint_every=checkpoint_every,
                resume=resume)
        else:
            out_params, logs = mft.run(stacked, batches, jnp.stack(keys))
        # one bulk device->host fetch, then numpy slicing: per-fold device
        # indexing would issue an eager (compile + RTT) op per leaf per fold
        host_params = jax.tree_util.tree_map(np.asarray,
                                             jax.device_get(out_params))
        host_logs = jax.tree_util.tree_map(np.asarray, jax.device_get(logs))
        per_fold_params = unstack_params(host_params, n_folds)
        per_fold_logs = [
            {k: v[f] for k, v in host_logs.items()} for f in range(n_folds)
        ]
    elif fused_trainer is None:
        stream_shards = getattr(args, 'stream_shards', 0) or 0
        if stream_shards:
            # out-of-core streaming: batch shards double-buffer host->HBM
            # while a jitted scan consumes each shard; bit-identical to the
            # resident trainer (train/streaming.py), so the resumable state
            # dir is shared with it
            from ..train import StreamingFoldTrainer

            if stream_shards == -1:
                # auto-size from the device HBM budget: smallest S keeping
                # ~2 resident shards (double buffer) under half the HBM
                # (params/activations/XLA temporaries need the other half)
                from ..train.streaming import shard_plan

                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                except Exception:
                    stats = {}
                hbm = int(stats.get('bytes_limit', 16 * 2**30))
                budget = hbm // 2
                total = sum(int(np.asarray(a).nbytes)
                            for a in list(folds[0][0]) + list(folds[0][1]))
                stream_shards = shard_plan(total, budget)
                print(f'--stream_shards auto: {total / 2**20:.0f} MiB '
                      f'batch data vs {budget / 2**20:.0f} MiB budget '
                      f'-> {stream_shards} shard(s)')
            elif stream_shards < 1:
                raise SystemExit(
                    f'--stream_shards must be >= 1 (or -1 for auto), '
                    f'got {stream_shards}')
            try:
                trainer = StreamingFoldTrainer(
                    model, train_config, folds[0][0][0].shape[0],
                    shards=stream_shards, loss_fn=fd_loss,
                    mesh=stream_mesh)
            except ValueError as exc:
                raise SystemExit(f'--stream_shards: {exc}')
            if stream_mesh is not None:
                axes = dict(zip(stream_mesh.axis_names,
                                stream_mesh.devices.shape))
                print(f'train model (streamed, {stream_shards} batch '
                      f'shards, rows sharded over mesh {axes})')
            else:
                print(f'train model (streamed, {stream_shards} batch '
                      'shards)')
        else:
            trainer = FoldTrainer(model, train_config,
                                  folds[0][0][0].shape[0], loss_fn=fd_loss)
        if getattr(args, 'warmup_only', False):
            data_list, cov_list = folds[0]
            if stream_shards:
                secs = trainer.compile(params_list[0], data_list, cov_list,
                                       keys[0])
                print(f'warmup: streamed shard programs compiled in '
                      f'{secs:.1f}s (persistent cache populated)')
            else:
                from ..train.trainer import make_batches

                batches = jax.device_put(make_batches(
                    data_list, cov_list, train_config.batch_size))
                secs = trainer.compile(params_list[0], batches, keys[0])
                print(f'warmup: whole-fold train program compiled in '
                      f'{secs:.1f}s (persistent cache populated)')
            run_log.event('warmup_done', seconds=secs)
            return
        per_fold_params, per_fold_logs = [], []
        for fold, (data_list, cov_list) in enumerate(folds):
            print('train model')
            if checkpoint_every:
                params, logs = trainer.run_resumable(
                    params_list[fold], data_list, cov_list, keys[fold],
                    state_dir=model_dir / f'{fold:03d}',
                    checkpoint_every=checkpoint_every, resume=resume)
            else:
                params, logs = trainer.run(params_list[fold], data_list,
                                           cov_list, key=keys[fold])
            per_fold_params.append(params)
            per_fold_logs.append(logs)

    # ---- artifacts ---------------------------------------------------------
    mark('train (device + fetch)')
    common.emit_fold_artifacts(model_dir, per_fold_logs, per_fold_params,
                               config_dict, n_folds)
    # fold_done only after the fold's artifacts are actually on disk: a
    # consumer tailing run_log must never see a fold without its checkpoint
    for fold in range(n_folds):
        logs = per_fold_logs[fold]
        last = {k: float(np.asarray(v)[-1]) for k, v in logs.items()}
        print('Train fold:', fold, ' final-epoch ',
              ', '.join(f'{k}: {round(v, 3)}' for k, v in last.items()))
        run_log.event('fold_done', fold=fold, **last)
        print('fold_model_dir:', model_dir / f'{fold:03d}')
    run_log.event('train_end', folds=n_folds)
    mark('artifacts (plots + checkpoints)')


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    common.add_common_flags(parser)
    parser.add_argument('--lr_schedule', dest='lr_schedule',
                        default='constant', choices=['constant', 'cyclic'],
                        help='constant reproduces the reference (its cyclic '
                             'assignment is a no-op); cyclic enables the '
                             'intended triangular schedule.')
    parser.add_argument('--fold_parallel', dest='fold_parallel',
                        action='store_true',
                        help='train every CV fold concurrently as one '
                             'vmapped device program (numerics identical to '
                             'the sequential run).')
    parser.add_argument('--mesh', dest='mesh', default=None,
                        help='shard the fold-parallel program over a device '
                             'mesh: F,D (folds x data-parallel) or F,D,M '
                             '(adds Megatron-style tensor parallelism over '
                             'the weight matrices). Axis product must equal '
                             'the visible device count; requires '
                             '--fold_parallel.')
    parser.add_argument('--precision', dest='precision', default='fp32',
                        choices=['fp32', 'bf16'],
                        help='bf16 runs the MXU matmuls in bfloat16 with '
                             'fp32 master params and loss reductions.')
    parser.add_argument('--remat', dest='remat', action='store_true',
                        help='rematerialize the forward inside the backward '
                             '(jax.checkpoint): trades recompute FLOPs for '
                             'activation HBM traffic/memory in wide-feature '
                             'regimes; numerically identical.')
    parser.add_argument('--packed_xla', dest='packed_xla',
                        action='store_true',
                        help='pack all modalities into batched einsums per '
                             'layer (XLA). Mixed-width cvae cohorts ride '
                             'the pad-free width-grouped layout (measured '
                             '+50%% single-fold / +72%% 5-fold vs the '
                             'per-modality path at flagship widths — '
                             'RESULTS.md round-4); uniform widths and the '
                             'mmJSD/mvtCAE skeleton variants use the '
                             'padded stacked layout. Numerics match to '
                             'float tolerance.')
    parser.add_argument('--ep_mesh', dest='ep_mesh', default=None,
                        metavar='M,D|F,M,D',
                        help='expert-parallel training: shard the packed '
                             'modality axis over an M-way device mesh axis '
                             '(latent-fusion ops run as psum collectives '
                             'over ICI) x D-way data parallelism; M must '
                             'divide the modality count and the axis '
                             'product must equal the visible device count. '
                             'Two sizes (M,D) train folds sequentially '
                             '(hand-scheduled shard_map collectives); three '
                             '(F,M,D) run all folds fold-parallel with '
                             'GSPMD placing the same collectives. Mutually '
                             'exclusive with --mesh/--packed_xla/'
                             '--fused_train_step (and --fold_parallel for '
                             'the 2-axis form).')
    parser.add_argument('--batch_size', dest='batch_size', type=int,
                        default=256,
                        help='training batch size. The reference hardcodes '
                             '256 (train:197) and so does every parity '
                             'surface here; larger batches amortize '
                             'per-step overhead in the wide-feature (PPMI) '
                             'regime — RESULTS.md records the remaining '
                             'headroom there as architectural (batch '
                             'size), not kernel-level. Non-default values '
                             'are a different trajectory from the '
                             'reference\'s.')
    parser.add_argument('--warmup_only', dest='warmup_only',
                        action='store_true',
                        help='compile the training program for this exact '
                             'config (shapes, epochs, fold layout) WITHOUT '
                             'running it, pre-seeding the persistent '
                             'compilation cache before a sweep.')
    parser.add_argument('--checkpoint_every', dest='checkpoint_every',
                        type=int, default=0,
                        help='write a resumable train-state checkpoint '
                             '(params + optimizer state + PRNG + epoch '
                             'cursor) every N epochs; 0 disables.')
    parser.add_argument('--resume', dest='resume', action='store_true',
                        help='resume a killed run from its train-state '
                             'checkpoint (requires --checkpoint_every); '
                             'the resumed trajectory is bit-identical to an '
                             'uninterrupted run.')
    parser.add_argument('--fused_train_step', dest='fused_train_step',
                        action='store_true',
                        help='run each optimizer step as ONE fused Pallas '
                             'fwd+bwd kernel (cVAE_multimodal, '
                             'poe/gpoe/moe/mopoe): single-block when the '
                             'batch fits VMEM, otherwise the batch-tiled '
                             'grid kernel (weights resident; also the bf16 '
                             'path under --precision bf16); automatically '
                             'falls back to the XLA path when unsupported.')
    parser.add_argument('--fused_decoder', dest='fused_decoder',
                        action='store_true',
                        help='fuse each modality\'s wide decoder-head + '
                             'Gaussian NLL (fwd AND hand-derived bwd) into '
                             'one batch-tiled Pallas op — the wide-feature '
                             '(PPMI-class) partial fusion that keeps the '
                             'recon means/residuals out of HBM while XLA '
                             'pipelines the narrow layers; cvae variant, '
                             'fp32, plain or --fold_parallel trainers.')
    parser.add_argument('--no_fused_heads', dest='no_fused_heads',
                        action='store_true',
                        help='disable the default merged mu/logvar encoder '
                             'heads (one [H, 2Z] matmul per modality, '
                             'measured +6-7%%/step — RESULTS.md round 3) '
                             'and run the two-matmul reference-shaped '
                             'loss; the merged math is exact on CPU and '
                             'float-reorder-tolerant on the MXU.')
    parser.add_argument('--stream_shards', dest='stream_shards', type=int,
                        default=0, metavar='S',
                        help='out-of-core training for cohorts that exceed '
                             'HBM: split each epoch into S contiguous batch '
                             'shards, double-buffer the host->device upload '
                             'of shard i+1 under the jitted scan of shard i '
                             '(donated buffers; peak batch HBM ~2/S of the '
                             'cohort). Bit-identical to the resident '
                             'trainer. Composes with --mesh 1,D (each '
                             'shard\'s rows shard over the data axis: '
                             'per-device residency ~2/(S*D), aggregate '
                             'upload bandwidth x D); otherwise sequential '
                             'single-device. 0 disables; -1 auto-sizes '
                             'from the device HBM budget.')
    parser.add_argument('--in_memory_fusion', dest='in_memory_fusion',
                        action='store_true',
                        help='build the UCA early-fusion modality by '
                             'concatenating the scaled base blocks in memory '
                             '(numerically identical; skips reading the '
                             'early_fusion CSV).')
    parser.add_argument('--profile_dir', dest='profile_dir', default=None,
                        help='emit a jax.profiler device trace of the '
                             'training run into this directory.')
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    common.apply_post_parse_defaults(args)
    if getattr(args, 'profile_dir', None):
        from ..utils.profiling import trace

        with trace(args.profile_dir):
            main(args, project_root=project_root)
    else:
        main(args, project_root=project_root)


if __name__ == '__main__':
    run()
