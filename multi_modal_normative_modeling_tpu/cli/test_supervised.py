"""Per-fold inference + deviation CSV emission.

Drop-in CLI for multimodal_kfold_test_cvae_supervised.py: re-fits the scaler
from the fold's train rows, re-bins covariates on the test split (reference
quirk, SURVEY.md Q5), loads the fold checkpoint, runs the stochastic
``pred_recon`` (SURVEY.md Q2) and writes the five deviation CSVs per (fold,
modality) plus the concatenated all-fold copies.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np
from .. import registry
from ..infer.emitters import DeviationEmitter
from ..train import checkpoint_exists, load_checkpoint
from . import common

# process-level cache of the jitted inference program + params template,
# keyed by (model config, combine, fused): sweep engines call main() once per
# grid milestone and would otherwise re-trace identical programs every time
_INFER_CACHE: dict = {}


def _ep_infer_program(config: dict, combine: str, mesh):
    """Expert-parallel inference: the packed-modality forward
    (models/stacked.py) vmapped over folds and GSPMD-sharded over a
    ('fold', 'modality', 'data') mesh — per-device FLOPs/params drop by the
    modality-axis size (the PPMI-width win, parallel/modality.py:17-22)
    while rows stay independent. Returns (stacked, vinfer): ``vinfer``
    takes (fold-stacked packed params, x_packed [F, M, rows, d_max],
    cs [F, rows, C], seeds [F]) and returns (recons [F, M, rows, d_max],
    devs [F, M, rows]). PRNG streams match the per-modality program (one
    [rows, Z] draw per fold), so recon values agree to fusion-reorder float
    tolerance.

    Mixed-width cohorts (round 5) get the pad-free width-grouped program
    instead: operands/recons are tuples per width group [F, G_g, rows,
    d_g] and devs come back in GROUPED modality order (the caller maps
    per-group rows to modalities via ``stacked.groups``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.stacked import StackedMultimodalCVAE

    mesh_key = tuple(zip(mesh.axis_names, mesh.devices.shape))
    key = (json.dumps(config, sort_keys=True), combine, 'ep', mesh_key)
    if key not in _INFER_CACHE:
        from ..models.stacked import SKELETON_VARIANTS

        name = config.get('model', 'cVAE_multimodal')
        if name not in SKELETON_VARIANTS:
            raise SystemExit(
                f"--ep_mesh inference supports the cVAE skeleton only "
                f"({sorted(SKELETON_VARIANTS)}; checkpoint model {name!r})")

        def sh(spec):
            return NamedSharding(mesh, spec)

        from ..models.grouped import GroupedStackedCVAE, width_groups

        nm = mesh.shape['modality']
        if len(width_groups(config['input_dim_list'])) > 1:
            # round 5: mixed-width cohorts infer on the pad-free
            # width-grouped layout — same divisible-or-replicate sharding
            # rule as training/serving (parallel/modality.py
            # grouped_fold_shardings); EP targets exactly the wide cohorts
            # where the pad-to-widest tax hurts most
            stacked = GroupedStackedCVAE(
                config['input_dim_list'], config['hidden_dim'],
                config['latent_dim'], config['c_dim'],
                config['modalities'], config.get('non_linear', True),
                variant=SKELETON_VARIANTS[name])

            def infer_one(packed_params, x_groups, c, seed):
                k = jax.random.PRNGKey(seed)
                recons = stacked.pred_recon(packed_params, x_groups, c, k,
                                            combine)
                return recons, stacked.reconstruction_deviation(x_groups,
                                                                recons)

            from ..parallel.modality import ep_divisible_spec

            def leaf_sh(s):
                # s is the UNSTACKED pack_params leaf; the jit operand adds
                # a leading fold axis — prepend a dummy fold dim so the
                # shared divisible-or-replicate rule (one owner:
                # parallel/modality.ep_divisible_spec) sees the operand
                # geometry it shards
                return sh(ep_divisible_spec(nm, (1,) + tuple(s.shape)))

            shapes = jax.eval_shape(
                lambda k: stacked.pack_params(
                    common.build_model_from_config(config).init_params(k)),
                jax.ShapeDtypeStruct((2,), np.uint32))
            params_sh = jax.tree_util.tree_map(leaf_sh, shapes)
            x_sh = tuple(
                sh(P('fold',
                     'modality' if len(idx) % nm == 0 else None,
                     'data', None))
                for _, idx in stacked.groups)
            vinfer = jax.jit(jax.vmap(infer_one), in_shardings=(
                params_sh, x_sh, sh(P('fold', 'data', None)),
                sh(P('fold'))))
            _INFER_CACHE[key] = (stacked, vinfer)
            return _INFER_CACHE[key]

        stacked = StackedMultimodalCVAE(
            config['input_dim_list'], config['hidden_dim'],
            config['latent_dim'], config['c_dim'], config['modalities'],
            config.get('non_linear', True),
            variant=SKELETON_VARIANTS[name])

        def infer_one(packed_params, x_packed, c, seed):
            k = jax.random.PRNGKey(seed)
            recons = stacked.pred_recon(packed_params, x_packed, c, k,
                                        combine)
            return recons, stacked.reconstruction_deviation(x_packed, recons)

        # fold-stacked packed params: every leaf is [F, M, ...]
        shapes = jax.eval_shape(
            lambda k: stacked.pack_params(
                common.build_model_from_config(config).init_params(k)),
            jax.ShapeDtypeStruct((2,), np.uint32))
        params_sh = jax.tree_util.tree_map(
            lambda s: sh(P('fold', 'modality', *([None] * len(s.shape[1:])))),
            shapes)
        vinfer = jax.jit(jax.vmap(infer_one), in_shardings=(
            params_sh, sh(P('fold', 'modality', 'data', None)),
            sh(P('fold', 'data', None)), sh(P('fold'))))
        _INFER_CACHE[key] = (stacked, vinfer)
    return _INFER_CACHE[key]


def _infer_program(config: dict, combine: str, use_fused: bool, mesh=None):
    """Returns (model, vinfer, template) where ``vinfer`` runs ALL folds'
    inference as one vmapped device program over stacked per-fold params —
    the inference mirror of the fold-parallel trainer (rows are independent
    through the whole model, so per-fold outputs are identical to sequential
    calls; tests/test_pipeline_smoke.py schema/value checks cover it).
    With a ('fold', 'data') ``mesh`` the program shards folds over 'fold'
    and the padded test rows over 'data' (rows are independent, so this is
    pure scale-out)."""
    mesh_key = (tuple(zip(mesh.axis_names, mesh.devices.shape))
                if mesh is not None else None)
    key = (json.dumps(config, sort_keys=True), combine, bool(use_fused),
           mesh_key)
    if key not in _INFER_CACHE:
        model = common.build_model_from_config(config)
        fused = use_fused and hasattr(model, 'pred_recon_fused')

        def infer_one(params, xes, cs, seed):
            # the fold's PRNG stream (PRNGKey(1000+fold), SURVEY.md Q2) is
            # derived on-device from the integer seed: a host-side PRNGKey
            # call is an eager op through the remote tunnel (RTT each)
            key = jax.random.PRNGKey(seed)
            if fused:
                # Pallas kernels: fused encoder chains + decode-and-
                # deviate, one HBM round trip per modality (kernels/)
                recons, devs = model.pred_recon_fused(
                    params, list(xes), list(cs), key, combine)
                return recons, devs
            recons = model.pred_recon(params, list(xes), list(cs), key,
                                      combine)
            devs = [
                model.reconstruction_deviation(xes[m], recons[m])
                for m in range(len(xes))
            ]
            return recons, devs

        vinfer = common.fold_infer_jit(infer_one, mesh)
        # numpy template for checkpoint restore: shapes/dtypes only, built
        # abstractly — running init_params eagerly costs ~0.4s per op
        # through the remote-compile tunnel (~30s for the whole tree)
        shapes = jax.eval_shape(model.init_params,
                                jax.ShapeDtypeStruct((2,), np.uint32))
        template = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), shapes)
        # latent-stats program shares the cache entry: a fresh jit wrapper
        # per fold/milestone would re-trace (and re-compile on the tunnel)
        stats_fn = (jax.jit(lambda p, xes, cs: model.latent_stats(
            p, list(xes), list(cs), combine))
            if hasattr(model, 'latent_stats') else None)
        _INFER_CACHE[key] = (model, vinfer, template, stats_fn)
    return _INFER_CACHE[key]


def main(args, project_root=None):
    import os
    import time

    from ..utils.jaxconfig import warm_device_session

    warm_device_session()  # attach the remote device session during host prep

    # MMNM_TEST_TIMING=1 prints wall-clock per stage phase (observability;
    # the tunnel makes device phases hard to attribute from outside)
    timing = os.environ.get('MMNM_TEST_TIMING')
    marks = [time.perf_counter()]

    def mark(label):
        if timing:
            marks.append(time.perf_counter())
            print(f'[test timing] {label}: {marks[-1] - marks[-2]:.2f}s')

    project_root = Path(project_root) if project_root else Path.cwd()
    model_name = 'supervised_cvae'
    participants_path = project_root / 'data' / args.dataset_resourse / 'y.csv'

    outputs_dir = project_root / 'outputs'
    kfold_dir = outputs_dir / 'kfold_analysis'
    model_dir = kfold_dir / model_name
    deviation_dir = (project_root / 'deviation' / model_name /
                     args.dataset_resourse / args.procedure / 'path_model')
    deviation_dir.mkdir(exist_ok=True, parents=True)

    dataset_names = registry.get_datasets_name(args.dataset_resourse,
                                               args.procedure)
    if args.combine is None:
        raise ValueError(f'Unknown procedure: {args.procedure}')

    emitter = DeviationEmitter(dataset_names)
    infer_mesh = common.parse_infer_mesh(getattr(args, 'mesh', None))
    # --ep_mesh M,D or F,M,D: expert-parallel inference on the packed
    # layout (modality axis sharded; the M,D form leaves folds unsharded)
    ep_mesh = None
    if getattr(args, 'ep_mesh', None):
        if infer_mesh is not None:
            raise SystemExit('--ep_mesh is mutually exclusive with --mesh')
        ep_sizes = common.parse_axis_sizes(
            args.ep_mesh, '--ep_mesh', (2, 3),
            '4,2 (modality,data) or 2,2,2 (fold,modality,data)')
        if len(ep_sizes) == 2:
            ep_sizes = [1] + ep_sizes
        indivisible = common.ep_mesh_divisibility(
            ep_sizes, args.n_splits, 1, len(dataset_names))
        if indivisible:
            raise SystemExit(f'--ep_mesh {args.ep_mesh}: {indivisible}')
        from ..parallel.modality import make_ep_mesh3

        ep_mesh = make_ep_mesh3(n_fold=ep_sizes[0], n_modality=ep_sizes[1],
                                n_data=ep_sizes[2])
        axes = dict(zip(ep_mesh.axis_names, ep_mesh.devices.shape))
        print(f'test inference expert-parallel over a {axes} device mesh')
    model = None
    vinfer = None
    template = None

    # prepare all (fold x modality) splits on a thread pool up front
    from concurrent.futures import ThreadPoolExecutor

    in_memory_fusion = (getattr(args, 'in_memory_fusion', False)
                        and args.procedure.startswith('UCA'))
    load_names = dataset_names[:-1] if in_memory_fusion else dataset_names

    # fold membership comes from the train_ids_/test_ids_ CSVs the train
    # stage wrote; KFold itself is not needed here
    n_folds = args.n_splits
    jobs = []
    for fold in range(n_folds):
        train_ids_path, test_ids_path = common.fold_paths(kfold_dir, fold)
        (model_dir / f'{fold:03d}').mkdir(exist_ok=True)
        for dataset_name in load_names:
            jobs.append((dataset_name, train_ids_path, test_ids_path))
    with ThreadPoolExecutor(max_workers=8) as pool:
        all_preps = list(pool.map(
            lambda j: common.prepare_modality(
                project_root, args.dataset_resourse, j[0],
                participants_path, j[1], j[2]), jobs))
    mark('prep (fold x modality, threaded)')

    # ---- phase 1: gather per-fold splits + restored params (host side) ----
    pending = []
    for fold in range(n_folds):
        fold_model_dir = model_dir / f'{fold:03d}'
        preps = list(all_preps[fold * len(load_names):
                               (fold + 1) * len(load_names)])
        if in_memory_fusion:
            preps.append(common.fuse_preps(preps, load_names,
                                           args.dataset_resourse))
        common.assert_modalities_aligned(
            [p['test_df'] for p in preps], f'test stage fold {fold}')
        if not checkpoint_exists(fold_model_dir):
            print('firstly train model')
            continue
        print('load trained model')
        # config lives in the JSON sidecar; restoring the params blob just
        # to read it would deserialize every checkpoint twice
        config = json.loads((fold_model_dir / 'cVAE_model.json').read_text())
        if model is None:
            # one vmapped inference program shared across folds AND across
            # main() calls (eager dispatch over the remote-TPU link costs a
            # round trip per op; sweep engines re-enter per grid milestone)
            model, vinfer, template, stats_fn = _infer_program(
                config, args.combine,
                getattr(args, 'fused_inference', False), mesh=infer_mesh)
        params, _ = load_checkpoint(fold_model_dir, template_params=template)
        pending.append({
            'fold': fold,
            'dir': fold_model_dir,
            'params': params,
            'test_data_list': [p['test_data'] for p in preps],
            'clinical_df': preps[0]['test_df'],
            'columns_list': [p['columns'] for p in preps],
            'test_cov': common.require_test_cov(
                preps[-1], f'test fold {fold}'),  # last modality wins (test:102)
            'train_data_list': [p['train_data'] for p in preps],
            'train_cov': preps[-1]['train_cov'],
        })

    mark('checkpoint restore + gather')

    # ---- phase 2: ONE vmapped inference call over the stacked fold axis ---
    if pending:
        n_mod = len(dataset_names)
        # bucket-pad rows so every (fold, run) hits the same compiled shape
        # (fold sizes differ by +-1; retracing costs ~30s on the tunnel);
        # rows are independent through the model, so pad rows change nothing
        max_rows = max(j['test_data_list'][0].shape[0] for j in pending)
        common.check_infer_fold_axis(infer_mesh, len(pending),
                                     'folds with checkpoints')
        if ep_mesh is not None and len(pending) % ep_mesh.shape['fold']:
            raise SystemExit(
                f"--ep_mesh: {len(pending)} folds with checkpoints not "
                f"divisible by the fold axis ({ep_mesh.shape['fold']})")
        # with a mesh, pad rows to a multiple of the data axis too, so the
        # row shard boundaries land evenly
        tile = common.infer_row_tile(ep_mesh if ep_mesh is not None
                                     else infer_mesh)
        padded_rows = -(-max_rows // tile) * tile

        def pad(a):
            a = np.asarray(a, dtype=np.float32)
            return np.pad(a, ((0, padded_rows - a.shape[0]), (0, 0)))

        cs_stack = np.stack([pad(j['test_cov']) for j in pending])
        # same per-fold PRNG streams as sequential inference (SURVEY.md Q2);
        # plain integer seeds — keys are derived inside the jitted program
        keys = np.array([1000 + j['fold'] for j in pending], dtype=np.uint32)
        from ..parallel import stack_params

        if ep_mesh is not None:
            from ..train.packed import _pack_params_host

            stacked_model, ep_vinfer = _ep_infer_program(
                config, args.combine, ep_mesh)
            packed_params = stack_params([
                _pack_params_host(stacked_model, j['params'])
                for j in pending])
            per_fold_inputs = [
                stacked_model.pack_inputs(
                    [pad(x) for x in j['test_data_list']])
                for j in pending]
            grouped_layout = isinstance(per_fold_inputs[0], tuple)
            if grouped_layout:
                # width-grouped program: tuple per group [F, G_g, rows, d_g]
                x_packed = tuple(
                    np.stack([pi[g] for pi in per_fold_inputs])
                    for g in range(len(per_fold_inputs[0])))
            else:
                x_packed = np.stack(per_fold_inputs)  # [F, M, rows, d_max]
            mark('pack + stack (ep)')
            recons, _ = ep_vinfer(packed_params, x_packed, cs_stack, keys)
            mark('ep inference dispatch')
            if grouped_layout:
                host_rec = [np.asarray(r) for r in recons]  # bulk fetches
                host_preds = []
                for m in range(n_mod):
                    gi = next(i for i, (_, idx)
                              in enumerate(stacked_model.groups)
                              if m in idx)
                    within = stacked_model.groups[gi][1].index(m)
                    host_preds.append(host_rec[gi][:, within])
            else:
                host_rec = np.asarray(recons)      # one bulk fetch
                host_preds = [
                    host_rec[:, m, :, : stacked_model.input_dim_list[m]]
                    for m in range(n_mod)]
            mark('device->host fetch')
        else:
            # per-modality padded stacks only on the non-ep path (the ep
            # branch builds the packed [F, M, rows, d_max] layout directly —
            # duplicating the cohort here would double host memory at
            # exactly the wide-feature scale ep targets)
            xes = tuple(
                np.stack([pad(j['test_data_list'][m]) for j in pending])
                for m in range(n_mod))
            cs = (cs_stack,) * n_mod
            stacked_params = stack_params([j['params'] for j in pending])
            mark('stack + keys')
            try:
                predictions, _ = vinfer(stacked_params, xes, cs, keys)
                mark('vmapped inference dispatch')
                # one bulk device->host fetch per modality, then numpy
                # slicing
                host_preds = [np.asarray(p) for p in predictions]
            except Exception as exc:
                if not getattr(args, 'fused_inference', False):
                    raise
                # the fused Pallas path has no batch tiling: a wide modality
                # x large fold can exceed VMEM and fail Mosaic compilation —
                # fall back to the XLA program (same numerics contract as
                # the fused train step's fallback)
                print(f'fused inference failed to compile ({exc!r}); '
                      'using the XLA path')
                model, vinfer, template, stats_fn = _infer_program(
                    config, args.combine, False, mesh=infer_mesh)
                predictions, _ = vinfer(stacked_params, xes, cs, keys)
                mark('vmapped inference dispatch')
                host_preds = [np.asarray(p) for p in predictions]
            mark('device->host fetch')

        # ---- phase 3: per-fold deviation math + CSV emission (threaded) ---
        for i, job in enumerate(pending):
            n_rows = job['test_data_list'][0].shape[0]
            preds = [host_preds[m][i, :n_rows] for m in range(n_mod)]
            # float64 deviation from the float64 scaled data and float32
            # predictions — matches the reference's numpy upcast (test:113,
            # cVAE.py:1210) and the goldens' float formatting
            deviations = [
                np.sum((job['test_data_list'][m] - preds[m]) ** 2, axis=1)
                / job['test_data_list'][m].shape[1]
                for m in range(n_mod)
            ]
            for m, dataset_name in enumerate(dataset_names):
                emitter.emit_fold(
                    job['dir'], dataset_name, job['columns_list'][m],
                    job['clinical_df'][['participant_id', 'DIA', 'AGE',
                                        'PTGENDER']],
                    job['test_data_list'][m], preds[m], deviations[m],
                )
            if getattr(args, 'emit_latent', False) and stats_fn is not None:
                _emit_latent(stats_fn, job['params'], job['dir'],
                             job['clinical_df'], job['train_data_list'],
                             job['train_cov'], job['test_data_list'],
                             job['test_cov'], n_mod)

    mark('deviation math + per-fold emit')
    emitter.emit_combined(deviation_dir)
    mark('combined emit + write join')


def _emit_latent(stats, params, fold_model_dir, clinical_df,
                 train_data_list, train_cov, test_data_list, test_cov,
                 n_modalities):
    """Opt-in latent deviation CSV per fold (beyond-reference: the reference
    ships the latent deviation math, utils_vae.py:155-161, but no pipeline
    ever emits it). ``stats`` is the jitted latent_stats program cached in
    _INFER_CACHE (one trace per config, not per fold)."""
    from ..infer.deviation import (
        latent_deviation,
        separate_latent_deviation,
    )

    mu_train, _ = stats(params, tuple(train_data_list),
                        (train_cov,) * n_modalities)
    mu_test, var_test = stats(params, tuple(test_data_list),
                              (test_cov,) * n_modalities)
    mu_train = np.asarray(mu_train)
    mu_test = np.asarray(mu_test)
    var_test = np.asarray(var_test)

    frame = clinical_df[['participant_id', 'DIA', 'AGE', 'PTGENDER']].copy()
    frame['Latent deviation'] = latent_deviation(mu_train, mu_test, var_test)
    per_dim = separate_latent_deviation(mu_train, mu_test, var_test)
    for i in range(per_dim.shape[1]):
        frame[f'latent {i}'] = per_dim[:, i]
    frame.to_csv(Path(fold_model_dir) / 'latent_deviation.csv', index=False)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('-R', '--dataset_resourse', dest='dataset_resourse',
                        type=str,
                        help='Dataset to use for training test and evaluation.')
    parser.add_argument('-H', '--hz_para_list', dest='hz_para_list', nargs='+',
                        type=int, help='List of paras to perform the analysis.')
    parser.add_argument('-C', '--combine', dest='combine', type=str,
                        help='how do we combine all modalities.')
    parser.add_argument('-P', '--procedure', dest='procedure', type=str,
                        help='Procedure to perform the analysis.')
    parser.add_argument('-K', '--n_splits', dest='n_splits', type=int,
                        default=10,
                        help='Number of splits for k-fold cross-validation.')
    parser.add_argument('--emit_latent', dest='emit_latent',
                        action='store_true',
                        help='also write per-fold latent_deviation.csv '
                             '(scalar + per-dim latent z-scores against the '
                             'train cohort).')
    parser.add_argument('--fused_inference', dest='fused_inference',
                        action='store_true',
                        help='run inference through the fused Pallas '
                             'encoder/decode-and-deviate kernels (TPU; '
                             'interpret-mode fallback elsewhere).')
    parser.add_argument('--mesh', dest='mesh', default=None, metavar='F,D',
                        help='shard the vmapped inference program over a '
                             '(fold, data) device mesh: folds over F, '
                             'padded test rows over D; product must equal '
                             'the visible device count')
    parser.add_argument('--ep_mesh', dest='ep_mesh', default=None,
                        metavar='M,D',
                        help='expert-parallel inference: the packed-modality '
                             'forward sharded over a (modality, data) or '
                             '(fold, modality, data) device mesh — the wide-'
                             'feature (PPMI-class) scoring scale-out; '
                             'mutually exclusive with --mesh')
    parser.add_argument('--in_memory_fusion', dest='in_memory_fusion',
                        action='store_true',
                        help='build the UCA early-fusion modality by '
                             'concatenating the scaled base blocks in memory '
                             '(numerically identical; skips reading the '
                             'early_fusion CSV).')
    return parser


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    if args.hz_para_list is None:
        args.hz_para_list = [110, 110, 10]
    if args.procedure is None:
        args.procedure = 'UCA-gPoE'
    if args.combine is None:
        args.combine = args.procedure.split('-')[1]
    if args.dataset_resourse is None:
        args.dataset_resourse = 'ADNI'
    main(args, project_root=project_root)


if __name__ == '__main__':
    run()
