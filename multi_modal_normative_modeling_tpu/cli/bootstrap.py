"""Bootstrap-resampled normative modeling (commands_list10's bootstrap_*.py).

The reference's commands_list10.sh drives six ``bootstrap_*`` scripts that
were never committed to its repo (reference commands_list10.sh:8-38;
SURVEY.md Q9): bootstrap id creation, train/test, and group analysis for a
cVAE and a plain VAE on the ``3modalities`` early-fusion table. This module
implements the pipeline those commands describe, TPU-first:

* **Training**: all B bootstrap replicates run as ONE vmapped device
  program. Resampling with replacement preserves the cohort size, so every
  replicate has exactly n train rows and the replicate axis vmaps with zero
  padding (the same free-parallelism corollary as fold-vmap, RESULTS.md).
* **Inference**: all replicates' test splits (sizes vary — out-of-bag
  counts differ per draw) run as ONE row-padded vmapped program.

Semantics (reference conventions wherever one exists):

* ``create_ids``: train = n draws with replacement from the training-class
  group (``np.random.seed(42)`` then ``np.random.choice``, like the k-fold
  generators' oversampling, utils.py:84-86); test = the out-of-bag
  training-class subjects + every other-group subject (the unigroup test
  convention, utils.py:50-70). Files land in
  ``outputs/bootstrap_analysis/{train,test}_ids_%03d.csv``.
* ``-D 3modalities`` resolves to ``early_fusion_modalities_<R>`` (built in
  memory from the base modalities when the CSV is absent — identical up to
  the round-trip ulp, see common.fuse_preps).
* train/test mirror the supervised CLI: batch 256, Adam 1e-4, shuffle=False,
  RobustScaler refit per replicate on its train rows, qcut covariates per
  split (SURVEY.md Q5), msgpack checkpoints + config JSON per replicate.
* ``--unconditioned`` (the ``bootstrap_*_vae_*`` scripts): the covariate
  block is a constant zero column — a cVAE conditioned on a constant, i.e.
  a plain VAE up to one bias column.
* ``analyze``: per-replicate deviation ROC-AUC per (hc, disease) label pair,
  plus the bootstrap mean/std and 2.5-97.5 percentile CI, appended to
  ``result_baseline/result_bootstrap.txt`` and written to
  ``bootstrap_auc.csv``.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import jax
import numpy as np
import pandas as pd

from .. import registry
from ..parallel import MultiFoldTrainer, stack_fold_batches, stack_params
from ..parallel.folds import unstack_params
from ..train import TrainConfig, checkpoint_exists
from . import common


def _dirs(project_root: Path, unconditioned: bool):
    boot_dir = project_root / 'outputs' / 'bootstrap_analysis'
    model_name = 'supervised_vae' if unconditioned else 'supervised_cvae'
    return boot_dir, boot_dir / model_name


def _dataset_name(resource: str, dataset: str) -> str:
    if dataset == '3modalities':
        return f'early_fusion_modalities_{resource}'
    return dataset


def _prepare(project_root: Path, resource: str, dataset: str,
             participants_path, train_ids_path, test_ids_path=None) -> dict:
    """prepare_modality for the bootstrap dataset, building the early-fusion
    modality in memory when its CSV is absent (same math as the supervised
    CLI's --in_memory_fusion)."""
    name = _dataset_name(resource, dataset)
    path = project_root / 'data' / resource / f'{name}.csv'
    if name.startswith('early_fusion_modalities') and not path.exists():
        bases = registry.get_datasets_name(resource)
        preps = [
            common.prepare_modality(project_root, resource, b,
                                    participants_path, train_ids_path,
                                    test_ids_path)
            for b in bases
        ]
        frames = ([p['test_df'] for p in preps] if test_ids_path is not None
                  else [p['train_df'] for p in preps])
        common.assert_modalities_aligned(frames, 'bootstrap fusion')
        return common.fuse_preps(preps, bases, resource)
    return common.prepare_modality(project_root, resource, name,
                                   participants_path, train_ids_path,
                                   test_ids_path)


def create_ids(args, project_root=None) -> None:
    """Write B bootstrap train/test id files (with-replacement train,
    out-of-bag + other-group test)."""
    project_root = Path(project_root) if project_root else Path.cwd()
    boot_dir = project_root / 'outputs' / 'bootstrap_analysis'
    boot_dir.mkdir(parents=True, exist_ok=True)

    participants_path = (project_root / 'data' / args.dataset_resourse /
                         'y.csv')
    ids_df = pd.read_csv(participants_path)
    hc_label = registry.get_hc_label(args.dataset_resourse)
    training_label = hc_label if args.training_class == 'nm' else 0
    group = ids_df[ids_df['DIA'] == training_label]
    other = ids_df[ids_df['DIA'] != training_label]

    # stale replicate files from an earlier, larger -B run would otherwise
    # survive and be picked up by the train/test stages
    for old in list(boot_dir.glob('train_ids_*.csv')) + list(
            boot_dir.glob('test_ids_*.csv')):
        old.unlink()

    np.random.seed(42)
    group_ids = group['IID'].to_numpy()
    n = len(group_ids)
    size = int(n * args.oversample_percentage)
    for b in range(args.n_bootstrap):
        drawn = np.random.choice(group_ids, size=size, replace=True)
        oob = np.setdiff1d(group_ids, drawn)
        pd.DataFrame({'IID': drawn}).to_csv(
            boot_dir / f'train_ids_{b:03d}.csv', index=False)
        pd.DataFrame({'IID': np.concatenate([oob, other['IID'].to_numpy()])
                      }).to_csv(boot_dir / f'test_ids_{b:03d}.csv',
                                index=False)
    print(f'bootstrap ids: {args.n_bootstrap} replicates, {size} train draws '
          f'each, OOB + {len(other)} non-training subjects per test file '
          f'-> {boot_dir}')


def _replicates(boot_dir: Path):
    reps = sorted(int(p.stem.split('_')[-1])
                  for p in boot_dir.glob('train_ids_*.csv'))
    if not reps:
        raise FileNotFoundError(
            f'no bootstrap id files in {boot_dir}; run create_ids first')
    return reps


def train(args, project_root=None) -> None:
    """Train all replicates as one vmapped device program."""
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()
    project_root = Path(project_root) if project_root else Path.cwd()
    boot_dir, model_dir = _dirs(project_root, args.unconditioned)
    model_dir.mkdir(parents=True, exist_ok=True)
    participants_path = (project_root / 'data' / args.dataset_resourse /
                         'y.csv')
    reps = _replicates(boot_dir)

    from concurrent.futures import ThreadPoolExecutor

    def prep_one(b):
        prep = _prepare(project_root, args.dataset_resourse, args.dataset,
                        participants_path, boot_dir / f'train_ids_{b:03d}.csv')
        x = prep['train_data']
        cov = (np.zeros((x.shape[0], 1), np.float32) if args.unconditioned
               else prep['train_cov'])
        return x, cov

    # threaded like prepare_folds: the merge+scaler+qcut host work per
    # replicate is where bootstrap wall-clock would otherwise live
    with ThreadPoolExecutor(max_workers=8) as pool:
        prepped = list(pool.map(prep_one, reps))
    xs = [p[0] for p in prepped]
    covs = [p[1] for p in prepped]

    config_dict = {
        'model': 'cVAE_multimodal',
        'input_dim_list': [int(xs[0].shape[1])],
        'hidden_dim': list(args.hz_para_list[:-1]),
        'latent_dim': int(args.hz_para_list[-1]),
        'c_dim': int(covs[0].shape[1]),
        'modalities': 1,
        'non_linear': True,
        'combine': 'gpoe',  # single modality: fusion is the M==1 shortcut
        'unconditioned': bool(args.unconditioned),
    }
    model = common.build_model_from_config(config_dict)
    tconfig = TrainConfig(epochs=args.epochs, batch_size=256,
                          learning_rate=0.0001, combine='gpoe',
                          shuffle=False, seed=42,
                          fused_heads=not getattr(args, 'no_fused_heads',
                                                  False))

    n_reps = len(reps)
    init = common.host_init_params(model)
    stacked = stack_params([init] * n_reps)
    batches = stack_fold_batches([[x] for x in xs], [[c] for c in covs],
                                 tconfig.batch_size)
    # distinct PRNG streams per replicate (our convention — the reference
    # has no bootstrap trainer to match; replicate diversity comes from
    # both the resampling and the reparameterization stream)
    keys = np.stack([common.host_prng_key(1000 + b) for b in reps])

    # --mesh R,D[,M] shards the replicate axis over the mesh's 'fold' axis
    # (replicates are the embarrassingly-parallel unit here, exactly like
    # CV folds elsewhere), batch rows over 'data'
    mesh, mesh_shardings = common.parse_mesh(
        getattr(args, 'mesh', None), n_folds=n_reps,
        batch_size=tconfig.batch_size)
    if mesh is not None:
        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        print(f'bootstrap train over a {axes} device mesh')
    trainer = MultiFoldTrainer(model, tconfig, xs[0].shape[0], mesh=mesh,
                               shardings_fn=mesh_shardings)
    checkpoint_every = getattr(args, 'checkpoint_every', 0) or 0
    common.require_checkpoint_for_resume(args)
    if checkpoint_every:
        # ONE whole-run train state over the stacked replicate axis —
        # kill-and-resume bit-identical, like every other trainer
        if mesh is None:
            batches = jax.device_put(batches)
        params, logs = trainer.run_resumable(
            stacked, batches, keys, state_dir=model_dir,
            checkpoint_every=checkpoint_every,
            resume=getattr(args, 'resume', False))
    else:
        params, logs = trainer.run(stacked, batches, keys)
    host_params = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
    host_logs = {k: np.asarray(v) for k, v in logs.items()}
    per_rep = unstack_params(host_params, n_reps)
    per_rep_logs = [{k: v[i] for k, v in host_logs.items()}
                    for i in range(n_reps)]
    # dirs keyed by replicate id, not position: the id set may be
    # non-contiguous and test()/analyze() look dirs up by id
    common.emit_fold_artifacts(model_dir, per_rep_logs, per_rep, config_dict,
                               n_reps, fold_ids=reps)
    finals = {k: float(np.asarray(v)[:, -1].mean())
              for k, v in host_logs.items()}
    print(f'bootstrap train: {n_reps} replicates x {args.epochs} epochs '
          f'(one vmapped program), final-epoch means: '
          + ', '.join(f'{k}: {v:.3f}' for k, v in sorted(finals.items())))


def test(args, project_root=None) -> None:
    """Score every replicate's test split (one padded vmapped program);
    emit deviation_<dataset>.csv per replicate."""
    from ..utils.jaxconfig import warm_device_session

    warm_device_session()
    project_root = Path(project_root) if project_root else Path.cwd()
    boot_dir, model_dir = _dirs(project_root, args.unconditioned)
    participants_path = (project_root / 'data' / args.dataset_resourse /
                         'y.csv')
    reps = _replicates(boot_dir)

    from concurrent.futures import ThreadPoolExecutor

    def job_for(b):
        rep_dir = model_dir / f'{b:03d}'
        if not checkpoint_exists(rep_dir):
            raise FileNotFoundError(
                f'no checkpoint in {rep_dir}; run the train stage first')
        prep = _prepare(project_root, args.dataset_resourse, args.dataset,
                        participants_path,
                        boot_dir / f'train_ids_{b:03d}.csv',
                        boot_dir / f'test_ids_{b:03d}.csv')
        cov = (np.zeros((prep['test_data'].shape[0], 1), np.float32)
               if args.unconditioned
               else common.require_test_cov(prep, f'bootstrap test rep {b}'))
        return {'b': b, 'dir': rep_dir,
                'x': np.asarray(prep['test_data'], np.float32),
                'cov': cov, 'df': prep['test_df']}

    with ThreadPoolExecutor(max_workers=8) as pool:
        jobs = list(pool.map(job_for, reps))

    model, params0, config = common.load_model_and_params(jobs[0]['dir'])
    params_list = [params0] + [
        common.load_model_and_params(j['dir'])[1] for j in jobs[1:]]

    max_rows = max(j['x'].shape[0] for j in jobs)
    # --mesh R,D: shard the scoring program (replicates over the mesh's
    # 'fold' axis, padded test rows over 'data')
    infer_mesh = common.parse_infer_mesh(getattr(args, 'mesh', None))
    common.check_infer_fold_axis(infer_mesh, len(jobs), 'replicates')
    tile = common.infer_row_tile(infer_mesh)
    padded = -(-max_rows // tile) * tile

    def pad(a):
        return np.pad(a, ((0, padded - a.shape[0]), (0, 0)))

    xes = np.stack([pad(j['x']) for j in jobs])
    cs = np.stack([pad(j['cov']) for j in jobs])
    keys = np.stack([common.host_prng_key(2000 + j['b']) for j in jobs])

    def infer_one(params, x, c, key):
        recons = model.pred_recon(params, [x], [c], key,
                                  config.get('combine', 'gpoe'))
        return model.reconstruction_deviation(x, recons[0])

    vinfer = common.fold_infer_jit(infer_one, infer_mesh)
    devs = np.asarray(vinfer(stack_params(params_list), xes, cs, keys))
    for i, j in enumerate(jobs):
        n_rows = j['x'].shape[0]
        out = j['df'][['participant_id', 'DIA', 'AGE', 'PTGENDER']].copy()
        out['Reconstruction deviation'] = devs[i, :n_rows]
        out.to_csv(j['dir'] / f'deviation_{args.dataset}.csv', index=False)
    print(f'bootstrap test: {len(jobs)} replicates scored '
          f'(one vmapped program, rows padded to {padded})')


def analyze(args, project_root=None) -> dict:
    """Per-replicate deviation ROC-AUC + bootstrap CI summary."""
    from sklearn.metrics import roc_auc_score

    project_root = Path(project_root) if project_root else Path.cwd()
    boot_dir, model_dir = _dirs(project_root, args.unconditioned)
    reps = sorted(int(p.name) for p in model_dir.iterdir()
                  if p.is_dir() and p.name.isdigit()
                  and (p / f'deviation_{args.dataset}.csv').exists())
    if any(boot_dir.glob('train_ids_*.csv')):
        # only the CURRENT bootstrap set: model dirs from an earlier,
        # larger -B run may still hold deviation CSVs
        current = set(_replicates(boot_dir))
        reps = [b for b in reps if b in current]
    if not reps:
        raise FileNotFoundError(
            f'no deviation_{args.dataset}.csv under {model_dir}; '
            'run the test stage first')
    frames = [pd.read_csv(model_dir / f'{b:03d}' /
                          f'deviation_{args.dataset}.csv') for b in reps]

    hc_label = registry.get_hc_label(args.dataset_resourse)
    pairs = [p for p in registry.HC_PATIENT_COMBINATIONS[args.dataset_resourse]
             if p[0] == hc_label]
    results = {}
    rows = []
    for hc, disease in pairs:
        # (replicate, auc) pairs so a skipped replicate (OOB subset with a
        # single class) cannot shift attribution of the surviving AUCs
        rep_aucs = []
        for b, df in zip(reps, frames):
            sub = df[df['DIA'].isin([hc, disease])]
            if sub['DIA'].nunique() < 2:
                continue
            labels = (sub['DIA'] != hc).astype(int)  # nm: patient = 1
            rep_aucs.append((b, roc_auc_score(
                labels, sub['Reconstruction deviation'])))
        if not rep_aucs:
            continue
        aucs = np.asarray([a for _, a in rep_aucs])
        lo, hi = np.percentile(aucs, [2.5, 97.5])
        results[f'{hc}vs{disease}'] = {
            'n_replicates': len(aucs), 'mean': float(aucs.mean()),
            'std': float(aucs.std()), 'ci_low': float(lo),
            'ci_high': float(hi),
        }
        for b, a in rep_aucs:
            rows.append({'pair': f'{hc}vs{disease}', 'replicate': b,
                         'auc': a})

    out_dir = project_root / 'result_baseline'
    out_dir.mkdir(exist_ok=True)
    variant = 'VAE' if args.unconditioned else 'CVAE'
    with open(out_dir / 'result_bootstrap.txt', 'a') as f:
        f.write(f'Bootstrap settings: {variant}. {args.dataset_resourse} '
                f'-D {args.dataset} Epochs {args.epochs} '
                f'Replicates {len(reps)} '
                f'hz_para_list: {list(args.hz_para_list)}\n')
        for pair, r in results.items():
            f.write(f'{pair} ROC-AUC: $ {100 * r["mean"]:.2f} '
                    f'\\pm {100 * r["std"]:.2f} $ '
                    f'(95% CI [{100 * r["ci_low"]:.2f}, '
                    f'{100 * r["ci_high"]:.2f}])\n')
        f.write('\n')
    pd.DataFrame(rows).to_csv(project_root / 'bootstrap_auc.csv', index=False)
    print(f'bootstrap analyze: {len(reps)} replicates, '
          + '; '.join(f'{p}: AUC {r["mean"]:.4f} '
                      f'[{r["ci_low"]:.4f}, {r["ci_high"]:.4f}]'
                      for p, r in results.items()))
    return results


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description='Bootstrap-resampled normative modeling '
                    "(the reference commands_list10.sh's bootstrap_* chain)")
    parser.add_argument('action', choices=['create_ids', 'train', 'test',
                                           'analyze', 'all'])
    parser.add_argument('-R', '--dataset_resourse', default='ADNI')
    parser.add_argument('-D', '--dataset', default='3modalities',
                        help="modality table; '3modalities' = the "
                             'early-fusion concat')
    parser.add_argument('-E', '--epochs', type=int, default=200)
    parser.add_argument('-B', '--n_bootstrap', type=int, default=10)
    parser.add_argument('-H', '--hz_para_list', nargs='+', type=int,
                        default=[110, 110, 10])
    parser.add_argument('-O', '--oversample_percentage', type=float,
                        default=1)
    parser.add_argument('-TrainingClass', '--training_class', default='nm')
    parser.add_argument('--mesh', dest='mesh', default=None, metavar='R,D',
                        help='shard the replicate-parallel train program '
                             'over a device mesh: R,D (replicates x '
                             'data-parallel) or R,D,M (+ tensor-parallel '
                             'model axis); product must equal the visible '
                             'device count')
    common.add_resume_flags(parser)
    parser.add_argument('--no_fused_heads', dest='no_fused_heads',
                        action='store_true',
                        help='disable the default merged mu/logvar encoder '
                             'heads (train/trainer.py fused_heads_loss_fn) '
                             'for numeric consistency with a '
                             '--no_fused_heads train run')
    parser.add_argument('--unconditioned', action='store_true',
                        help='plain-VAE variant: constant zero covariates')
    return parser


def main(args=None, project_root=None):
    if args is None or isinstance(args, list):
        args = build_parser().parse_args(args)
    actions = (['create_ids', 'train', 'test', 'analyze']
               if args.action == 'all' else [args.action])
    result = None
    for action in actions:
        result = globals()[action](args, project_root=project_root)
    return result


if __name__ == '__main__':
    main()
