"""One-process experiment pipeline: train -> test -> group analysis.

The reference drives an experiment as three separate launches
(commands_list9.sh:4-16: multimodal_kfold_train_cvae_supervised.py, then
multimodal_kfold_test_cvae_supervised.py, then
multimodal_kfold_cvae_group_analysis_1x1.py). Each launch re-reads every
modality CSV, re-fits every per-fold scaler and — on the remote-TPU path —
pays the per-process device-session attach (RESULTS.md: 0.4 s healthy,
minutes when the service is degraded).

Running the chain in ONE process keeps the CSV cache, the per-fold prep
memo, the compiled inference program and the device session alive across
stages; the stage outputs are byte-identical to the three-launch chain
(same mains, same args). Usage:

    python -m multi_modal_normative_modeling_tpu.cli.pipeline \
        -R ADNI -P UCA-gPoE -E 200 -K 10 --fold_parallel

Select stages with --stages (comma-separated subset of train,test,analyze).
"""
from __future__ import annotations

import argparse

from . import common, group_analysis, test_supervised, train_supervised


def build_parser() -> argparse.ArgumentParser:
    parser = train_supervised.build_parser()
    parser.description = __doc__.split('\n')[0]
    parser.add_argument('--stages', dest='stages', default='train,test,analyze',
                        help='comma-separated subset of train,test,analyze '
                             '(in that order).')
    parser.add_argument('--emit_latent', dest='emit_latent',
                        action='store_true',
                        help='also write the per-subject latent CSVs in the '
                             'test stage.')
    parser.add_argument('--fused_inference', dest='fused_inference',
                        action='store_true',
                        help='use the fused Pallas inference kernels in the '
                             'test stage.')
    parser.add_argument('--threshold_method', dest='threshold_method',
                        default='roc',
                        choices=['roc', 'f1', 'pr', 'cost', 'eer'],
                        help="optimal-threshold finder for the analysis "
                             "stage (reference hardcodes 'roc').")
    return parser


def main(args, project_root=None):
    order = ['train', 'test', 'analyze']
    stages = [s.strip() for s in args.stages.split(',') if s.strip()]
    unknown = sorted(set(stages) - set(order))
    if unknown:
        raise ValueError(f'unknown stages {unknown}; choose from {order}')
    stages = [s for s in order if s in stages]
    if getattr(args, 'warmup_only', False) and stages != ['train']:
        # the train stage returns after compiling; running test/analyze
        # against missing or stale checkpoints would be misleading
        print('--warmup_only: skipping the test/analyze stages '
              '(no checkpoints are written)')
        stages = ['train'] if 'train' in stages else []
    stats = None
    for stage in stages:
        if stage == 'train':
            train_supervised.main(args, project_root=project_root)
        elif stage == 'test':
            test_supervised.main(args, project_root=project_root)
        else:
            stats = group_analysis.main(args, project_root=project_root)
    return stats


def run(argv=None, project_root=None):
    args = build_parser().parse_args(argv)
    common.apply_post_parse_defaults(args)
    if getattr(args, 'profile_dir', None):
        from ..utils.profiling import trace

        with trace(args.profile_dir):
            return main(args, project_root=project_root)
    return main(args, project_root=project_root)


if __name__ == '__main__':
    run()
