"""Hyperparameter-sweep engine: an entire (config x fold) grid as ONE
device program.

The reference explores hyperparameters with bash loops re-launching Python
per grid point (commands_list9_endtoend.sh: margins x contrastive weights x
classifier shapes x ...). Here, loss hyperparameters (margin, loss weights,
lambdas — anything that doesn't change tensor shapes) become *traced* scalars
and the whole grid trains under a double vmap:

    inner vmap: folds   (params/batches/keys fold axis)
    outer vmap: configs (params replicated, data broadcast, hyper axis)

Because the training step is dependency-chain bound at these model sizes
(RESULTS.md), widening the grid is nearly free on-chip: S x F training runs
cost roughly the same wall-clock as one.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..train.trainer import TrainConfig, build_optimizer, build_train_fn
from .folds import stack_params


def stack_hypers(configs: Sequence[dict]) -> dict:
    """List of {name: scalar} dicts -> {name: [S] array} pytree."""
    keys = sorted(configs[0])
    for c in configs:
        assert sorted(c) == keys, "all sweep configs need the same keys"
    return {k: jnp.asarray([float(c[k]) for c in configs], jnp.float32)
            for k in keys}


class SweepTrainer:
    """Train S hyperparameter configs x F folds concurrently.

    ``loss_fn(params, batch, key, hyper)`` consumes the per-config hyper
    pytree (scalars under vmap). Fold data is shared across configs
    (broadcast — never materialized S times).
    """

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 loss_fn: Callable,
                 state_update: Optional[Callable] = None):
        # ``model`` is accepted for call-site symmetry with the other
        # trainers but unused: loss_fn fully defines the computation
        del model
        optimizer = build_optimizer(config, n_samples)
        train = build_train_fn(loss_fn, optimizer, config.epochs,
                               config.shuffle, state_update=state_update,
                               with_hyper=True)
        # inner: folds; outer: configs (params AND data broadcast across
        # configs by in_axes=None — no S-fold copies ever materialize)
        fold_vmap = jax.vmap(train, in_axes=(0, 0, 0, None))
        self._train = jax.jit(jax.vmap(fold_vmap,
                                       in_axes=(None, None, 0, 0)))

    def run(self, params_list_per_fold, batches, keys, configs: Sequence[dict]
            ) -> Tuple[list, list]:
        """params_list_per_fold: one params pytree per fold (shared across
        configs, as the reference's fixed-seed re-init per grid point);
        batches: stacked fold batches [F, ...]; keys: [S, F] PRNG keys;
        configs: list of hyper dicts.

        Returns (params[S][F] nested host pytrees, logs[S][F] dicts).
        """
        n_configs = len(configs)
        n_folds = len(params_list_per_fold)
        fold_params = stack_params(params_list_per_fold)          # [F, ...]
        hyper = stack_hypers(configs)
        out_params, logs = self._train(fold_params, batches, keys, hyper)

        host_params = jax.device_get(out_params)  # numpy leaves
        host_logs = jax.device_get(logs)
        params_grid = [
            [jax.tree_util.tree_map(lambda a: a[s, f], host_params)
             for f in range(n_folds)]
            for s in range(n_configs)
        ]
        logs_grid = [
            [{k: v[s, f] for k, v in host_logs.items()}
             for f in range(n_folds)]
            for s in range(n_configs)
        ]
        return params_grid, logs_grid
