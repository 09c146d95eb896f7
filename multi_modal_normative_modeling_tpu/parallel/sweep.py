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
from .mesh import sweep_shardings


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
                 state_update: Optional[Callable] = None, mesh=None):
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
        self._vtrain = jax.vmap(fold_vmap, in_axes=(None, None, 0, 0))
        # with a ('config', 'fold') mesh the grid scales out across chips:
        # configs are independent training runs, so GSPMD's only collective
        # is the output gather (mesh.py make_sweep_mesh / sweep_shardings)
        self.mesh = mesh
        self._jitted = None
        self._shardings = None

    def _jit(self, fold_params, batches, keys, hyper):
        if self.mesh is None:
            if self._jitted is None:
                self._jitted = jax.jit(self._vtrain)
            return self._jitted
        n_configs = len(jax.tree_util.tree_leaves(hyper)[0])
        n_folds = jax.tree_util.tree_leaves(fold_params)[0].shape[0]
        for axis, extent in (("config", n_configs), ("fold", n_folds)):
            size = self.mesh.shape[axis]
            if extent % size:
                raise ValueError(
                    f"sweep mesh: {extent} {axis}s not divisible by the "
                    f"{axis!r} mesh axis ({size})")
        # recompute per call: a later run() with different-rank trees must
        # not reuse the first call's sharding specs (cheap tree_map; equal
        # shardings keep the jit cache hit)
        shardings = sweep_shardings(self.mesh, fold_params, batches,
                                    keys, hyper)
        if self._jitted is None or shardings != self._shardings:
            self._shardings = shardings
            self._jitted = jax.jit(self._vtrain,
                                   in_shardings=self._shardings)
        return self._jitted

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
        train = self._jit(fold_params, batches, keys, hyper)
        if self.mesh is not None:
            # reshard explicitly: callers may hand over arrays already
            # committed to one device (e.g. an eager device_put), which jit
            # would otherwise refuse to silently re-lay-out
            p_sh, b_sh, k_sh, h_sh = self._shardings
            fold_params = jax.device_put(fold_params, p_sh)
            batches = jax.device_put(batches, b_sh)
            keys = jax.device_put(keys, k_sh)
            hyper = jax.device_put(hyper, h_sh)
        out_params, logs = train(fold_params, batches, keys, hyper)

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
