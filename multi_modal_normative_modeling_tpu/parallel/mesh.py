"""Device meshes and shardings for fold/data-parallel training.

The reference has no parallelism at all (single process, one device —
SURVEY.md section 2.6). The useful scaling axes in this problem are:

  fold  the 5-10 cross-validation folds: embarrassingly parallel training
        problems with identical shapes -> a stacked leading axis, vmapped
        and sharded across chips
  data  the subject/batch dimension inside each fold

We expose them as a 2-D ``jax.sharding.Mesh`` ('fold', 'data'). Parameters
and optimizer state carry a leading fold axis (sharded over 'fold',
replicated over 'data'); batch tensors [F, NB, B, D] shard F over 'fold' and
the in-batch rows B over 'data'. XLA/GSPMD then inserts the only collective
this workload needs — the psum of per-shard loss/grad partial sums over
'data' — which rides ICI within a slice.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_fold: int = 1, n_data: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """A ('fold', 'data') mesh over the available devices.

    ``n_fold * n_data`` must equal the device count; ``n_data`` defaults to
    filling the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_fold:
            raise ValueError(
                f"{len(devices)} devices not divisible into {n_fold} fold groups"
            )
        n_data = len(devices) // n_fold
    if n_fold * n_data != len(devices):
        raise ValueError(
            f"mesh {n_fold}x{n_data} != {len(devices)} devices"
        )
    grid = np.asarray(devices).reshape(n_fold, n_data)
    return Mesh(grid, ("fold", "data"))


def _spec_for_leaf(ndim: int, kind: str) -> P:
    """PartitionSpec for a pytree leaf by its role.

    kind 'param': [F, ...]          -> ('fold', None...)
    kind 'batch': [F, NB, B, ...]   -> ('fold', None, 'data', None...)
    """
    if kind == "param":
        return P("fold", *([None] * (ndim - 1)))
    if kind == "batch":
        if ndim >= 3:
            return P("fold", None, "data", *([None] * (ndim - 3)))
        return P("fold", *([None] * (ndim - 1)))
    raise ValueError(kind)


def fold_data_shardings(mesh: Mesh, params_tree, batches_tree, keys):
    """(params_shardings, batches_shardings, keys_sharding) pytrees of
    NamedShardings for jit in_shardings."""

    def shard(kind):
        return lambda leaf: NamedSharding(
            mesh, _spec_for_leaf(np.ndim(leaf), kind)
        )

    params_sh = jax.tree_util.tree_map(shard("param"), params_tree)
    batches_sh = jax.tree_util.tree_map(shard("batch"), batches_tree)
    keys_sh = NamedSharding(mesh, P("fold", *([None] * (np.ndim(keys) - 1))))
    return params_sh, batches_sh, keys_sh


def make_sweep_mesh(n_config: int, n_fold: Optional[int] = None,
                    devices: Optional[Sequence] = None) -> Mesh:
    """A ('config', 'fold') mesh for the hyperparameter-sweep engine.

    Grid points are embarrassingly parallel (parameters and fold data are
    broadcast, each config's training touches nothing of its neighbours'),
    so sharding the config axis is pure scale-out: the only communication
    GSPMD inserts is the output gather. ``n_fold`` defaults to filling the
    remaining devices with the inner fold axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_fold is None:
        if len(devices) % n_config:
            raise ValueError(
                f"{len(devices)} devices not divisible into "
                f"{n_config} config groups")
        n_fold = len(devices) // n_config
    if n_config * n_fold != len(devices):
        raise ValueError(
            f"mesh {n_config}x{n_fold} != {len(devices)} devices")
    grid = np.asarray(devices).reshape(n_config, n_fold)
    return Mesh(grid, ("config", "fold"))


def sweep_shardings(mesh: Mesh, params_tree, batches_tree, keys, hyper):
    """jit in_shardings for SweepTrainer's (params, batches, keys, hyper).

    params/batches carry a leading fold axis (replicated over 'config'),
    keys are [S, F, ...], hyper leaves are [S].
    """
    def fold0(leaf):
        return NamedSharding(mesh, P("fold", *([None] * (np.ndim(leaf) - 1))))

    params_sh = jax.tree_util.tree_map(fold0, params_tree)
    batches_sh = jax.tree_util.tree_map(fold0, batches_tree)
    keys_sh = NamedSharding(
        mesh, P("config", "fold", *([None] * (np.ndim(keys) - 2))))
    hyper_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, P("config", *([None] * (np.ndim(leaf) - 1)))), hyper)
    return params_sh, batches_sh, keys_sh, hyper_sh
