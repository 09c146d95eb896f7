"""Whole-fold trainers for the packed regression variant.

Same contracts as train/packed_endtoend.py's trainers (reference hot loop
multimodal_kfold_train_cvae_supervised_regression.py:86-160), with the
layout swapped for models/grouped_regression.GroupedRegressionCVAE and —
uniquely in the packed zoo — the reference's per-epoch SHUFFLING
(regression:94) supported via ``grouped_shuffle_fn``: the packed x leaves
are [NB, G, B, d] (sample axis 2), so the stock reshuffle (sample axis 1)
cannot apply; the grouped variant consumes the SAME permutation stream on
the moved axes, keeping trajectories equal to the per-modality shuffled
run to float-reorder tolerance (tests/test_packed_regression.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.grouped_regression import GroupedRegressionCVAE
from .grouped import make_grouped_fold_batches
from .packed import (
    _pack_params_host,
    _unpack_params_host,
    fetch_host,
    packed_template_fn,
    pad_stack_fold_batches,
    stack_packed_params,
    unpack_per_fold,
)
from .trainer import (
    TrainConfig,
    add_batch_meta,
    build_optimizer,
    build_train_fn,
)


def regression_state_dirname(fold: "int | None" = None) -> str:
    return ("grouped-reg-state" if fold is None
            else f"{fold:03d}-grouped-reg-state")


def grouped_shuffle_fn(batches, key):
    """Per-epoch reshuffle on the grouped batch layout: one permutation of
    the NB*B sample slots (same stream as build_train_fn's stock
    reshuffle), applied to every per-sample leaf — x leaves via a
    moveaxis because their sample axis is 2."""
    nb, bs = batches["mask"].shape
    perm = jax.random.permutation(key, nb * bs)

    def rows(a):                         # [NB, B, ...] leaves
        flat = a.reshape((nb * bs,) + a.shape[2:])
        return flat[perm].reshape(a.shape)

    def xg(a):                           # [NB, G, B, d] leaves
        moved = jnp.moveaxis(a, 2, 1)    # [NB, B, G, d]
        flat = moved.reshape((nb * bs,) + moved.shape[2:])
        out = flat[perm].reshape(moved.shape)
        return jnp.moveaxis(out, 1, 2)

    out = dict(batches)
    out["x"] = tuple(xg(x) for x in batches["x"])
    leaves = {"c": batches["c"], "mask": batches["mask"]}
    if "extras" in batches:
        leaves["extras"] = batches["extras"]
    shuffled = jax.tree_util.tree_map(rows, leaves)
    out.update(shuffled)
    out["valid"] = out["mask"].sum(axis=1) > 0
    return out


def make_regression_fold_batches(grouped: GroupedRegressionCVAE,
                                 data_list: Sequence[np.ndarray],
                                 cov: np.ndarray, fi: np.ndarray,
                                 batch_size: int) -> dict:
    b = make_grouped_fold_batches(grouped, data_list, cov, batch_size)
    n = data_list[0].shape[0]
    nb = b["mask"].shape[0]
    packed_fi = np.zeros((nb * batch_size, 1), np.float32)
    packed_fi[:n, 0] = np.asarray(fi, np.float32).reshape(-1)
    b["extras"] = {"fi": packed_fi.reshape(nb, batch_size, 1)}
    return b


def _regression_loss_fn(grouped: GroupedRegressionCVAE, combine: str):
    """Mirrors cli/regression.py's per-modality loss_fn on the packed
    layout (lambda_reg fixed at 1.0, the reference's value)."""

    def loss_fn(p, batch, k):
        fwd = grouped.forward(p, batch["x"], batch["c"], k, combine)
        losses = grouped.loss(p, batch["x"], fwd,
                              batch["extras"]["fi"][:, 0],
                              lambda_reg=1.0, mask=batch["mask"])
        return losses["total"], losses

    return loss_fn


class GroupedRegressionTrainer:
    """Sequential whole-fold trainer on the packed regression layout."""

    def __init__(self, model, config: TrainConfig, n_samples: int):
        self.grouped = GroupedRegressionCVAE(
            model.input_dim_list, model.base.hidden_dim,
            model.base.latent_dim, model.base.c_dim, model.modalities,
            model.base.non_linear)
        self.config = config
        self.loss_meta = add_batch_meta(
            {"loss": "packed_grouped_regression",
             "precision": config.precision}, config)
        self.optimizer = build_optimizer(config, n_samples)
        self._raw_train = build_train_fn(
            _regression_loss_fn(self.grouped, config.combine),
            self.optimizer, config.epochs, shuffle=config.shuffle,
            shuffle_fn=grouped_shuffle_fn)
        self._train = jax.jit(self._raw_train)
        self._chunk_cache: dict = {}

    def _packed(self, per_modality_params):
        memo = getattr(self, "_pack_memo", None)
        if memo is not None and memo[0] is per_modality_params:
            return memo[1]
        packed = _pack_params_host(self.grouped, per_modality_params)
        self._pack_memo = (per_modality_params, packed)
        return packed

    def _batches(self, data_list, cov, fi):
        return jax.device_put(make_regression_fold_batches(
            self.grouped, data_list, cov, fi, self.config.batch_size))

    def run(self, per_modality_params, data_list, cov, fi, key):
        packed = self._packed(per_modality_params)
        out, logs = self._train(packed, self._batches(data_list, cov, fi),
                                key)
        return (_unpack_params_host(self.grouped, fetch_host(out)),
                fetch_host(logs))

    def chunk_fn(self, n_epochs: int):
        if n_epochs not in self._chunk_cache:
            import functools

            self._chunk_cache[n_epochs] = jax.jit(functools.partial(
                self._raw_train.chunk, n_epochs))
        return self._chunk_cache[n_epochs]

    def run_resumable(self, per_modality_params, data_list, cov, fi, key,
                      state_dir, checkpoint_every: int,
                      resume: bool = True):
        from .checkpoints import run_chunked

        packed = self._packed(per_modality_params)
        batches = self._batches(data_list, cov, fi)
        template_fn = packed_template_fn(self.optimizer, packed, key)

        def run_chunk(n, p, opt_state, k):
            if opt_state is None:
                opt_state = jax.jit(self.optimizer.init)(p)
            return self.chunk_fn(n)(p, opt_state, k, batches)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, packed, None,
                                   key, run_chunk, template_fn,
                                   meta=self.loss_meta)
        return _unpack_params_host(self.grouped, fetch_host(params)), logs


class GroupedRegressionMultiTrainer(GroupedRegressionTrainer):
    """vmap(packed regression whole-fold trainer) over a stacked fold
    axis. Callers must ensure equal per-fold batch grids when shuffling
    (cli/regression.py falls back to sequential otherwise, mirroring
    run_folds' shuffle-grid contract)."""

    def __init__(self, model, config: TrainConfig, n_samples: int):
        super().__init__(model, config, n_samples)
        self.loss_meta = dict(self.loss_meta, path="fold_parallel")
        self._vtrain = jax.jit(jax.vmap(self._raw_train))

    def _stack_packed(self, params_list):
        return stack_packed_params(self.grouped, params_list)

    def pack_folds(self, folds) -> dict:
        """folds: list of (data_list, cov, fi); padded to the largest
        fold's batch grid."""
        per_fold = [make_regression_fold_batches(
            self.grouped, d, c, fi, self.config.batch_size)
            for d, c, fi in folds]
        return pad_stack_fold_batches(per_fold)

    def _per_fold(self, out, logs, n_folds):
        return unpack_per_fold(self.grouped, out, logs, n_folds)

    def run(self, params_list, folds, keys):
        stacked_params = self._stack_packed(params_list)
        batches = jax.device_put(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        out, logs = self._vtrain(stacked_params, batches, keys)
        return self._per_fold(out, logs, len(params_list))

    def run_resumable(self, params_list, folds, keys, state_dir,
                      checkpoint_every: int, resume: bool = True):
        from .checkpoints import run_chunked

        stacked_params = self._stack_packed(params_list)
        batches = jax.device_put(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        init_opt = jax.jit(jax.vmap(self.optimizer.init))
        template_fn = packed_template_fn(self.optimizer, stacked_params,
                                         keys, vmapped=True)

        def _chunk_jit(n):
            # namespaced key: chunk_fn (inherited, un-vmapped) shares this
            # cache dict and must never collide with the vmapped programs
            if ("v", n) not in self._chunk_cache:
                import functools

                self._chunk_cache[("v", n)] = jax.jit(jax.vmap(
                    functools.partial(self._raw_train.chunk, n)))
            return self._chunk_cache[("v", n)]

        def run_chunk(n, p, opt_state, k):
            if opt_state is None:
                opt_state = init_opt(p)
            return _chunk_jit(n)(p, opt_state, k, batches)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, stacked_params,
                                   None, keys, run_chunk, template_fn,
                                   logs_concat_axis=1, meta=self.loss_meta)
        return self._per_fold(params, logs, len(params_list))
