"""Whole-fold trainers for the packed dual-bank endtoend model.

Same contracts as train/grouped.py's trainers (reference hot loop
multimodal_kfold_cvae_nmpmcont.py:296-315), with the layout swapped for
models/grouped_endtoend.GroupedEndToEnd: both decoder banks ride one [2M]
batched-einsum axis, width-dependent ops run per width group at exact
width. The BatchNorm running statistics update exactly like the
per-modality path: the loss aux carries ``__bn_state__`` and
build_train_fn's ``state_update`` writes it back after the optimizer step
(all-padding batches skip both, keeping padded-grid trajectories
bit-identical).

PRNG streams match the per-modality run_folds path exactly (same
per-epoch/per-step splits; the model does the same 3-way split for
z/dropout), so trajectories agree to float-reorder tolerance
(tests/test_packed_endtoend.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.grouped_endtoend import GroupedEndToEnd
from .grouped import make_grouped_fold_batches
from .packed import (
    _pack_params_host,
    _unpack_params_host,
    fetch_host,
    globalize_tree,
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


def endtoend_state_dirname(fold: "int | None" = None) -> str:
    """Resumable-state dir naming for the packed endtoend layout (its own
    trajectory family — the state pytree is the grouped dual-bank tree)."""
    return ("grouped-e2e-state" if fold is None
            else f"{fold:03d}-grouped-e2e-state")


def make_endtoend_fold_batches(grouped: GroupedEndToEnd,
                               data_list: Sequence[np.ndarray],
                               cov: np.ndarray, labels: np.ndarray,
                               batch_size: int) -> dict:
    """make_grouped_fold_batches + the per-sample labels extras block
    (batched [NB, B, 1] float like trainer.make_batches extras)."""
    b = make_grouped_fold_batches(grouped, data_list, cov, batch_size)
    n = data_list[0].shape[0]
    nb = b["mask"].shape[0]
    lab = np.zeros((nb * batch_size, 1), np.float32)
    lab[:n, 0] = np.asarray(labels, np.float32).reshape(-1)
    b["extras"] = {"labels": lab.reshape(nb, batch_size, 1)}
    return b


def _endtoend_loss_fn(grouped: GroupedEndToEnd, margin: float,
                      weight_contrastive: float):
    """Mirrors cli/nmpmcont.py's per-modality loss_fn on the packed layout
    (loss_function called with only margin + weightcontrastive — the
    reference quirk; effective kl/rec weights are the method defaults)."""

    def loss_fn(p, batch, k):
        labels = batch["extras"]["labels"][:, 0].astype(jnp.int32)
        fwd = grouped.forward(p, batch["x"], batch["c"], k, train=True,
                              mask=batch["mask"])
        losses = grouped.loss(p, batch["x"], fwd, labels, margin=margin,
                              weight_contrastive=weight_contrastive,
                              mask=batch["mask"])
        losses["__bn_state__"] = fwd["bn_state"]
        return losses["total_loss"], losses

    return loss_fn


def _bn_update(params, aux):
    return {**params, "bn_state": aux["__bn_state__"]}


class GroupedEndToEndTrainer:
    """Sequential whole-fold trainer on the packed dual-bank layout."""

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 margin: float, weight_contrastive: float):
        assert not config.shuffle, "packed trainers train in fixed batch order"
        self.grouped = GroupedEndToEnd(
            model.input_dim_list, model.hidden_dim, model.latent_dim,
            model.c_dim, model.modalities, model.non_linear,
            model.classifier_layers, model.dropout_rate, model.num_classes)
        self.config = config
        # the contrastive hyperparameters shape the gradient sequence, so
        # they join the resume fingerprint
        self.loss_meta = add_batch_meta(
            {"loss": "packed_grouped_endtoend",
             "precision": config.precision, "margin": str(margin),
             "wcon": str(weight_contrastive)}, config)
        self.optimizer = build_optimizer(config, n_samples)
        self._raw_train = build_train_fn(
            _endtoend_loss_fn(self.grouped, margin, weight_contrastive),
            self.optimizer, config.epochs, shuffle=False,
            state_update=_bn_update)
        self._train = jax.jit(self._raw_train)
        self._chunk_cache: dict = {}

    def _packed(self, per_modality_params):
        memo = getattr(self, "_pack_memo", None)
        if memo is not None and memo[0] is per_modality_params:
            return memo[1]
        packed = _pack_params_host(self.grouped, per_modality_params)
        self._pack_memo = (per_modality_params, packed)
        return packed

    def _batches(self, data_list, cov, labels):
        return jax.device_put(make_endtoend_fold_batches(
            self.grouped, data_list, cov, labels, self.config.batch_size))

    def run(self, per_modality_params, data_list, cov, labels, key):
        packed = self._packed(per_modality_params)
        out, logs = self._train(packed, self._batches(data_list, cov,
                                                      labels), key)
        return (_unpack_params_host(self.grouped, fetch_host(out)),
                fetch_host(logs))

    def chunk_fn(self, n_epochs: int):
        if n_epochs not in self._chunk_cache:
            import functools

            self._chunk_cache[n_epochs] = jax.jit(functools.partial(
                self._raw_train.chunk, n_epochs))
        return self._chunk_cache[n_epochs]

    def run_resumable(self, per_modality_params, data_list, cov, labels,
                      key, state_dir, checkpoint_every: int,
                      resume: bool = True):
        from .checkpoints import run_chunked

        packed = self._packed(per_modality_params)
        batches = self._batches(data_list, cov, labels)
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


class GroupedEndToEndMultiTrainer(GroupedEndToEndTrainer):
    """vmap(packed endtoend whole-fold trainer) over a stacked fold axis:
    [F, NB, 2M, B, d] decoder operands — every fold's dual-bank step in one
    device program.

    With ``mesh``/``shardings_fn`` (a ('fold','modality','data') mesh +
    parallel/modality.grouped_e2e_fold_shardings) the program additionally
    shards folds, the [2M] dual-bank decoder axis (and every divisible
    width-group axis) over 'modality', and batch rows over 'data' — the
    round-5 EP composition reaching the zoo's longest-chain model."""

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 margin: float, weight_contrastive: float, mesh=None,
                 shardings_fn=None):
        super().__init__(model, config, n_samples, margin,
                         weight_contrastive)
        if (mesh is None) != (shardings_fn is None):
            raise ValueError("mesh and shardings_fn go together")
        if mesh is not None and "modality" in mesh.axis_names and \
                (2 * self.grouped.modalities) % mesh.shape["modality"]:
            raise ValueError(
                f"dual-bank axis 2M={2 * self.grouped.modalities} not "
                f"divisible over the {mesh.shape['modality']}-way "
                "'modality' mesh axis")
        self.mesh = mesh
        self._shardings_fn = shardings_fn
        path = "fold_parallel" if mesh is None else (
            "fold_parallel+ep:" + ",".join(
                f"{n}={mesh.shape[n]}" for n in mesh.axis_names))
        self.loss_meta = dict(self.loss_meta, path=path)
        self._vmapped = jax.vmap(self._raw_train)
        self._jitted = None

    def _vtrain(self, stacked_params, batches, keys):
        if self._jitted is None:
            if self.mesh is not None:
                shardings = self._shardings_fn(self.mesh, stacked_params,
                                               batches, keys)
                self._jitted = jax.jit(self._vmapped,
                                       in_shardings=shardings)
            else:
                self._jitted = jax.jit(self._vmapped)
        return self._jitted(stacked_params, batches, keys)

    def _place(self, batches):
        # with a mesh, jit's in_shardings place the shards; a device_put
        # would commit the whole batch pytree to one device first
        return batches if self.mesh is not None else jax.device_put(batches)

    def _stack_packed(self, params_list):
        return stack_packed_params(self.grouped, params_list)

    def pack_folds(self, folds) -> dict:
        """folds: list of (data_list, cov, labels); every fold padded to
        the largest fold's batch grid (labels extras ride the same pad)."""
        per_fold = [make_endtoend_fold_batches(
            self.grouped, d, c, lab, self.config.batch_size)
            for d, c, lab in folds]
        return pad_stack_fold_batches(per_fold)

    def _per_fold(self, out, logs, n_folds):
        return unpack_per_fold(self.grouped, out, logs, n_folds)

    def _globalize_operands(self, stacked_params, batches, keys):
        """Multi-controller placement (packed.globalize_tree): numpy
        operands cannot carry non-trivial in_shardings across processes."""
        if self.mesh is None or jax.process_count() == 1:
            return stacked_params, batches, keys
        p_sh, b_sh, k_sh = self._shardings_fn(self.mesh, stacked_params,
                                              batches, keys)
        return (globalize_tree(stacked_params, p_sh),
                globalize_tree(batches, b_sh),
                globalize_tree(keys, k_sh))

    def run(self, params_list, folds, keys):
        stacked_params = self._stack_packed(params_list)
        batches = self._place(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        stacked_params, batches, keys = self._globalize_operands(
            stacked_params, batches, keys)
        out, logs = self._vtrain(stacked_params, batches, keys)
        return self._per_fold(out, logs, len(params_list))

    def _chunk_jit(self, n: int, p, opt_state, k, batches):
        # namespaced key: chunk_fn (inherited, un-vmapped) shares this
        # cache dict and must never collide with the vmapped programs;
        # meshed in_shardings mirror run()'s
        if ("v", n) not in self._chunk_cache:
            import functools

            chunk = jax.vmap(functools.partial(self._raw_train.chunk, n))
            if self.mesh is not None:
                p_sh, b_sh, k_sh = self._shardings_fn(self.mesh, p,
                                                      batches, k)
                o_sh = self._shardings_fn.opt(self.mesh, opt_state, p,
                                              p_sh)
                self._chunk_cache[("v", n)] = jax.jit(
                    chunk, in_shardings=(p_sh, o_sh, k_sh, b_sh))
            else:
                self._chunk_cache[("v", n)] = jax.jit(chunk)
        return self._chunk_cache[("v", n)]

    def run_resumable(self, params_list, folds, keys, state_dir,
                      checkpoint_every: int, resume: bool = True):
        from .checkpoints import run_chunked

        stacked_params = self._stack_packed(params_list)
        batches = self._place(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        init_opt = jax.jit(jax.vmap(self.optimizer.init))
        template_fn = packed_template_fn(self.optimizer, stacked_params,
                                         keys, vmapped=True)

        def run_chunk(n, p, opt_state, k):
            # multi-controller: first-chunk AND resume-restored states are
            # host numpy — globalize per chunk (mirrors
            # PackedMultiFoldTrainer.run_resumable)
            if self.mesh is not None and jax.process_count() > 1:
                p_sh, _, k_sh = self._shardings_fn(self.mesh, p, batches, k)
                p = globalize_tree(p, p_sh)
                k = globalize_tree(k, k_sh)
                if opt_state is not None:
                    o_sh = self._shardings_fn.opt(self.mesh, opt_state, p,
                                                  p_sh)
                    opt_state = globalize_tree(opt_state, o_sh)
            if opt_state is None:
                opt_state = init_opt(p)
            return self._chunk_jit(n, p, opt_state, k, batches)(
                p, opt_state, k, batches)

        if self.mesh is not None and jax.process_count() > 1:
            _, b_sh, _ = self._shardings_fn(self.mesh, stacked_params,
                                            batches, keys)
            batches = globalize_tree(batches, b_sh)
        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, stacked_params,
                                   None, keys, run_chunk, template_fn,
                                   logs_concat_axis=1, meta=self.loss_meta)
        return self._per_fold(params, logs, len(params_list))
