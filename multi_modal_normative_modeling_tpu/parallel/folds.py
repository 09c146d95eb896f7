"""Fold-vectorized training: every CV fold trains concurrently.

The reference trains the k folds sequentially
(multimodal_kfold_train_cvae_supervised.py:68-212). Here per-fold parameters
are stacked along a leading axis and the whole-fold jitted trainer
(train/trainer.py) is vmapped over it, so one device executes all folds'
matmuls batched together (k times the MXU work per kernel launch — these MLPs
are far too small to saturate a chip on their own), and a ('fold', 'data')
mesh spreads folds/batches across chips (SURVEY.md Q7: ragged fold sizes are
padded with masked rows, so per-fold numerics match the sequential run).
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..train.trainer import (
    TrainConfig,
    build_optimizer,
    build_train_fn,
    make_batches,
)
from jax.sharding import NamedSharding

from .mesh import _spec_for_leaf, fold_data_shardings


def stack_params(params_list: Sequence) -> dict:
    """Stack per-fold parameter pytrees along a new leading fold axis.

    Host (numpy) trees stack in numpy — through the remote-TPU tunnel each
    jnp.stack would be an eager op (a compile + round trip per leaf); the
    stacked tree uploads once at the jit boundary instead."""
    if all(isinstance(leaf, np.ndarray)
           for leaf in jax.tree_util.tree_leaves(params_list[0])):
        return jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves), *params_list
        )
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *params_list
    )


def milestone_scan(milestones, params, opt_state, key, batches,
                   chunk_fn_for, cache, emit):
    """Shared milestone-iteration engine behind
    MultiFoldTrainer.run_milestones and PackedMultiFoldTrainer.run_milestones
    (one reuse policy, one log accumulator — the two must not drift).

    Trains to each milestone epoch (ascending) in turn, yielding
    ``(milestone,) + emit(params, logs_acc)`` after each. Chunked scans are
    prefix-bit-identical to one long scan, so one training run to
    max(milestones) serves every requested epoch count
    (tests/test_sweep_supervised.py).

    ``chunk_fn_for(size, params, opt_state, key, batches)`` returns the
    jitted chunk program for ``size`` epochs; ``cache`` is its compiled-size
    dict, consulted by the reuse policy: an already-compiled chunk size is
    re-dispatched up to 16x rather than compiling the exact delta (a compile
    is ~1 s persistent-cache-hit / 10-30 s server-cold through the tunnel vs
    ~0.1 s per extra dispatch).
    """
    logs_acc, cur = None, 0
    for m in milestones:
        if m < cur:
            raise ValueError(f"milestones must ascend, got {milestones}")
        if m > cur:
            delta = m - cur
            divisors = [s for s in cache
                        if delta % s == 0 and delta // s <= 16]
            if delta in cache or not divisors:
                size, reps = delta, 1
            else:
                size = max(divisors)
                reps = delta // size
            fn = chunk_fn_for(size, params, opt_state, key, batches)
            rep_logs = []
            for _ in range(reps):
                params, opt_state, key, logs = fn(params, opt_state, key,
                                                  batches)
                rep_logs.append(logs)  # keep on device: reps pipeline
            host_reps = jax.tree_util.tree_map(
                np.asarray, jax.device_get(rep_logs))  # one fetch
            for host_logs in host_reps:
                logs_acc = host_logs if logs_acc is None else {
                    k: np.concatenate([logs_acc[k], host_logs[k]], axis=1)
                    for k in host_logs
                }
            cur = m
        yield (m,) + tuple(emit(params, logs_acc))


def unstack_params(stacked, n_folds: int) -> List:
    """Slice the leading fold axis. Prefer passing host (numpy) trees: on
    device arrays each slice is an eager dispatch (a compile + round trip
    per leaf per fold on the remote-TPU path)."""
    return [
        jax.tree_util.tree_map(lambda leaf: leaf[i], stacked)
        for i in range(n_folds)
    ]


def stack_fold_batches(per_fold_data: Sequence[Sequence[np.ndarray]],
                       per_fold_cov: Sequence[Sequence[np.ndarray]],
                       batch_size: int,
                       extras: Optional[Sequence[dict]] = None) -> dict:
    """Build the [F, NB, B, ...] batch pytree from per-fold sample arrays.

    Folds may differ in sample count; every fold is padded to the largest
    fold's batch grid with masked rows.
    """
    n_folds = len(per_fold_data)
    max_n = max(d[0].shape[0] for d in per_fold_data)
    nb = max(1, -(-max_n // batch_size))

    fold_batches = []
    for f in range(n_folds):
        b = make_batches(per_fold_data[f], per_fold_cov[f], batch_size,
                         extras[f] if extras else None)
        cur_nb = b["mask"].shape[0]
        if cur_nb < nb:
            def pad(a):
                widths = [(0, nb - cur_nb)] + [(0, 0)] * (a.ndim - 1)
                return np.pad(a, widths)
            b = jax.tree_util.tree_map(pad, b)
        fold_batches.append(b)
    return jax.tree_util.tree_map(
        lambda *leaves: np.stack(leaves), *fold_batches
    )


class MultiFoldTrainer:
    """vmap(whole-fold trainer) over the stacked fold axis, optionally pjit
    over a ('fold', 'data') mesh."""

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 loss_fn: Optional[Callable] = None, mesh=None,
                 state_update: Optional[Callable] = None,
                 shardings_fn: Optional[Callable] = None):
        self.model = model
        self.config = config
        self.mesh = mesh
        # how (params, batches, keys) map onto the mesh; the default is
        # fold/data (mesh.py), tensor.fold_model_shardings adds the
        # tensor-parallel 'model' axis for wide layer stacks
        self._shardings_fn = shardings_fn or fold_data_shardings
        optimizer = build_optimizer(config, n_samples)
        from ..train.trainer import resolve_loss

        loss_fn, self.loss_meta = resolve_loss(model, config, loss_fn)
        self.optimizer = optimizer
        train = build_train_fn(loss_fn, optimizer, config.epochs,
                               config.shuffle, state_update=state_update)
        self._raw_train = train
        self._vtrain = jax.vmap(train)
        self._jitted = None
        self._chunk_cache: dict = {}

    def run(self, stacked_params, stacked_batches, keys) -> Tuple[dict, dict]:
        """keys: [F, 2] PRNG keys (one stream per fold)."""
        if self.mesh is not None:
            shardings = self._shardings_fn(
                self.mesh, stacked_params, stacked_batches, keys)
            if self._jitted is None:
                self._jitted = jax.jit(self._vtrain, in_shardings=shardings)
            if jax.process_count() > 1:
                # multi-host: numpy inputs can't be auto-sharded across
                # processes; build global arrays (host values are identical
                # on every process, so each process donates its local shards)
                stacked_params, stacked_batches, keys = (
                    self._globalize(stacked_params, shardings[0]),
                    self._globalize(stacked_batches, shardings[1]),
                    self._globalize(keys, shardings[2]),
                )
        elif self._jitted is None:
            self._jitted = jax.jit(self._vtrain)
        params, logs = self._jitted(stacked_params, stacked_batches, keys)
        return params, logs

    def compile(self, stacked_params, stacked_batches, keys) -> float:
        """Lower + compile the fold-parallel program without running it
        (populates jax's persistent compilation cache); returns seconds."""
        import time

        if self.mesh is not None and self._jitted is None:
            shardings = self._shardings_fn(
                self.mesh, stacked_params, stacked_batches, keys)
            self._jitted = jax.jit(self._vtrain, in_shardings=shardings)
        elif self._jitted is None:
            self._jitted = jax.jit(self._vtrain)
        t0 = time.perf_counter()
        self._jitted.lower(stacked_params, stacked_batches, keys).compile()
        return time.perf_counter() - t0

    def _opt_sh(self, opt_state, params, params_sh):
        """Shardings for an explicit optimizer-state argument. Strategy
        modules that shard params non-uniformly (tensor.py) expose an
        ``opt`` attribute mirroring the param shardings into the optax
        momentum blocks; the fold/data default shards every leaf on its
        leading fold axis."""
        custom = getattr(self._shardings_fn, "opt", None)
        if custom is not None:
            return custom(self.mesh, opt_state, params, params_sh)
        return jax.tree_util.tree_map(
            lambda leaf: NamedSharding(
                self.mesh, _spec_for_leaf(np.ndim(leaf), "param")),
            opt_state)

    def _globalize(self, tree, sh_tree):
        """Host numpy pytree -> global sharded arrays (multi-process: every
        process holds the same host values and donates its local shards).
        Leaves that are already device arrays (e.g. a previous chunk's
        outputs) pass through untouched."""

        def conv(a, s):
            if isinstance(a, jax.Array):
                return a
            return jax.make_array_from_callback(
                np.shape(a), s, lambda idx, _a=a: np.asarray(_a)[idx])

        return jax.tree_util.tree_map(conv, tree, sh_tree)

    def _chunk_fn(self, n_epochs: int, example_args=None):
        """Jitted vmapped chunk; with a mesh, in_shardings mirror run()'s
        (params/opt_state over 'fold', batches over ('fold', 'data'))."""
        if n_epochs not in self._chunk_cache:
            import functools

            chunk = jax.vmap(functools.partial(self._raw_train.chunk,
                                               n_epochs))
            if self.mesh is not None and example_args is not None:
                params, opt_state, keys, batches = example_args
                p_sh, b_sh, k_sh = self._shardings_fn(
                    self.mesh, params, batches, keys)
                o_sh = self._opt_sh(opt_state, params, p_sh)
                self._chunk_cache[n_epochs] = jax.jit(
                    chunk, in_shardings=(p_sh, o_sh, k_sh, b_sh))
            else:
                self._chunk_cache[n_epochs] = jax.jit(chunk)
        return self._chunk_cache[n_epochs]

    def run_milestones(self, stacked_params, stacked_batches, keys,
                       milestones):
        """Train to each milestone epoch (ascending) in turn, yielding
        ``(epoch, host_params, host_logs)`` after each — one training run to
        max(milestones) serves every requested epoch count.

        Chunked scans are bit-identical to a single scan of the same length
        (tests/test_resume.py), and an E-epoch prefix of a longer run is
        bit-identical to an E-epoch run: the per-epoch PRNG/optimizer streams
        don't depend on the total scan length. This collapses the epochs axis
        of a hyperparameter grid (cli/sweep_supervised.py).
        """
        opt_state = jax.jit(jax.vmap(self.optimizer.init))(stacked_params)

        def chunk_for(size, p, o, k, b):
            return self._chunk_fn(size, example_args=(p, o, k, b))

        def emit(params, logs_acc):
            return (jax.tree_util.tree_map(np.asarray,
                                           jax.device_get(params)),
                    logs_acc)

        yield from milestone_scan(milestones, stacked_params, opt_state,
                                  keys, stacked_batches, chunk_for,
                                  self._chunk_cache, emit)

    def run_resumable(self, stacked_params, stacked_batches, keys, state_dir,
                      checkpoint_every: int, resume: bool = True):
        """Fold-parallel chunked training with atomic whole-run train-state
        checkpoints (stacked params + stacked optax state + per-fold PRNG
        keys + epoch cursor). Bit-identical to the single-scan run; honors
        the trainer's mesh like run()."""
        from ..train.checkpoints import run_chunked

        init_opt = jax.jit(jax.vmap(self.optimizer.init))

        def template_fn():
            shape = jax.eval_shape(jax.vmap(self.optimizer.init),
                                   stacked_params)
            return {"params": stacked_params, "key": keys,
                    "opt_state": jax.tree_util.tree_map(
                        lambda s: np.zeros(s.shape, s.dtype), shape)}

        batches = stacked_batches
        multiproc = jax.process_count() > 1

        def run_chunk(n, p, opt_state, k):
            nonlocal batches
            if opt_state is None:
                opt_state = init_opt(p)
            fn = self._chunk_fn(n, example_args=(p, opt_state, k, batches))
            if self.mesh is not None and multiproc:
                p_sh, b_sh, k_sh = self._shardings_fn(self.mesh, p, batches,
                                                      k)
                o_sh = self._opt_sh(opt_state, p, p_sh)
                p = self._globalize(p, p_sh)
                opt_state = self._globalize(opt_state, o_sh)
                k = self._globalize(k, k_sh)
                batches = self._globalize(batches, b_sh)
            return fn(p, opt_state, k, batches)

        # vmapped chunk logs come back [F, n]; accumulate on the epoch axis
        return run_chunked(state_dir, self.config.epochs, checkpoint_every,
                           resume, stacked_params, None, keys, run_chunk,
                           template_fn, logs_concat_axis=1,
                           meta=self.loss_meta)
