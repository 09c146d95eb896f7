"""Out-of-core (HBM-exceeding) whole-fold training: streamed batch shards.

The resident trainers (trainer.py, parallel/folds.py) device_put the whole
fold's batch tensor once and scan on-chip — the right design whenever the
cohort fits HBM (RESULTS.md: upload once, 19 s compile, 0.2 s for 5 folds x
20 epochs at PPMI width). But a biobank-scale cohort does not fit: 500 k
subjects x 3 x 3485 fp32 features is ~20 GB against a v5e's 16 GB. The
reference's answer is its per-batch host loop (multimodal_kfold_train_
cvae_supervised.py:177-199 ships EVERY batch host->device EVERY step); this
module is the TPU-native answer:

* the epoch's batches are split into S contiguous **shards**; each shard is
  one jitted ``lax.scan`` over its optimizer steps (compute stays fused
  on-chip, exactly the resident trainer's step body);
* while shard ``i`` computes, shard ``i+1`` uploads — ``jax.device_put``
  dispatches asynchronously, so the host->HBM DMA overlaps device compute
  (double buffering). Peak batch HBM is ~2/S of the cohort instead of 1x;
* shard buffers are **donated** to their step program, so HBM for a
  consumed shard is reclaimed the moment its scan finishes;
* a bounded in-flight window provides backpressure: the host dispatch loop
  stays ~2 shards ahead of the device instead of enqueueing the whole run.

Numerics: bit-identical to FoldTrainer on the same data — chunking a scan
does not change the op sequence (the same property run_resumable's epoch
chunks rely on), and the per-epoch PRNG split is replayed on each epoch's
first shard (build_train_fn.batches_chunk). Shuffle=True is structurally
unsupported (the epoch permutation spans shards) — the reference trains
shuffle=False everywhere but the regression variant.

Sizing: ``shards`` should be the smallest S such that 2/S of the batch
bytes fits comfortably next to params/activations; ``shard_plan`` computes
one from the cohort byte size and an HBM budget.

Scale-out (round 4): ``mesh=`` composes the stream with a D-way 'data'
mesh axis (CLI ``--stream_shards S --mesh 1,D``): each shard's device_put
splits the batch-row axis so every device streams 1/D of the rows
(aggregate host->HBM bandwidth scales with D, per-device residency drops
to 2/(S*D)), and GSPMD inserts the same loss/grad psum over 'data' as the
resident meshed trainers — the 20 GB-cohort regime above is exactly where
both axes are needed at once (8 chips x S=2 leaves ~1.3 GB resident per
device). The meshed stream stays bit-identical across shard counts and
kill/resume, and its train state carries a mesh-geometry fingerprint
(meshed psums reorder partial sums, so it is its own trajectory family).
"""
from __future__ import annotations

import functools
from collections import deque
from typing import Callable, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .trainer import (
    TrainConfig,
    build_optimizer,
    build_train_fn,
    make_batches,
    resolve_loss,
)


def split_shards(batches: dict, shards: int) -> list:
    """Split a make_batches pytree into ``shards`` contiguous sub-pytrees
    along the leading (n_batches) axis. Shard sizes differ by at most one
    batch (=> at most two distinct compiled programs per step variant)."""
    nb = batches["mask"].shape[0]
    if not (1 <= shards <= nb):
        raise ValueError(f"shards must be in [1, {nb}] (n_batches), "
                         f"got {shards}")
    bounds = np.linspace(0, nb, shards + 1, dtype=int)
    return [
        jax.tree_util.tree_map(lambda a, lo=lo, hi=hi: a[lo:hi], batches)
        for lo, hi in zip(bounds[:-1], bounds[1:])
    ]


def shard_plan(total_batch_bytes: int, hbm_budget_bytes: int) -> int:
    """Smallest shard count keeping ~2 resident shards (double buffer)
    under the budget."""
    if total_batch_bytes <= 0:
        return 1
    s = max(1, -(-2 * total_batch_bytes // max(hbm_budget_bytes, 1)))
    return int(s)


class StreamingFoldTrainer:
    """FoldTrainer contract (run / run_resumable), out-of-core.

    Trains one fold whose batch tensors need not fit HBM: host shards
    stream through a double-buffered upload pipeline while a jitted scan
    consumes each shard. Trajectories are bit-identical to FoldTrainer
    (tests/test_streaming.py), and the mid-run train-state format is the
    same, so ``--resume`` even interoperates across the two paths.
    """

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 shards: int = 4, loss_fn: Optional[Callable] = None,
                 state_update: Optional[Callable] = None,
                 inflight: int = 2, mesh=None):
        if config.shuffle:
            raise ValueError(
                "StreamingFoldTrainer requires shuffle=False: the per-epoch "
                "permutation spans shard boundaries (use the resident "
                "FoldTrainer, or pre-shuffle rows host-side once)")
        if shards < 1:
            raise ValueError(f"shards must be >= 1, got {shards}")
        if inflight < 1:
            raise ValueError(f"inflight must be >= 1, got {inflight}")
        if mesh is not None:
            # out-of-core + scale-out composition: each uploaded shard's
            # batch rows are sharded over the mesh's 'data' axis (the
            # device_put splits the host shard into per-device sub-shards,
            # so every device streams 1/D of the rows); params/opt
            # state/key replicate and GSPMD inserts the loss/grad psum
            # over 'data', exactly like the resident meshed trainers.
            # Only the data axis may be >1: folds are sequential here and
            # weight (tensor) parallelism would need the 3-axis resident
            # path.
            if "data" not in mesh.axis_names:
                raise ValueError("streamed mesh needs a 'data' axis")
            wide = [n for n in mesh.axis_names
                    if n != "data" and mesh.shape[n] != 1]
            if wide:
                raise ValueError(
                    "streamed training shards only the 'data' mesh axis; "
                    f"axis {wide[0]!r} has size {mesh.shape[wide[0]]} "
                    "(use --fold_parallel --mesh for fold/tensor axes)")
            if config.batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch size {config.batch_size} not divisible over "
                    f"the {mesh.shape['data']}-way 'data' mesh axis")
        self.mesh = mesh
        self.model = model
        self.config = config
        self.shards = shards
        self.inflight = inflight
        self.optimizer = build_optimizer(config, n_samples)
        loss_fn, self.loss_meta = resolve_loss(model, config, loss_fn)
        if mesh is not None:
            # meshed reductions reorder float partial sums, so the meshed
            # streamed trajectory is its own family: refuse resumes across
            # mesh geometries (the unmeshed streamed state stays
            # interoperable with FoldTrainer's — identical meta)
            self.loss_meta = dict(
                self.loss_meta,
                path=f"stream+mesh:data={mesh.shape['data']}")
        raw = build_train_fn(loss_fn, self.optimizer, config.epochs,
                             shuffle=False, state_update=state_update)
        # donate the shard buffer (arg 3 after the static split partial):
        # its HBM is reclaimed as soon as the scan consumes it. With a
        # single resident shard there is nothing to stream — keep the
        # buffer alive across calls instead.
        self._donates = shards > 1
        donate = (3,) if self._donates else ()
        self._first = jax.jit(functools.partial(raw.batches_chunk, True),
                              donate_argnums=donate)
        self._rest = jax.jit(functools.partial(raw.batches_chunk, False),
                             donate_argnums=donate)

    # ---- placement ----------------------------------------------------------
    def _place_shard(self, host_shard):
        """host shard -> device: unmeshed, one device_put; meshed, a
        per-leaf NamedSharding that splits the batch-row axis (axis 1 of
        every [NB, B, ...] leaf) over 'data' so each device receives only
        its 1/D row slice of the stream."""
        if self.mesh is None:
            return jax.device_put(host_shard)
        return jax.device_put(
            host_shard,
            jax.tree_util.tree_map(self._shard_sharding, host_shard))

    def _shard_sharding(self, leaf):
        nd = np.ndim(leaf)
        spec = P(None, "data", *([None] * (nd - 2))) if nd >= 2 else P(None)
        return NamedSharding(self.mesh, spec)

    def _replicate(self, tree):
        """Commit params/opt-state/key replicated over the mesh (no-op
        unmeshed: jit places them)."""
        if self.mesh is None:
            return tree
        rep = NamedSharding(self.mesh, P())
        return jax.device_put(
            tree, jax.tree_util.tree_map(lambda _: rep, tree))

    # ---- core epoch loop ----------------------------------------------------
    def _run_epochs(self, n_epochs: int, params, opt_state, key,
                    host_shards: list):
        """Run ``n_epochs`` epochs over the host shard list; returns
        (params, opt_state, key, logs) with logs a dict of [n_epochs] host
        arrays (first-batch values, the standard logging cadence)."""
        S = len(host_shards)
        params = self._replicate(params)
        key = self._replicate(key)
        if opt_state is None:
            opt_state = jax.jit(self.optimizer.init)(params)
        else:
            opt_state = self._replicate(opt_state)
        dev = self._place_shard(host_shards[0])
        pending: deque = deque()
        firsts = []
        for e in range(n_epochs):
            first0 = None
            for s in range(S):
                fn = self._first if s == 0 else self._rest
                params, opt_state, key, first = fn(params, opt_state, key,
                                                   dev)
                if s == 0:
                    first0 = first
                # prefetch the next shard while this one computes (both the
                # step dispatch above and device_put are asynchronous)
                last = (e == n_epochs - 1) and (s == S - 1)
                # (the S==1-with-donation case arises when the cohort turns
                # out to have fewer batches than the configured shard count:
                # the single shard was still donated, so re-upload it)
                if (S > 1 or self._donates) and not last:
                    dev = self._place_shard(host_shards[(s + 1) % S])
                # backpressure: don't let the host enqueue unboundedly many
                # shard uploads ahead of the device
                pending.append(first)
                while len(pending) > self.inflight:
                    jax.block_until_ready(pending.popleft())
            firsts.append(first0)
        logs_host = jax.device_get(firsts)  # list of dicts of scalars
        logs = {k: np.asarray([f[k] for f in logs_host])
                for k in (logs_host[0] if logs_host else {})}
        return params, opt_state, key, logs

    # ---- FoldTrainer-compatible surface -------------------------------------
    def _shards_for(self, data_list: Sequence[np.ndarray],
                    cov_list: Sequence[np.ndarray],
                    extras: Optional[dict] = None) -> list:
        batches = make_batches(data_list, cov_list, self.config.batch_size,
                               extras)
        shards = min(self.shards, batches["mask"].shape[0])
        return split_shards(batches, shards)

    def run(self, params, data_list, cov_list, key=None,
            extras: Optional[dict] = None) -> Tuple[dict, dict]:
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        host_shards = self._shards_for(data_list, cov_list, extras)
        params, _, _, logs = self._run_epochs(
            self.config.epochs, params, None, key, host_shards)
        return params, logs

    def compile(self, params, data_list, cov_list, key=None) -> float:
        """Lower + compile every distinct shard program without running
        (populates the persistent compilation cache); returns seconds."""
        import time

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        host_shards = self._shards_for(data_list, cov_list)
        params = self._replicate(params)
        key = self._replicate(key)
        opt_shapes = jax.eval_shape(self.optimizer.init, params)
        t0 = time.perf_counter()
        seen = set()
        for i, shard in enumerate(host_shards):
            fn = self._first if i == 0 else self._rest
            tag = (i == 0, shard["mask"].shape[0])
            if tag in seen:
                continue
            seen.add(tag)
            # abstract operands carry the run-time shardings so the
            # pre-compiled program matches what run()/run_resumable execute
            abstract = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(
                    a.shape, a.dtype,
                    sharding=(self._shard_sharding(a)
                              if self.mesh is not None else None)), shard)
            fn.lower(params, opt_shapes, key, abstract).compile()
        return time.perf_counter() - t0

    def run_resumable(self, params, data_list, cov_list, key, state_dir,
                      checkpoint_every: int, resume: bool = True,
                      extras: Optional[dict] = None) -> Tuple[dict, dict]:
        """Checkpointed streaming training (same train-state blob as
        FoldTrainer.run_resumable; epoch-boundary chunks)."""
        from .checkpoints import run_chunked

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        host_shards = self._shards_for(data_list, cov_list, extras)
        from .packed import packed_template_fn

        template_fn = packed_template_fn(self.optimizer, params, key)

        def run_chunk(n, p, opt_state, k):
            return self._run_epochs(n, p, opt_state, k, host_shards)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, params, None,
                                   key, run_chunk, template_fn,
                                   meta=self.loss_meta)
        return (jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
                logs)
