"""Packed-modality XLA trainer: every layer is ONE batched einsum across all
modalities (models/stacked.py), trained by the standard optax scan.

Measured on v5e: the step is launch/chain-latency bound, and packing M
modalities into [M, B, D] einsums cuts the number of serialized ops. The
pad-to-widest layout here burns 3x FLOPs on the narrow modalities of
mixed-width cohorts, which round 2 measured as +22% single-fold but −21%
under the 5-fold vmap; round 4's width-grouped layout (train/grouped.py)
removes the waste and wins BOTH regimes (+50%/+72% vs per-modality,
RESULTS round-4 table), so --packed_xla routes mixed-width cvae-skeleton
cohorts (round 5: the whole cvae/mmjsd/mvtcae/nmmlp zoo)
there and keeps THIS layout for uniform widths (where the two are
identical) and for the mmjsd/mvtcae skeleton variants and every
expert-parallel (--ep_mesh) form, whose modality-axis sharding needs the
uniform [M, ...] tensors. precision='bf16' runs the matmuls in bfloat16
with fp32 master params (cvae only).

Numerics match the per-modality model to float tolerance
(tests/test_stacked.py proves forward/loss/grad equivalence;
tests/test_packed_cli.py proves trajectory equivalence) — bit-exact parity
stays with the default path.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.stacked import StackedMultimodalCVAE
from .trainer import TrainConfig, build_optimizer, build_train_fn


def packed_supported(model, config: TrainConfig) -> Tuple[bool, str]:
    # the whole cvae skeleton packs (round 4): mmjsd/mvtcae share the
    # encoder/decoder MLPs and differ only in fuse/loss, which
    # StackedMultimodalCVAE(variant=...) reproduces branch-for-branch;
    # round 5 adds the split-latent DMVAE family on its own grouped layout
    # (train/grouped_dmvae.py, routed by select_packed_trainer)
    if getattr(model, "variant", None) not in ("cvae", "mmjsd", "mvtcae",
                                               "nmmlp", "dmvae", "weighted",
                                               "mmvaeplus"):
        return False, (f"model variant {getattr(model, 'variant', None)!r} "
                       "(packed supports the cvae skeleton "
                       "cvae/mmjsd/mvtcae/nmmlp and the DMVAE family)")
    if config.precision == "bf16" \
            and getattr(model, "variant", None) != "cvae":
        return False, ("bf16 packed path is cvae-only (the mmjsd/mvtcae "
                       "regularizers have no half-precision parity story)")
    if config.combine.lower() not in ("poe", "gpoe", "moe", "mopoe"):
        return False, f"fusion {config.combine!r}"
    if config.precision not in ("fp32", "bf16"):
        return False, f"precision {config.precision!r}"
    if config.shuffle:
        # the trainer's per-epoch reshuffle assumes the per-modality
        # [NB, B, ...] layout; the packed [NB, M, B, D] layout would permute
        # the modality axis
        return False, "shuffle=True (packed layout has no reshuffle path)"
    return True, ""


def make_packed_fold_batches(stacked: StackedMultimodalCVAE,
                             data_list: Sequence[np.ndarray],
                             cov: np.ndarray, batch_size: int) -> dict:
    """Per-modality arrays -> {x [NB, M, B, d_max], c [NB, B, C],
    mask [NB, B], valid [NB]} (packed once on the host)."""
    n = data_list[0].shape[0]
    nb = max(1, -(-n // batch_size))
    padded = nb * batch_size
    x = np.zeros((stacked.modalities, padded, stacked.d_max),
                 dtype=np.float32)
    for m, d in enumerate(data_list):
        x[m, :n, : d.shape[1]] = d
    c = np.zeros((padded, cov.shape[1]), dtype=np.float32)
    c[:n] = cov
    mask = np.zeros((padded,), dtype=np.float32)
    mask[:n] = 1.0
    return {
        "x": np.swapaxes(
            x.reshape(stacked.modalities, nb, batch_size, stacked.d_max),
            0, 1).copy(),
        "c": c.reshape(nb, batch_size, -1),
        "mask": mask.reshape(nb, batch_size),
        "valid": (mask.reshape(nb, batch_size).sum(axis=1) > 0),
    }


def _host_tree_op(fn, tree):
    """Run a jnp tree-reshuffle (pack/unpack) with host-friendly placement:
    for numpy input trees the O(modalities x layers) concatenate/pad/slice
    ops run on the LOCAL cpu backend (each would otherwise be an eager
    remote op — a compile + round trip through the TPU tunnel), returning a
    pure-numpy tree. Device trees transform where they live."""
    leaves = jax.tree_util.tree_leaves(tree)
    if all(isinstance(leaf, np.ndarray) for leaf in leaves):
        from ..cli.common import _local_cpu_device
        from ..utils.jaxconfig import no_compile_cache

        cpu = _local_cpu_device()
        if cpu is not None:
            with no_compile_cache(), jax.default_device(cpu):
                out = fn(tree)
            return jax.tree_util.tree_map(np.asarray, out)
    return fn(tree)


def _pack_params_host(stacked: StackedMultimodalCVAE, params) -> dict:
    """pack_params on the local cpu for host trees (one upload at the jit
    boundary instead of an eager remote op per concatenate/pad)."""
    return _host_tree_op(stacked.pack_params, params)


def _unpack_params_host(stacked: StackedMultimodalCVAE, packed) -> dict:
    """unpack_params with the same placement rationale: the layer-0
    concatenate per modality would otherwise run as an eager remote op on
    the default backend for every fold/milestone/checkpoint unpack, and
    the result would mix device arrays into host checkpoints."""
    return _host_tree_op(stacked.unpack_params, packed)


def fetch_host(tree):
    """Multi-process-safe device->host fetch: checkpoints._to_host
    (process_allgathers leaves sharded across processes, where plain
    device_get raises) with every leaf materialized as np.ndarray.
    Identical to a device_get single-process. ONE owner for every packed
    trainer's result fetch — the 2-process EP path exercises it."""
    from .checkpoints import _to_host

    return jax.tree_util.tree_map(np.asarray, _to_host(tree))


def unpack_per_fold(layout, out, logs, n_folds):
    """Fetch a fold-stacked (params, logs) result and unpack to
    (per-fold per-modality params, per-fold logs). Shared by every
    fold-parallel packed trainer (grouped / endtoend / regression / dmvae);
    ``layout`` is any object with ``unpack_params`` (via
    _unpack_params_host)."""
    host = fetch_host(out)
    host_logs = fetch_host(logs)
    per_fold_params = [
        _unpack_params_host(
            layout, jax.tree_util.tree_map(lambda leaf: leaf[f], host))
        for f in range(n_folds)
    ]
    per_fold_logs = [{k: v[f] for k, v in host_logs.items()}
                     for f in range(n_folds)]
    return per_fold_params, per_fold_logs


def stack_packed_params(layout, params_list):
    """Per-fold per-modality pytrees -> ONE fold-stacked packed tree.
    Identical init pytrees (the CLIs share one across folds) pack once —
    memoized by identity, since the pack itself is O(modalities x layers)
    of host work. Shared by every fold-parallel packed trainer."""
    packs: dict = {}
    packed_list = []
    for p in params_list:
        if id(p) not in packs:
            packs[id(p)] = _pack_params_host(layout, p)
        packed_list.append(packs[id(p)])
    from ..parallel.folds import stack_params

    return stack_params(packed_list)  # numpy-stacks host trees


def packed_template_fn(optimizer, packed, keys, vmapped: bool = False):
    """checkpoints.run_chunked template builder shared by every resumable
    trainer ({params, key, opt_state} train states — the packed zoo,
    FoldTrainer, StreamingFoldTrainer): opt_state is shaped by eval_shape,
    so building the template does no device work."""
    def template_fn():
        init = jax.vmap(optimizer.init) if vmapped else optimizer.init
        shapes = jax.eval_shape(init, packed)
        return {"params": packed, "key": keys,
                "opt_state": jax.tree_util.tree_map(
                    lambda s: np.zeros(s.shape, s.dtype), shapes)}

    return template_fn


def pad_stack_fold_batches(per_fold):
    """Per-fold batch pytrees -> one fold-stacked tree, every fold padded
    (with all-padding trailing batches) to the largest fold's batch grid.
    Shared by every fold-parallel packed trainer's pack_folds."""
    max_nb = max(b["mask"].shape[0] for b in per_fold)
    padded = []
    for b in per_fold:
        cur = b["mask"].shape[0]
        if cur < max_nb:
            b = jax.tree_util.tree_map(
                lambda a: np.pad(a, [(0, max_nb - cur)]
                                 + [(0, 0)] * (a.ndim - 1)), b)
        padded.append(b)
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *padded)


def globalize_tree(tree, sh_tree):
    """Host numpy pytree -> global sharded arrays for MULTI-CONTROLLER
    jits (mirrors parallel/folds.MultiFoldTrainer._globalize): jit
    rejects numpy operands with non-trivial in_shardings across
    processes, so every process (holding the same host values) donates
    its local shards via make_array_from_callback. Device-array leaves
    pass through untouched."""
    def conv(a, s):
        if isinstance(a, jax.Array):
            return a
        return jax.make_array_from_callback(
            np.shape(a), s, lambda idx, _a=a: np.asarray(_a)[idx])

    return jax.tree_util.tree_map(conv, tree, sh_tree)


def _packed_loss_fn(stacked: StackedMultimodalCVAE, combine: str,
                    precision: str = "fp32"):
    if precision == "bf16":
        # same recipe as trainer.default_loss_fn's bf16 branch: matmuls in
        # bfloat16 (fp32 master params; grads accumulate through the
        # cast), latent-sized stats upcast, wide recon means stay bf16
        # (the elementwise loss promote fuses inline)
        from .trainer import _full_cast, _half_cast

        def loss_fn(p, batch, k):
            p16 = _half_cast(p)
            fwd = stacked.forward(p16, batch["x"].astype(jnp.bfloat16),
                                  batch["c"].astype(jnp.bfloat16), k,
                                  combine)
            fwd = {k_: (_full_cast(v) if k_ != "recon_means" else v)
                   for k_, v in fwd.items()}
            losses = stacked.loss(p, batch["x"], fwd, batch["mask"])
            return losses["total"], losses

        return loss_fn

    def loss_fn(p, batch, k):
        fwd = stacked.forward(p, batch["x"], batch["c"], k, combine)
        losses = stacked.loss(p, batch["x"], fwd, batch["mask"])
        return losses["total"], losses

    return loss_fn


class PackedStateTrainerBase:
    """Shared host-side plumbing for whole-fold trainers whose train state
    is the PACKED pytree (PackedFoldTrainer below and the expert-parallel
    parallel/modality.EPFoldTrainer): params pack-memoization, run/compile
    entry points, and the resumable-chunk contract (checkpoints.run_chunked).
    Subclasses provide ``self.stacked / config / optimizer / _train /
    chunk_fn`` and may override ``_place`` (identity for meshed trainers —
    shard_map's in_specs place the shards; a device_put would commit the
    whole batch to one device first)."""

    _place = staticmethod(jax.device_put)
    # layout hooks: subclasses (train/grouped.py) swap the batch maker /
    # loss builder / stacked-model factory without copying the plumbing
    _batch_maker = staticmethod(make_packed_fold_batches)

    def _packed(self, per_modality_params):
        # folds share one init pytree in the CLIs: memoize by identity so
        # the pack work (and its upload) happens once per unique tree
        memo = getattr(self, "_pack_memo", None)
        if memo is not None and memo[0] is per_modality_params:
            return memo[1]
        packed = _pack_params_host(self.stacked, per_modality_params)
        self._pack_memo = (per_modality_params, packed)
        return packed

    def _batches(self, data_list, cov):
        return self._place(type(self)._batch_maker(
            self.stacked, data_list, cov, self.config.batch_size))

    def run(self, per_modality_params, data_list, cov, key=None):
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        packed = self._packed(per_modality_params)
        out, logs = self._train(packed, self._batches(data_list, cov), key)
        return (_unpack_params_host(self.stacked, fetch_host(out)),
                fetch_host(logs))

    def compile(self, per_modality_params, data_list, cov, key=None) -> float:
        """Lower + compile the whole-fold program without running it;
        returns seconds (populates the persistent compilation cache)."""
        import time

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        packed = self._packed(per_modality_params)
        batches = self._batches(data_list, cov)
        t0 = time.perf_counter()
        self._train.lower(packed, batches, key).compile()
        return time.perf_counter() - t0

    def run_resumable(self, per_modality_params, data_list, cov, key,
                      state_dir, checkpoint_every: int, resume: bool = True):
        """Checkpointed training (mirrors FoldTrainer.run_resumable); the
        state carries the PACKED params, so callers use a trainer-specific
        state_dir. Kill-and-resume is bit-identical to the uninterrupted
        run of the same trainer."""
        from .checkpoints import run_chunked

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        packed = self._packed(per_modality_params)
        batches = self._batches(data_list, cov)
        template_fn = packed_template_fn(self.optimizer, packed, key)

        def run_chunk(n, p, opt_state, k):
            if opt_state is None:
                opt_state = jax.jit(self.optimizer.init)(p)
            return self.chunk_fn(n)(p, opt_state, k, batches)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, packed, None,
                                   key, run_chunk, template_fn,
                                   meta=getattr(self, "loss_meta", None))
        return _unpack_params_host(self.stacked, fetch_host(params)), logs


class PackedFoldTrainer(PackedStateTrainerBase):
    """Whole-fold trainer on the packed layout; PRNG stream identical to the
    per-modality FoldTrainer's (reparameterize draws [B, Z] from the same
    split sequence), so trajectories agree to float tolerance."""

    _loss_builder = staticmethod(_packed_loss_fn)

    def _build_stacked(self, model):
        return StackedMultimodalCVAE(
            model.input_dim_list, model.hidden_dim, model.latent_dim,
            model.c_dim, model.modalities, model.non_linear,
            variant=getattr(model, "variant", "cvae"),
            jsd_on_fused=getattr(model, "jsd_on_fused", True))

    def _loss_name(self) -> str:
        v = self.stacked.variant
        return "packed_stacked" if v == "cvae" else f"packed_stacked_{v}"

    def __init__(self, model, config: TrainConfig, n_samples: int):
        assert not config.shuffle, "packed trainers train in fixed batch order"
        self.stacked = self._build_stacked(model)
        self.config = config
        # resume-guard fingerprint (checkpoints.run_chunked): packed states
        # are numerically their own trajectory family (variant-suffixed for
        # the non-cvae skeleton losses)
        from .trainer import add_batch_meta

        self.loss_meta = add_batch_meta(
            {"loss": self._loss_name(), "precision": config.precision},
            config)
        self.optimizer = build_optimizer(config, n_samples)
        self._raw_train = build_train_fn(
            type(self)._loss_builder(self.stacked, config.combine,
                                     config.precision), self.optimizer,
            config.epochs, shuffle=False)
        self._train = jax.jit(self._raw_train)
        self._chunk_cache: dict = {}

    def chunk_fn(self, n_epochs: int):
        """Jitted resumable slice, cached per size ON THE INSTANCE: the CLI
        calls run_resumable once per fold on one shared trainer, and a
        per-call cache would re-trace every chunk program per fold."""
        if n_epochs not in self._chunk_cache:
            import functools

            self._chunk_cache[n_epochs] = jax.jit(functools.partial(
                self._raw_train.chunk, n_epochs))
        return self._chunk_cache[n_epochs]


class PackedMultiFoldTrainer:
    """vmap(packed whole-fold trainer) over a stacked fold axis: operands are
    [F, NB, M, B, d_max] — the largest, most uniform batched einsums this
    workload can produce.

    With ``mesh``/``shardings_fn`` (a ('fold','modality','data') mesh +
    parallel/modality.packed_fold_shardings) the program additionally shards
    folds, the packed modality axis, and batch rows across devices — GSPMD
    inserts the fusion all-reduces over 'modality' and the grad psums over
    'data' that parallel/modality.py's shard_map path schedules by hand."""

    _batch_maker = staticmethod(make_packed_fold_batches)
    _loss_builder = staticmethod(_packed_loss_fn)
    _build_stacked = PackedFoldTrainer._build_stacked
    _loss_name = PackedFoldTrainer._loss_name

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 mesh=None, shardings_fn=None):
        assert not config.shuffle, "packed trainers train in fixed batch order"
        if (mesh is None) != (shardings_fn is None):
            raise ValueError("mesh and shardings_fn go together")
        self.stacked = self._build_stacked(model)
        if mesh is not None and "modality" in mesh.axis_names and \
                self.stacked.modalities % mesh.shape["modality"]:
            raise ValueError(
                f"{self.stacked.modalities} modalities not divisible over "
                f"the {mesh.shape['modality']}-way 'modality' mesh axis")
        self.config = config
        self.mesh = mesh
        self._shardings_fn = shardings_fn
        # fingerprint carries the mesh geometry: a meshed (EP) resume under
        # a different axis split is a different float-reorder trajectory
        path = "fold_parallel" if mesh is None else (
            "fold_parallel+ep:" + ",".join(
                f"{n}={mesh.shape[n]}" for n in mesh.axis_names))
        from .trainer import add_batch_meta

        self.loss_meta = add_batch_meta(
            {"loss": self._loss_name(), "precision": config.precision,
             "path": path}, config)
        self.optimizer = build_optimizer(config, n_samples)
        self._raw_train = build_train_fn(
            type(self)._loss_builder(self.stacked, config.combine,
                                     config.precision), self.optimizer,
            config.epochs, shuffle=False)
        self._vtrain = jax.vmap(self._raw_train)
        self._jitted = None

    def _jit_train(self, stacked_params, batches, keys):
        if self._jitted is None:
            if self.mesh is not None:
                shardings = self._shardings_fn(self.mesh, stacked_params,
                                               batches, keys)
                self._jitted = jax.jit(self._vtrain, in_shardings=shardings)
            else:
                self._jitted = jax.jit(self._vtrain)
        return self._jitted

    def _place(self, batches):
        # with a mesh, jit's in_shardings place the shards; a device_put
        # would commit the whole batch pytree to one device first
        return batches if self.mesh is not None else jax.device_put(batches)

    def _globalize_operands(self, stacked_params, batches, keys):
        """Multi-controller placement: numpy operands cannot carry
        non-trivial in_shardings across processes — convert them to
        global arrays (globalize_tree). Single-process meshed runs keep
        the numpy fast path (in_shardings place them directly)."""
        if self.mesh is None or jax.process_count() == 1:
            return stacked_params, batches, keys
        p_sh, b_sh, k_sh = self._shardings_fn(self.mesh, stacked_params,
                                              batches, keys)
        return (globalize_tree(stacked_params, p_sh),
                globalize_tree(batches, b_sh),
                globalize_tree(keys, k_sh))

    def _stack_packed(self, params_list):
        return stack_packed_params(self.stacked, params_list)

    def pack_folds(self, folds, cov_index: int = 0) -> dict:
        """folds: list of (data_list, cov_list); returns the stacked batch
        pytree with every fold padded to the largest fold's batch grid."""
        per_fold = [type(self)._batch_maker(self.stacked, data_list,
                                            cov_list[cov_index],
                                            self.config.batch_size)
                    for data_list, cov_list in folds]
        return pad_stack_fold_batches(per_fold)

    def compile(self, params_list, folds, keys) -> float:
        """Lower + compile the fold-parallel packed program; seconds."""
        import time

        stacked_params = self._stack_packed(params_list)
        batches = self._place(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        fn = self._jit_train(stacked_params, batches, keys)
        t0 = time.perf_counter()
        fn.lower(stacked_params, batches, keys).compile()
        return time.perf_counter() - t0

    def run(self, params_list, folds, keys):
        stacked_params = self._stack_packed(params_list)
        batches = self._place(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        fn = self._jit_train(stacked_params, batches, keys)
        stacked_params, batches, keys = self._globalize_operands(
            stacked_params, batches, keys)
        out, logs = fn(stacked_params, batches, keys)
        return self._per_fold(out, logs, len(params_list))

    def _per_fold(self, out, logs, n_folds):
        return unpack_per_fold(self.stacked, out, logs, n_folds)

    def _chunk_jit(self, n: int, p, opt_state, k, batches):
        """Jitted vmapped chunk of ``n`` epochs, cached per size; meshed
        in_shardings mirror run()'s."""
        import functools

        cache = getattr(self, "_chunk_cache", None)
        if cache is None:
            cache = self._chunk_cache = {}
        if n not in cache:
            chunk = jax.vmap(functools.partial(self._raw_train.chunk, n))
            if self.mesh is not None:
                p_sh, b_sh, k_sh = self._shardings_fn(self.mesh, p,
                                                      batches, k)
                o_sh = self._shardings_fn.opt(self.mesh, opt_state, p, p_sh)
                cache[n] = jax.jit(chunk,
                                   in_shardings=(p_sh, o_sh, k_sh, b_sh))
            else:
                cache[n] = jax.jit(chunk)
        return cache[n]

    def prepare_batches(self, folds):
        """Packed + mesh-placed batch tensors for ``folds`` — depends only
        on (folds, batch_size, input layout), NOT on hidden dims, so a
        hyperparameter sweep builds this once per procedure and passes it to
        every grid point's ``run_milestones`` (cli/sweep_supervised.py)."""
        return self._place(self.pack_folds(folds))

    def run_milestones(self, params_list, folds, keys, milestones,
                       packed_batches=None):
        """Train to each milestone epoch in turn, yielding
        ``(epoch, per_fold_params, per_fold_logs)`` after each — the packed
        (optionally expert-parallel-meshed) counterpart of
        parallel/folds.MultiFoldTrainer.run_milestones, driven by the SAME
        shared engine (parallel/folds.milestone_scan: one reuse policy, one
        log accumulator). Collapses the epochs axis of the sweep grid
        (cli/sweep_supervised.py --ep_mesh). ``packed_batches`` (from
        ``prepare_batches``) skips re-packing the cohort per grid point."""
        from ..parallel.folds import milestone_scan

        stacked_params = self._stack_packed(params_list)
        batches = (packed_batches if packed_batches is not None
                   else self.prepare_batches(folds))
        keys = jnp.stack(list(keys))
        stacked_params, batches, keys = self._globalize_operands(
            stacked_params, batches, keys)
        opt_state = jax.jit(jax.vmap(self.optimizer.init))(stacked_params)
        if not hasattr(self, "_chunk_cache"):
            self._chunk_cache = {}

        def emit(params, logs_acc):
            return self._per_fold(params, logs_acc, len(params_list))

        yield from milestone_scan(milestones, stacked_params, opt_state,
                                  keys, batches, self._chunk_jit,
                                  self._chunk_cache, emit)

    def run_resumable(self, params_list, folds, keys, state_dir,
                      checkpoint_every: int, resume: bool = True):
        """Checkpointed fold-parallel packed training: ONE whole-run train
        state (stacked packed params + stacked optax state + per-fold PRNG
        keys + epoch cursor); bit-identical to the single-scan run."""
        from .checkpoints import run_chunked

        stacked_params = self._stack_packed(params_list)
        batches = self._place(self.pack_folds(folds))
        keys = jnp.stack(list(keys))
        init_opt = jax.jit(jax.vmap(self.optimizer.init))
        template_fn = packed_template_fn(self.optimizer, stacked_params,
                                         keys, vmapped=True)

        def run_chunk(n, p, opt_state, k):
            # multi-controller: first-chunk AND resume-restored states are
            # host numpy — globalize per chunk (device-array leaves pass
            # through untouched, so warm chunks cost nothing)
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
            # shared jitted-chunk cache with run_milestones (_chunk_jit):
            # one place owns the mesh/sharding wiring
            return self._chunk_jit(n, p, opt_state, k, batches)(
                p, opt_state, k, batches)

        if self.mesh is not None and jax.process_count() > 1:
            _, b_sh, _ = self._shardings_fn(self.mesh, stacked_params,
                                            batches, keys)
            batches = globalize_tree(batches, b_sh)
        # vmapped chunk logs come back [F, n]; accumulate on the epoch axis
        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, stacked_params,
                                   None, keys, run_chunk, template_fn,
                                   logs_concat_axis=1, meta=self.loss_meta)
        return self._per_fold(params, logs, len(params_list))
