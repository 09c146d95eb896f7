"""Whole-fold trainer on the fully-fused Pallas train-step kernel.

Same contract as train/trainer.py's FoldTrainer (reference hot loop
multimodal_kfold_train_cvae_supervised.py:177-199) but every optimizer step's
forward+backward runs inside ONE pallas_call (kernels/train_step.py) on the
packed-modality layout (models/stacked.py), and the ENTIRE training scan runs
on the kernel's lane-padded parameter layout: padding happens once per fold
(params + batches), optax adam state lives on the padded arrays (zero-padded
entries have zero gradients, so Adam keeps them at exactly zero), and the
per-modality pytree is only rebuilt once after the scan. optax adam + the
valid-batch skip are identical to the XLA trainer, and the reparameterization
PRNG stream is the same (jax.random.normal(sub, [B, Z])), so trajectories are
comparable step-for-step.

Scope: variant 'cvae' (cVAE_multimodal), fusion in {poe,gpoe,moe,mopoe},
fp32, any hidden depth. `supported()` pre-checks this plus the VMEM
feasibility estimate; the CLI falls back to the XLA path otherwise (and on
any Mosaic compile failure).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kernels.mlp import SUBLANE, _round_up
from ..kernels.train_step import FusedTrainStep
from ..models.stacked import StackedMultimodalCVAE
from .trainer import TrainConfig, build_optimizer


# Widest per-modality feature width (columns) at which tiled-bf16's win over
# XLA is window-robust. RESULTS.md round-3 routing table (2000-step programs,
# batch 256, both measurement windows): tiled-bf16 95.5 vs XLA-fp32 111.8
# us/step at 3x768 (reproduced 94.9 vs 103.0 in a second window); the 3x1024
# row read parity in one window and XLA-ahead in the other, 3x1536+ inverts —
# so >768 routes conservatively to XLA.
TILED_BF16_MAX_WIDTH = 768


def select_kernel(model, config: TrainConfig, batch_size: int,
                  fold_parallel: bool = False) -> Tuple[Optional[str], str]:
    """(kernel, reason): kernel is 'single' (whole-batch single-block,
    kernels/train_step.py — fastest at narrow widths where the step is
    chain-latency bound), 'tiled' (grid over batch tiles with resident
    weights, kernels/train_step_tiled.py — bf16-resident path), or None
    (fall back to XLA, ``reason`` says why).

    Routing follows the MEASURED winners (RESULTS.md round-3 routing
    table), not just feasibility: fp32 shapes past the single-block VMEM
    ceiling go to XLA (tiled fp32 measured behind XLA at every mid width —
    117.0 vs 111.8 @3x768, 154.8 vs 127.0 @3x1024, 245.2 vs 142.9 us/step
    @3x1536), and tiled-bf16 is selected only up to
    ``TILED_BF16_MAX_WIDTH``-wide modalities where its win is
    window-robust. ``FusedFoldTrainer(kernel=...)`` still force-selects
    either kernel for experiments."""
    variant = getattr(model, "variant", None)
    if variant != "cvae":
        return None, f"model variant {variant!r} (fused supports 'cvae')"
    if config.combine.lower() not in ("poe", "gpoe", "moe", "mopoe"):
        return None, f"fusion {config.combine!r}"
    if config.precision not in ("fp32", "bf16"):
        return None, f"precision {config.precision!r}"
    if config.shuffle:
        return None, "shuffle=True (fused path trains in fixed batch order)"
    if fold_parallel:
        return None, "--fold_parallel (fused path trains folds sequentially)"
    stacked = StackedMultimodalCVAE(
        model.input_dim_list, model.hidden_dim, model.latent_dim,
        model.c_dim, model.modalities, model.non_linear)
    width = max(model.input_dim_list)
    if config.precision == "bf16":
        # only the tiled kernel computes in bf16 (fp32 accumulation)
        if width > TILED_BF16_MAX_WIDTH:
            return None, (
                f"tiled-bf16 measured behind XLA above "
                f"{TILED_BF16_MAX_WIDTH}-wide modalities (widest here is "
                f"{width}; RESULTS.md round-3 routing table)")
        from ..kernels.train_step_tiled import TiledFusedTrainStep

        step = TiledFusedTrainStep(stacked, config.combine,
                                   compute_dtype=jnp.bfloat16,
                                   interpret=None, batch_hint=batch_size)
        if step.fits_vmem(batch_size):
            return "tiled", ""
        mb = step.vmem_bytes_tiled(step.tile_b) / 2**20
        return None, (f"bf16 tiled kernel needs ~{mb:.0f} MiB VMEM "
                      "(exceeds this core's budget)")
    step = FusedTrainStep(stacked, config.combine, interpret=None)
    if step.fits_vmem(batch_size):
        return "single", ""
    return None, (
        "single-block kernel exceeds VMEM, and the tiled fp32 kernel "
        "measures behind XLA at every width past it (RESULTS.md round-3 "
        "routing table) — use the XLA path, or --precision bf16 at "
        f"<= {TILED_BF16_MAX_WIDTH}-wide modalities for the tiled win")


def supported(model, config: TrainConfig, batch_size: int,
              fold_parallel: bool = False) -> Tuple[bool, str]:
    """(ok, reason). ``model`` is the MultimodalCVAE the CLI built."""
    kernel, reason = select_kernel(model, config, batch_size, fold_parallel)
    return kernel is not None, reason


def make_packed_batches(step: FusedTrainStep,
                        data_list: Sequence[np.ndarray],
                        cov: np.ndarray, batch_size: int) -> dict:
    """Per-modality sample arrays -> kernel-layout batch tensors, padded ONCE:
    xc [NB, M, Bp, K] (x block | covariates | lane pad), c_tail [NB, Bp, .],
    rm [NB, Bp, 1], nvalid [NB, 1, 1], valid [NB]."""
    m = step.model
    n = data_list[0].shape[0]
    nb = max(1, -(-n // batch_size))
    padded = nb * batch_size
    bp = _round_up(batch_size, step.row_align)

    xc = np.zeros((nb, m.modalities, bp, step.K), dtype=np.float32)
    c_tail = np.zeros((nb, bp, step.ZC - step.Zp), dtype=np.float32)
    rm = np.zeros((nb, bp, 1), dtype=np.float32)
    counts = np.zeros((nb,), dtype=np.float32)
    for b in range(nb):
        lo, hi = b * batch_size, min(n, (b + 1) * batch_size)
        rows = hi - lo
        if rows <= 0:
            continue
        for mi, d in enumerate(data_list):
            xc[b, mi, :rows, : d.shape[1]] = d[lo:hi]
            xc[b, mi, :rows, step.D: step.D + cov.shape[1]] = cov[lo:hi]
        c_tail[b, :rows, : cov.shape[1]] = cov[lo:hi]
        rm[b, :rows, 0] = 1.0
        counts[b] = rows
    return {
        "xc": xc,
        "c_tail": c_tail,
        "rm": rm,
        "nvalid": np.maximum(counts, 1.0).reshape(nb, 1, 1),
        "valid": counts > 0,
    }


class FusedFoldTrainer:
    """Jitted whole-fold trainer over the fused kernel; reusable across folds
    with identical padded shapes."""

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 interpret: Optional[bool] = None, kernel: str = None,
                 tile_b: int = None):
        self.stacked = StackedMultimodalCVAE(
            model.input_dim_list, model.hidden_dim, model.latent_dim,
            model.c_dim, model.modalities, model.non_linear)
        self.config = config
        if kernel is None:
            kernel, reason = select_kernel(model, config, config.batch_size)
            if kernel is None:
                raise ValueError(f"fused train step unsupported: {reason}")
        self.kernel = kernel
        if kernel == "tiled":
            from ..kernels.train_step_tiled import TiledFusedTrainStep

            self.step = TiledFusedTrainStep(
                self.stacked, config.combine, tile_b=tile_b,
                compute_dtype=(jnp.bfloat16 if config.precision == "bf16"
                               else jnp.float32),
                interpret=interpret, batch_hint=config.batch_size)
        else:
            if config.precision != "fp32":
                raise ValueError("single-block fused kernel is fp32-only")
            self.step = FusedTrainStep(self.stacked, config.combine,
                                       interpret=interpret)
        # trajectory fingerprint for the resume guard (checkpoints.
        # run_chunked): a fused state checkpointed under fp32 must refuse
        # to resume under --precision bf16 (or under the other kernel)
        # instead of silently continuing a hybrid trajectory
        from .trainer import add_batch_meta

        self.loss_meta = add_batch_meta(
            {"loss": f"fused_kernel_{self.kernel}",
             "precision": config.precision}, config)
        self.optimizer = build_optimizer(config, n_samples)
        self._raw_chunk = self._build_chunk()
        self._train = jax.jit(self._build_train())
        self._chunk_cache: dict = {}

    def _build_chunk(self):
        """(n_epochs static, params, opt_state, key, batches) ->
        (params, opt_state, key, logs) — the resumable unit; chunked
        execution is bit-identical to the single-scan run (same epoch body,
        same PRNG stream)."""
        optimizer = self.optimizer
        fused = self.step
        latent_dim = self.stacked.latent_dim
        batch_size = self.config.batch_size

        def one_step(carry, batch):
            params, opt_state, key = carry
            new_key, sub = jax.random.split(key)
            # same draw as the XLA trainer's reparameterize([B, Z]), then
            # lane-pad (cheap, stays in registers/VMEM-scale buffers)
            eps = jax.random.normal(sub, (batch_size, latent_dim),
                                    jnp.float32)
            losses, grads = fused.loss_and_grads_padded(
                params, batch["xc"], batch["c_tail"], fused.pad_eps(eps),
                batch["rm"], batch["nvalid"])
            updates, new_opt_state = optimizer.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            valid = batch["valid"]
            where = lambda a, b: jax.tree_util.tree_map(
                lambda u, v: jnp.where(valid, u, v), a, b)
            return (where(new_params, params), where(new_opt_state, opt_state),
                    where(new_key, key)), losses

        def chunk(n_epochs, params, opt_state, key, batches):
            def epoch(carry, _):
                params, opt_state, key = carry
                # mirror the XLA trainer's per-epoch shuffle-key split (even
                # with shuffle off) so the PRNG streams stay identical
                key, _ = jax.random.split(key)
                carry, aux = jax.lax.scan(one_step,
                                          (params, opt_state, key), batches)
                first = jax.tree_util.tree_map(lambda a: a[0], aux)
                return carry, first

            (params, opt_state, key), logs = jax.lax.scan(
                epoch, (params, opt_state, key), None, length=n_epochs)
            return params, opt_state, key, logs

        return chunk

    def _build_train(self):
        optimizer = self.optimizer
        chunk = self._raw_chunk
        epochs = self.config.epochs

        def train(padded_params, batches, key):
            opt_state = optimizer.init(padded_params)
            params, _, _, logs = chunk(epochs, padded_params, opt_state, key,
                                       batches)
            return params, logs

        return train

    def chunk_fn(self, n_epochs: int):
        """Jitted resumable slice (cached per size), mirroring
        FoldTrainer.chunk_fn."""
        if n_epochs not in self._chunk_cache:
            import functools

            self._chunk_cache[n_epochs] = jax.jit(functools.partial(
                self._raw_chunk, n_epochs))
        return self._chunk_cache[n_epochs]

    def _padded_params(self, per_modality_params):
        """Pack + lane-pad the per-modality pytree, identity-memoized: the
        CLI shares one init pytree across folds, and eager remote pack/pad
        ops cost a round trip each through the TPU tunnel."""
        memo = getattr(self, "_pack_memo", None)
        if memo is not None and memo[0] is per_modality_params:
            return memo[1]
        from .packed import _host_tree_op, _pack_params_host

        packed = _pack_params_host(self.stacked, per_modality_params)
        padded = _host_tree_op(self.step.pad_params, packed)
        self._pack_memo = (per_modality_params, padded)
        return padded

    def _unpack(self, padded_params):
        host = jax.tree_util.tree_map(np.asarray,
                                      jax.device_get(padded_params))
        from .packed import _host_tree_op

        # unpad_named + unpack_params both reshuffle with jnp ops: keep the
        # whole host tree's transform on the local cpu backend
        return _host_tree_op(
            lambda t: self.stacked.unpack_params(self.step.unpad_named(t)),
            host)

    def run(self, per_modality_params, data_list, cov, key=None):
        """Takes/returns the standard per-modality pytree (checkpoints and
        the inference path are unchanged)."""
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        padded = self._padded_params(per_modality_params)
        batches = self.step.cast_batch(make_packed_batches(
            self.step, data_list, cov, self.config.batch_size))
        out, logs = self._train(padded, jax.device_put(batches), key)
        return (self._unpack(out),
                jax.tree_util.tree_map(np.asarray, jax.device_get(logs)))

    def run_resumable(self, per_modality_params, data_list, cov, key,
                      state_dir, checkpoint_every: int, resume: bool = True):
        """Checkpointed fused training (mirrors FoldTrainer.run_resumable):
        the train state carries the PADDED packed params + optax state +
        PRNG key + epoch cursor, so kill-and-resume is bit-identical to the
        uninterrupted fused run. The state format differs from the XLA
        path's (packed vs per-modality pytrees) — callers must use a
        fused-specific state_dir."""
        from .checkpoints import run_chunked

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        padded = self._padded_params(per_modality_params)
        batches = jax.device_put(self.step.cast_batch(make_packed_batches(
            self.step, data_list, cov, self.config.batch_size)))

        def template_fn():
            shapes = jax.eval_shape(self.optimizer.init, padded)
            return {"params": padded, "key": key,
                    "opt_state": jax.tree_util.tree_map(
                        lambda s: np.zeros(s.shape, s.dtype), shapes)}

        def run_chunk(n, p, opt_state, k):
            if opt_state is None:
                opt_state = jax.jit(self.optimizer.init)(p)
            return self.chunk_fn(n)(p, opt_state, k, batches)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, padded, None,
                                   key, run_chunk, template_fn,
                                   meta=self.loss_meta)
        return self._unpack(params), logs
