"""Jitted multimodal cVAE training.

TPU-first redesign of the reference hot loop
(multimodal_kfold_train_cvae_supervised.py:177-209): instead of a Python
epoch x batch loop shipping every batch host->device, the whole fold's
(padded) batch tensor lives on device and a single jitted
``lax.scan(epochs) . lax.scan(batches)`` runs every optimizer step on-chip.
Per-epoch first-batch loss dictionaries stream back for logging, matching the
reference's print cadence (train:201-209).

Numerics parity:
  * optax.adam(b1=.9, b2=.999, eps=1e-8) == torch.optim.Adam defaults.
  * ragged final batch -> per-row mask; masked means divide by the true row
    count like torch's ``.mean(0)`` on a short batch (SURVEY.md Q7).
  * constant LR 1e-4 by default (the reference's cyclic schedule is a no-op
    in this trainer — SURVEY.md Q1); cyclic available via TrainConfig.
  * optional per-epoch reshuffle (regression trainer uses shuffle=True,
    multimodal_kfold_train_cvae_supervised_regression.py:94).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .schedules import cyclic_triangular


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 200
    batch_size: int = 256
    learning_rate: float = 1e-4
    combine: str = "gpoe"
    lr_schedule: str = "constant"  # "constant" (parity) or "cyclic"
    base_lr: float = 1e-4
    max_lr: float = 5e-3
    gamma: float = 0.98
    shuffle: bool = False
    seed: int = 42
    # "fp32" (parity) or "bf16": matmuls in bfloat16 on the MXU, fp32 master
    # params/Adam state, fp32 ELBO reductions
    precision: str = "fp32"
    # rematerialize the forward inside the backward (jax.checkpoint): trades
    # recompute FLOPs for activation HBM traffic/memory — an opt-in for
    # wide-feature regimes; numerically identical (XLA is deterministic)
    remat: bool = False
    # merged mu/logvar encoder heads for the cvae/fp32 path (one [H, 2Z]
    # matmul per modality instead of two [H, Z]): one fewer link in the
    # serialized matmul chain per modality per direction, measured
    # +6-7%/step at flagship shapes sequential AND fold-parallel
    # (RESULTS.md round 3). Exact math on CPU; matmul-reorder float
    # tolerance on the MXU. Default ON; `--no_fused_heads` restores the
    # two-matmul loss.
    fused_heads: bool = True


def make_batches(data_list: Sequence[np.ndarray],
                 cov_list: Sequence[np.ndarray],
                 batch_size: int,
                 extras: Optional[dict] = None) -> dict:
    """Pack per-modality sample arrays into padded device batch tensors.

    Returns a pytree with leading axis n_batches:
      x:    tuple of [NB, B, D_m] per modality
      c:    tuple of [NB, B, c_dim] per modality
      mask: [NB, B] 1.0 for real rows
      valid:[NB] True where the batch holds at least one real row
      extras: any additional per-sample arrays, batched the same way
    """
    n = data_list[0].shape[0]
    nb = max(1, -(-n // batch_size))
    padded = nb * batch_size

    def pack(a: np.ndarray) -> np.ndarray:
        a = np.asarray(a, dtype=np.float32)
        out = np.zeros((padded,) + a.shape[1:], dtype=a.dtype)
        out[:n] = a
        return out.reshape((nb, batch_size) + a.shape[1:])

    mask = np.zeros((padded,), dtype=np.float32)
    mask[:n] = 1.0
    batch = {
        "x": tuple(pack(d) for d in data_list),
        "c": tuple(pack(c) for c in cov_list),
        "mask": mask.reshape(nb, batch_size),
        "valid": (mask.reshape(nb, batch_size).sum(axis=1) > 0),
    }
    if extras:
        batch["extras"] = {k: pack(v) for k, v in extras.items()}
    return batch


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred, x, y), a, b
    )


def _half_cast(tree):
    """fp32 leaves -> bf16 (everything else untouched)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        tree,
    )


def _full_cast(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and a.dtype == jnp.bfloat16 else a,
        tree,
    )


def default_loss_fn(model, config: TrainConfig) -> Callable:
    """ELBO loss over a batch slice; with precision='bf16' the forward
    (encoder/decoder matmuls) runs in bfloat16 on the MXU while master
    params stay fp32 (grads accumulate through the cast) and the loss
    reductions see fp32 upcasts. For the cvae/fp32 path the mu/logvar
    encoder heads run merged by default (config.fused_heads — measured
    +6-7%/step, exact math on CPU)."""
    if (config.fused_heads and config.precision == "fp32"
            and getattr(model, "variant", None) == "cvae"):
        return fused_heads_loss_fn(model, config)
    if config.precision == "bf16":
        def loss_fn(p, batch, k):
            p16 = _half_cast(p)
            x16 = [x.astype(jnp.bfloat16) for x in batch["x"]]
            c16 = [c.astype(jnp.bfloat16) for c in batch["c"]]
            fwd = model.forward(p16, x16, c16, k, config.combine)
            # upcast ONLY the latent-sized statistics (KL/reparam numerics,
            # latent-dim cheap); the WIDE recon means stay bf16 — the loss's
            # elementwise (x_fp32 - mean_bf16) promotes inline, which XLA
            # fuses, instead of materializing fp32 copies of every wide
            # intermediate in HBM (the round-2 _full_cast did exactly that
            # and measured bf16 ~20% SLOWER than fp32 at PPMI width —
            # RESULTS.md fused-width table)
            fwd = {k_: (_full_cast(v) if k_ != "recon_means" else v)
                   for k_, v in fwd.items()}
            losses = model.loss(p, list(batch["x"]), fwd, batch["mask"])
            return losses["total"], losses
    else:
        def loss_fn(p, batch, k):
            fwd = model.forward(p, list(batch["x"]), list(batch["c"]), k,
                                config.combine)
            losses = model.loss(p, list(batch["x"]), fwd, batch["mask"])
            return losses["total"], losses
    if config.remat:
        loss_fn = jax.checkpoint(loss_fn)
    return loss_fn


def fused_heads_loss_fn(model, config: TrainConfig) -> Callable:
    """default_loss_fn variant 'cvae' with each encoder's mu/logvar heads
    merged into ONE [H, 2Z] matmul (+ a free slice).

    Why: the flagship-width step is bound by the serialized matmul chain's
    fixed per-op latency, not FLOPs (RESULTS.md perf model). mu and logvar
    are two independent [H, Z] matmuls consuming the same activation, but a
    TPU core executes ops one at a time — merging them removes one chain
    link per modality per direction. Measured +6%/step single-fold, +7%
    under the 5-fold vmap (scripts/bench_fused_heads.py). The weight
    concat happens at trace time from the STANDARD params (checkpoints
    unchanged); numerics match the two-matmul loss to matmul-tiling
    reorder tolerance (exact on CPU). This is the DEFAULT cvae/fp32 loss
    (TrainConfig.fused_heads; the `--no_fused_heads` CLI flag restores
    the two-matmul path).
    """
    from ..models.cvae import apply_decoder, reparameterize
    from ..ops.linear import apply_linear, leaky_relu
    from ..ops.losses import gaussian_ll, kl_standard_normal

    if getattr(model, "variant", None) != "cvae":
        raise ValueError("fused heads support the 'cvae' variant")
    if config.precision != "fp32":
        raise ValueError("fused heads are fp32-only")
    combine = config.combine
    m_count = model.modalities

    def loss_fn(p, batch, k):
        xes, cs, mask = batch["x"], batch["c"], batch["mask"]
        mus, lvs = [], []
        for m in range(m_count):
            enc = p["enc"][m]
            h = jnp.concatenate(
                [xes[m], cs[m].reshape(xes[m].shape[0], -1)], axis=1)
            for layer in enc["hidden"]:
                h = apply_linear(layer, h)
                if model.non_linear:
                    h = leaky_relu(h)
            w2 = jnp.concatenate([enc["mu"]["w"], enc["logvar"]["w"]],
                                 axis=1)
            b2 = jnp.concatenate([enc["mu"]["b"], enc["logvar"]["b"]])
            out = h @ w2 + b2
            z_dim = enc["mu"]["w"].shape[1]
            mus.append(out[:, :z_dim])
            lvs.append(out[:, z_dim:])
        fmu, flv = model.fuse(p, jnp.stack(mus), jnp.stack(lvs), combine)
        z = reparameterize(k, fmu, flv)
        kl = kl_standard_normal(fmu, flv, mask)
        ll = 0.0
        for m in range(m_count):
            # decoder is unchanged — reuse the canonical apply (only the
            # encoder head needed custom (merged) code)
            mean, lvo = apply_decoder(p["dec"][m], z, cs[m],
                                      model.non_linear)
            ll = ll + gaussian_ll(xes[m], mean, lvo, mask)
        total = m_count * kl - ll
        return total, {"total": total, "kl": m_count * kl, "ll": ll}

    if config.remat:
        loss_fn = jax.checkpoint(loss_fn)
    return loss_fn


# the reference hardcodes batch 256 (train:197); every parity surface and
# trajectory fingerprint keys off this default
DEFAULT_BATCH_SIZE = 256


def add_batch_meta(meta: dict, config: TrainConfig) -> dict:
    """Fingerprint a NON-default --batch_size into a trainer's resume meta
    (one owner for the rule, used by every loss_meta producer): a
    checkpoint resumed under a different batch size is a different
    gradient sequence and must be refused. Keyed only when non-default so
    states written by older builds (no 'batch' key) still resume under
    the default."""
    if config.batch_size != DEFAULT_BATCH_SIZE:
        meta["batch"] = str(config.batch_size)
    return meta


def resolve_loss(model, config: TrainConfig,
                 loss_fn: Optional[Callable]) -> Tuple[Callable, dict]:
    """(loss_fn, trajectory fingerprint) for a trainer: resolves the
    default loss when none is given and produces the flat str->str meta
    dict the resume guard compares (checkpoints.run_chunked) — a
    checkpointed run resumed under a DIFFERENT loss family (e.g. the
    merged-head default vs --no_fused_heads, or a custom --fused_decoder
    loss) must be refused, not silently continued."""
    if loss_fn is not None:
        name = getattr(loss_fn, "__qualname__", "custom").split(".")[0]
    else:
        fused = (config.fused_heads and config.precision == "fp32"
                 and getattr(model, "variant", None) == "cvae")
        name = "fused_heads_loss_fn" if fused else "default_loss_fn"
        loss_fn = default_loss_fn(model, config)
    meta = {"loss": name, "precision": config.precision,
            "remat": str(config.remat)}
    add_batch_meta(meta, config)
    return loss_fn, meta


def build_optimizer(config: TrainConfig, n_samples: int) -> optax.GradientTransformation:
    if config.lr_schedule == "cyclic":
        step_size = 2.0 * float(np.ceil(n_samples / config.batch_size))
        schedule = cyclic_triangular(config.base_lr, config.max_lr, step_size,
                                     config.gamma)
        return optax.adam(learning_rate=schedule, eps=1e-8)
    return optax.adam(learning_rate=config.learning_rate, eps=1e-8)


def build_train_fn(loss_fn: Callable, optimizer: optax.GradientTransformation,
                   epochs: int, shuffle: bool = False,
                   state_update: Optional[Callable] = None,
                   with_hyper: bool = False,
                   shuffle_fn: Optional[Callable] = None):
    """Compile-ready whole-fold trainer.

    ``loss_fn(params, batch, key) -> (total, aux_dict)`` where ``batch`` is
    one slice of the make_batches pytree. With ``with_hyper=True`` the loss
    takes a fourth argument — a pytree of traced hyperparameters — and the
    returned train fn becomes ``train(params, batches, key, hyper)``,
    enabling whole-hyperparameter-grid vmaps (parallel/sweep.py).

    ``state_update(params, aux) -> params`` optionally applies
    non-gradient state carried in the aux dict (e.g. BatchNorm running
    statistics) after the optimizer step.

    ``shuffle_fn(batches, key) -> batches`` overrides the per-epoch
    reshuffle for batch layouts whose sample axis is not axis 1 (the
    packed layouts — train/packed_regression.grouped_shuffle_fn); it must
    consume the SAME permutation stream so trajectories match the
    per-modality shuffled run.

    Returns ``train(params, batches, key) -> (params, logs)`` with ``logs``
    the per-epoch first-batch aux dict — scan this under jit or vmap it over
    a stacked fold axis.
    """
    # hyper threading: the traced hyper pytree is stashed at trace time (the
    # body of `train` runs exactly once per jit/vmap trace, synchronously) so
    # the step/grad closures see the right tracer without changing their
    # scan-compatible signatures.
    hyper_box = []

    if with_hyper:
        grad_fn = jax.value_and_grad(
            lambda p, batch, k: loss_fn(p, batch, k, hyper_box[0]),
            has_aux=True)
    else:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, batch):
        params, opt_state, key = carry
        new_key, sub = jax.random.split(key)
        (_, aux), grads = grad_fn(params, batch, sub)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if state_update is not None:
            new_params = state_update(new_params, aux)
        # Skip all-padding batches entirely — neither Adam moments nor the
        # PRNG stream may advance, so a padded fold's trajectory is
        # bit-identical to the unpadded fold's.
        valid = batch["valid"]
        params = _tree_where(valid, new_params, params)
        opt_state = _tree_where(valid, new_opt_state, opt_state)
        key = _tree_where(valid, new_key, key)
        return (params, opt_state, key), aux

    def maybe_shuffled(batches, key):
        if not shuffle:
            return batches
        if shuffle_fn is not None:
            return shuffle_fn(batches, key)
        nb, bs = batches["mask"].shape

        def reshuffle(a):
            flat = a.reshape((nb * bs,) + a.shape[2:])
            perm = jax.random.permutation(key, nb * bs)
            return flat[perm].reshape(a.shape)

        # permute every per-sample leaf with the same permutation
        out = dict(batches)
        leaves = {"x": batches["x"], "c": batches["c"], "mask": batches["mask"]}
        if "extras" in batches:
            leaves["extras"] = batches["extras"]
        shuffled = jax.tree_util.tree_map(reshuffle, leaves)
        out.update(shuffled)
        out["valid"] = shuffled["mask"].sum(axis=1) > 0
        return out

    def make_epoch(batches):
        def epoch(carry, _):
            params, opt_state, key = carry
            key, shuffle_key = jax.random.split(key)
            shuffled = maybe_shuffled(batches, shuffle_key)
            (params, opt_state, key), aux = jax.lax.scan(
                step, (params, opt_state, key), shuffled
            )
            # per-epoch first-batch scalars; keys prefixed "__" carry
            # non-gradient state for state_update, not log values
            logs = {k: v for k, v in aux.items() if not k.startswith("__")}
            first = jax.tree_util.tree_map(lambda a: a[0], logs)
            return (params, opt_state, key), first

        return epoch

    def train(params, batches, key, hyper=None):
        if with_hyper:
            hyper_box.clear()
            hyper_box.append(hyper)
        opt_state = optimizer.init(params)
        (params, _, _), logs = jax.lax.scan(
            make_epoch(batches), (params, opt_state, key), None, length=epochs
        )
        return params, logs

    def train_chunk(n_epochs, params, opt_state, key, batches, hyper=None):
        """Resumable slice: runs ``n_epochs`` (static) epochs from an explicit
        (params, opt_state, key) carry and returns the carry for
        checkpointing. Chunking is numerically identical to one long scan —
        the per-epoch op sequence is unchanged (tests/test_resume.py)."""
        if with_hyper:
            if hyper is None:
                raise ValueError(
                    "chunked training with a hyper-parameterized trainer "
                    "requires the hyper= argument (train() fills it; the "
                    "chunk path must be given it explicitly)")
            hyper_box.clear()
            hyper_box.append(hyper)
        (params, opt_state, key), logs = jax.lax.scan(
            make_epoch(batches), (params, opt_state, key), None,
            length=n_epochs)
        return params, opt_state, key, logs

    def batches_chunk(split_key, params, opt_state, key, batches):
        """Scan ``step`` over a SUBSET of an epoch's batches from an explicit
        carry — the unit of out-of-core streaming (train/streaming.py).
        ``split_key`` (static) replays the plain epoch's per-epoch key split
        on the FIRST shard, so shard-chunked epochs are bit-identical to the
        single-scan epoch. Returns (params, opt_state, key, first-batch aux).
        Shuffle is structurally unsupported here (the permutation spans
        shards); callers must guard."""
        if split_key:
            key, _ = jax.random.split(key)
        (params, opt_state, key), aux = jax.lax.scan(
            step, (params, opt_state, key), batches)
        logs = {k: v for k, v in aux.items() if not k.startswith("__")}
        first = jax.tree_util.tree_map(lambda a: a[0], logs)
        return params, opt_state, key, first

    train.chunk = train_chunk
    train.batches_chunk = batches_chunk
    return train


class FoldTrainer:
    """Reusable jitted whole-fold trainer.

    Construct once per experiment and call per fold: jax.jit's own trace
    cache then amortizes compilation across folds with identical padded
    shapes (the common case — KFold sizes differ by at most one sample,
    which padding absorbs).
    """

    def __init__(self, model, config: TrainConfig, n_samples: int,
                 loss_fn: Optional[Callable] = None,
                 state_update: Optional[Callable] = None):
        self.model = model
        self.config = config
        self.optimizer = build_optimizer(config, n_samples)
        loss_fn, self.loss_meta = resolve_loss(model, config, loss_fn)
        self._raw_train = build_train_fn(
            loss_fn, self.optimizer, config.epochs, config.shuffle,
            state_update=state_update,
        )
        self._train = jax.jit(self._raw_train)
        self._chunk_cache: dict = {}

    def chunk_fn(self, n_epochs: int):
        """Jitted resumable slice of ``n_epochs`` epochs (cached per size):
        (params, opt_state, key, batches) -> (params, opt_state, key, logs)."""
        if n_epochs not in self._chunk_cache:
            import functools

            self._chunk_cache[n_epochs] = jax.jit(functools.partial(
                self._raw_train.chunk, n_epochs))
        return self._chunk_cache[n_epochs]

    def init_opt_state(self, params):
        return jax.jit(self.optimizer.init)(params)

    def run(self, params, data_list, cov_list, key=None,
            extras: Optional[dict] = None) -> Tuple[dict, dict]:
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        batches = make_batches(data_list, cov_list, self.config.batch_size,
                               extras)
        params, logs = self._train(params, jax.device_put(batches), key)
        return params, jax.tree_util.tree_map(np.asarray, logs)

    def run_batches(self, params, batches, key):
        return self._train(params, batches, key)

    def compile(self, params, batches, key) -> float:
        """Lower + compile the whole-fold program without running it
        (populates jax's persistent compilation cache); returns seconds."""
        import time

        t0 = time.perf_counter()
        self._train.lower(params, batches, key).compile()
        return time.perf_counter() - t0

    def run_resumable(self, params, data_list, cov_list, key, state_dir,
                      checkpoint_every: int, resume: bool = True,
                      extras: Optional[dict] = None) -> Tuple[dict, dict]:
        """Train in checkpointed chunks: every ``checkpoint_every`` epochs the
        full train state (params + optax state + PRNG key + epoch cursor +
        loss history) is written atomically to ``state_dir``; with
        ``resume=True`` an existing state is picked up where it left off.
        Chunked execution is bit-identical to the single-scan run."""
        from .checkpoints import run_chunked

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        batches = jax.device_put(
            make_batches(data_list, cov_list, self.config.batch_size, extras))
        from .packed import packed_template_fn

        template_fn = packed_template_fn(self.optimizer, params, key)

        def run_chunk(n, p, opt_state, k):
            if opt_state is None:
                opt_state = self.init_opt_state(p)
            return self.chunk_fn(n)(p, opt_state, k, batches)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, params, None,
                                   key, run_chunk, template_fn,
                                   meta=self.loss_meta)
        return (jax.tree_util.tree_map(np.asarray, jax.device_get(params)),
                logs)


def train_single_fold(model, params, data_list: Sequence[np.ndarray],
                      cov_list: Sequence[np.ndarray], config: TrainConfig,
                      key=None, extras: Optional[dict] = None,
                      loss_fn: Optional[Callable] = None,
                      trainer: Optional[FoldTrainer] = None
                      ) -> Tuple[dict, dict]:
    """Train one fold to completion with a single jitted call.

    Returns (trained_params, logs) where logs maps loss names to [epochs]
    arrays (first-batch values, the reference's logging cadence). Pass a
    shared ``trainer`` to reuse the compiled step across folds.
    """
    if trainer is None:
        trainer = FoldTrainer(model, config, data_list[0].shape[0], loss_fn)
    return trainer.run(params, data_list, cov_list, key, extras)
