"""Modality-parallel (expert-parallel) training: fusion ops AS collectives.

The reference iterates modalities in a Python loop on one device
(cVAE.py:1174-1196) and fuses their latent statistics with stacked-tensor
reductions (ProductOfExperts cVAE.py:986-998, MixtureOfExperts :1000-1011,
MoPoE :1060-1083, gPoE inline :1154-1157). On a TPU slice those reductions
over the modality axis are exactly what ICI collectives compute: PoE's
total precision is a ``psum`` of per-modality precisions, MoE's mixture mean
is a ``psum``/M, gPoE only reweights the summands. This module shards the
packed modality axis of models/stacked.py over a 'modality' mesh axis via
``jax.shard_map`` and implements every live fusion as explicit collectives —
expert-parallelism where each device group owns a slice of the per-modality
encoder/decoder stacks and only [B, latent]-sized partial statistics cross
the interconnect per step (never parameters or activations of the wide
feature dimension).

Scaling story: the flagship ADNI run has M=4 experts (UCA adds the
early-fusion concat as a 4th modality, utils.py:731-755) and HCP has M=12
(utils.py:173) — with modality widths up to 3485 (PPMI), per-device FLOPs
and parameter memory drop by the modality-axis size while the per-step
communication stays at 2-4 psums of [B, latent] (latent ~10) — hundreds of
bytes per row, trivially ICI-bound.

Gradient correctness: the step differentiates THROUGH the collectives
(``check_vma=True``: shard_map tracks varying/invariant axes, so the psum
transposes deliver each shard's cross-modality contributions — the cotangent
of one modality's fused-z usage flows back into every other modality's
encoder slice). tests/test_modality_parallel.py verifies one full optimizer
step (loss, grads via the updated params) against the unsharded packed
trainer to float tolerance on the 8-virtual-device mesh.

PRNG semantics match parallel/shardmap_step.py: the shared-z noise draw is
identical across 'modality' shards (z is one tensor, fused) and fold_in-
decorrelated per 'data' shard; with n_data == 1 the step is draw-identical
to the unsharded packed step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.cvae import reparameterize
from ..models.stacked import StackedMultimodalCVAE
from ..ops.linear import leaky_relu

_HALF_LOG_2PI = 0.9189385332046727


def make_ep_mesh(n_modality: int, n_data: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """A ('modality', 'data') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_modality:
            raise ValueError(
                f"{len(devices)} devices not divisible into "
                f"{n_modality} modality groups")
        n_data = len(devices) // n_modality
    if n_modality * n_data != len(devices):
        raise ValueError(
            f"mesh {n_modality}x{n_data} != {len(devices)} devices")
    grid = np.asarray(devices).reshape(n_modality, n_data)
    return Mesh(grid, ("modality", "data"))


def fused_stats_collective(mus: jnp.ndarray, variances: jnp.ndarray,
                           combine: str, alpha_full: jnp.ndarray,
                           m_total: int, axis: str = "modality"):
    """combine_latent (ops/fusion.py) over a device-sharded modality axis.

    ``mus``/``variances`` are the LOCAL [M_local, B, D] slices; the reduction
    over the global modality axis is a psum over ``axis``. ``alpha_full`` is
    the all-gathered [M_total] gPoE weight vector (softmax couples all
    entries, so it must be global). Returns replicated-over-modality
    ([B, D], [B, D]) fused statistics — identical math to the unsharded
    ops/fusion.py dispatch (single-modality shortcut included: with M == 1
    every fusion below reduces to the identity, matching cVAE.py:1146).
    """
    combine = combine.lower()
    if combine == "poe":
        precision = 1.0 / variances
        total = lax.psum(jnp.sum(precision, axis=0), axis)
        fused_mu = lax.psum(jnp.sum(mus * precision, axis=0), axis) / total
        return fused_mu, 1.0 / total
    if combine == "gpoe":
        weights = jax.nn.softmax(alpha_full)
        m_local = mus.shape[0]
        start = lax.axis_index(axis) * m_local
        w_local = lax.dynamic_slice_in_dim(weights, start, m_local)
        weighted = w_local.reshape(-1, 1, 1) / variances
        total = lax.psum(jnp.sum(weighted, axis=0), axis)
        fused_mu = lax.psum(jnp.sum(mus * weighted, axis=0), axis) / total
        return fused_mu, 1.0 / total
    if combine == "moe":
        fused_mu = lax.psum(jnp.sum(mus, axis=0), axis) / m_total
        fused_var = lax.psum(jnp.sum(variances, axis=0), axis) / m_total
        return fused_mu, fused_var
    if combine == "mopoe":
        poe_mu, poe_var = fused_stats_collective(
            mus, variances, "poe", alpha_full, m_total, axis)
        # the PoE expert is modality-invariant after its psum: add it ONCE
        fused_mu = (lax.psum(jnp.sum(mus, axis=0), axis) + poe_mu) \
            / (m_total + 1)
        fused_var = (lax.psum(jnp.sum(variances, axis=0), axis) + poe_var) \
            / (m_total + 1)
        return fused_mu, fused_var
    raise ValueError("No such combination method")


def _param_spec(modalities: int):
    """Every packed-param / adam-moment leaf carries a leading [M] axis
    (models/stacked.py pack_params layout, incl. alpha [M]); optax counts are
    scalars. Shard the leading modality axis, replicate the rest."""

    def spec(leaf) -> P:
        nd = np.ndim(leaf)
        shape = np.shape(leaf)
        if nd >= 1 and shape[0] == modalities:
            return P("modality", *([None] * (nd - 1)))
        return P(*([None] * nd))

    return spec


def _col_mask_full(stacked: StackedMultimodalCVAE) -> np.ndarray:
    col = np.zeros((stacked.modalities, stacked.d_max), dtype=np.float32)
    for m, d in enumerate(stacked.input_dim_list):
        col[m, :d] = 1.0
    return col


def _check_ep_geometry(stacked: StackedMultimodalCVAE, mesh: Mesh) -> None:
    if stacked.modalities % mesh.shape["modality"]:
        raise ValueError(
            f"{stacked.modalities} modalities not divisible over the "
            f"{mesh.shape['modality']}-way 'modality' mesh axis")


def _make_ep_loss(stacked: StackedMultimodalCVAE, combine: str):
    """loss(params_local, x_local, c_local, key, mask_local, col_local) ->
    (total, {"total", "kl", "ll"}) — StackedMultimodalCVAE.forward + .loss
    math with the modality/batch reductions as collectives."""
    m_total = stacked.modalities
    act = leaky_relu if stacked.non_linear else (lambda a: a)

    def loss_fn(params, x_local, c_local, key, mask_local, col_local):
        m_loc, b_loc, _ = x_local.shape
        e = params["enc"]
        h = jnp.concatenate(
            [x_local, jnp.broadcast_to(c_local, (m_loc,) + c_local.shape)],
            axis=2)
        for layp in e["layers"]:
            h = act(jnp.einsum("mbk,mkh->mbh", h, layp["w"])
                    + layp["b"][:, None, :])
        mus = jnp.einsum("mbk,mkz->mbz", h, e["wmu"]) + e["bmu"][:, None, :]
        logvars = (jnp.einsum("mbk,mkz->mbz", h, e["wlv"])
                   + e["blv"][:, None, :])

        alpha_full = lax.all_gather(params["alpha"], "modality", tiled=True)
        fused_mu, fused_var = fused_stats_collective(
            mus, jnp.exp(logvars), combine, alpha_full, m_total)
        fused_logvar = jnp.log(fused_var)
        z = reparameterize(key, fused_mu, fused_logvar)

        d = params["dec"]
        zc = jnp.concatenate([z, c_local], axis=1)
        g = act(jnp.einsum("bk,mkh->mbh", zc, d["layers"][0]["w"])
                + d["layers"][0]["b"][:, None, :])
        for layp in d["layers"][1:]:
            g = act(jnp.einsum("mbk,mkh->mbh", g, layp["w"])
                    + layp["b"][:, None, :])
        means = jnp.einsum("mbk,mkd->mbd", g, d["wm"]) + d["bm"][:, None, :]

        # loss (StackedMultimodalCVAE.loss math, reductions as collectives)
        col = col_local[:, None, :]
        lvo = d["lvo"][:, None, :]
        ll_elem = (-0.5 * (x_local - means) ** 2 * jnp.exp(-lvo)
                   - 0.5 * lvo - _HALF_LOG_2PI) * col
        ll_rows = jnp.sum(ll_elem, axis=2)                    # [M_loc, B_loc]
        kl_rows = -0.5 * jnp.sum(
            1 + fused_logvar - fused_mu ** 2 - jnp.exp(fused_logvar), axis=1)
        w = mask_local.astype(ll_rows.dtype)
        denom = jnp.maximum(lax.psum(jnp.sum(w), "data"), 1.0)
        ll_sum = lax.psum(
            jnp.sum(lax.psum(jnp.sum(ll_rows * w[None, :], axis=1), "data")
                    / denom), "modality")
        kl = lax.psum(jnp.sum(kl_rows * w), "data") / denom
        total = m_total * kl - ll_sum
        return total, {"total": total, "kl": m_total * kl, "ll": ll_sum}

    return loss_fn


def build_ep_step(stacked: StackedMultimodalCVAE,
                  optimizer: optax.GradientTransformation,
                  combine: str, mesh: Mesh):
    """step(params, opt_state, x_packed, c, key, mask) ->
    (params, opt_state, loss).

    ``params`` is the full packed pytree (stacked [M, ...] leaves — shard_map
    slices them over 'modality' per its in_specs); ``x_packed`` is
    [M, B, d_max] (modality x data sharded), ``c`` [B, c_dim] and ``mask``
    [B] (data-sharded), ``key`` replicated. The returned loss matches
    StackedMultimodalCVAE.loss()['total'].
    """
    _check_ep_geometry(stacked, mesh)
    m_total = stacked.modalities
    n_data = mesh.shape["data"]
    loss_fn = _make_ep_loss(stacked, combine)
    col_mask_full = _col_mask_full(stacked)

    def total_fn(params, x_local, c_local, key, mask_local, col_local):
        return loss_fn(params, x_local, c_local, key, mask_local,
                       col_local)[0]

    def shard_body(params, opt_state, x_local, c_local, key, mask_local,
                   col_local):
        if n_data > 1:
            # decorrelate the z draw per data shard; modality shards share
            # the SAME draw (z is one fused tensor) so no modality fold_in
            key = jax.random.fold_in(key, lax.axis_index("data"))
        loss, grads = jax.value_and_grad(total_fn)(
            params, x_local, c_local, key, mask_local, col_local)
        if n_data > 1:
            # sharded-params grads are exact per modality shard (the psum
            # transposes deliver cross-shard terms); over 'data' each shard
            # holds its batch rows' contribution to the same global-mean
            # loss, so the sum over 'data' completes them
            grads = lax.psum(grads, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    pspec = _param_spec(m_total)
    params_specs_fn = lambda tree: jax.tree_util.tree_map(pspec, tree)

    def step(params, opt_state, x_packed, c, key, mask=None):
        x_packed = jnp.asarray(x_packed)
        c = jnp.asarray(c)
        if mask is None:
            mask = jnp.ones((x_packed.shape[1],), jnp.float32)
        wrapped = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(params_specs_fn(params), params_specs_fn(opt_state),
                      P("modality", "data", None), P("data", None), P(),
                      P("data"), P("modality", None)),
            out_specs=(params_specs_fn(params), params_specs_fn(opt_state),
                       P()),
        )
        return wrapped(params, opt_state, x_packed, c, key, mask,
                       jnp.asarray(col_mask_full))

    return jax.jit(step)


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(lambda x, y: jnp.where(pred, x, y), a, b)


class EPFoldTrainer:
    """Whole-fold expert-parallel trainer: the epoch x batch ``lax.scan``
    runs INSIDE the shard body, so one jitted program trains the fold with
    the modalities sharded across devices and 2-4 latent-sized psums per
    step as the only inter-device traffic.

    PRNG stream matches train/packed.py's PackedFoldTrainer exactly (the
    same per-epoch/per-step key splits), so with n_data == 1 the trajectory
    is bit-compatible with the --packed_xla path; data shards fold_in their
    axis index into each step's draw (same estimator, different sample —
    see parallel/shardmap_step.py).
    """

    def __init__(self, model, config, n_samples: int, mesh: Mesh):
        from ..train.trainer import build_optimizer

        if config.shuffle:
            raise ValueError("EP trainer trains in fixed batch order")
        if config.precision != "fp32":
            raise ValueError("EP trainer is fp32 (parity path)")
        self.stacked = StackedMultimodalCVAE(
            model.input_dim_list, model.hidden_dim, model.latent_dim,
            model.c_dim, model.modalities, model.non_linear)
        _check_ep_geometry(self.stacked, mesh)
        if config.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"batch_size {config.batch_size} not divisible over the "
                f"{mesh.shape['data']}-way 'data' mesh axis")
        self.mesh = mesh
        self.config = config
        self.optimizer = build_optimizer(config, n_samples)
        self.n_data = mesh.shape["data"]
        self._loss = _make_ep_loss(self.stacked, config.combine)
        self._col = jnp.asarray(_col_mask_full(self.stacked))
        self._train = jax.jit(self._make_train(config.epochs,
                                               init_opt=True))
        self._chunk_cache: dict = {}

    # -- program construction -------------------------------------------------
    def _make_train(self, epochs: int, init_opt: bool):
        optimizer = self.optimizer
        n_data = self.n_data
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)
        pspec = _param_spec(self.stacked.modalities)

        def body(params, opt_state, key, batches, col_local):
            def step(carry, batch):
                params, opt_state, key = carry
                new_key, sub = jax.random.split(key)
                if n_data > 1:
                    sub = jax.random.fold_in(sub, lax.axis_index("data"))
                (_, aux), grads = grad_fn(params, batch["x"], batch["c"],
                                          sub, batch["mask"], col_local)
                if n_data > 1:
                    grads = lax.psum(grads, "data")
                updates, new_opt = optimizer.update(grads, opt_state, params)
                new_params = optax.apply_updates(params, updates)
                # skip all-padding batches (neither Adam moments nor the
                # PRNG stream advance) — train/trainer.py semantics
                valid = batch["valid"]
                params = _tree_where(valid, new_params, params)
                opt_state = _tree_where(valid, new_opt, opt_state)
                key = _tree_where(valid, new_key, key)
                return (params, opt_state, key), aux

            def epoch(carry, _):
                params, opt_state, key = carry
                # PackedFoldTrainer splits a (unused: shuffle=False)
                # shuffle key per epoch; reproduce for stream parity
                key, _unused = jax.random.split(key)
                (params, opt_state, key), aux = lax.scan(
                    step, (params, opt_state, key), batches)
                first = jax.tree_util.tree_map(lambda a: a[0], aux)
                return (params, opt_state, key), first

            (params, opt_state, key), logs = lax.scan(
                epoch, (params, opt_state, key), None, length=epochs)
            return params, opt_state, key, logs

        def batch_specs(batches):
            specs = {
                "x": P(None, "modality", "data", None),
                "c": P(None, "data", None),
                "mask": P(None, "data"),
                "valid": P(None),
            }
            return {k: specs[k] for k in batches}

        def tree_specs(tree):
            return jax.tree_util.tree_map(pspec, tree)

        if init_opt:
            def run_with_init(p, b, k, col):
                # optimizer.init on the LOCAL param slices: adam moments
                # mirror the modality sharding, counts are invariant scalars
                out_p, _, _, logs = body(p, optimizer.init(p), k, b, col)
                return out_p, logs

            def train(params, batches, key):
                wrapped = jax.shard_map(
                    run_with_init,
                    mesh=self.mesh,
                    in_specs=(tree_specs(params), batch_specs(batches), P(),
                              P("modality", None)),
                    out_specs=(tree_specs(params), P()),
                )
                return wrapped(params, batches, key, self._col)

            return train

        def chunk(params, opt_state, key, batches):
            wrapped = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(tree_specs(params), tree_specs(opt_state),
                          P(), batch_specs(batches), P("modality", None)),
                out_specs=(tree_specs(params), tree_specs(opt_state), P(),
                           P()),
            )
            return wrapped(params, opt_state, key, batches, self._col)

        return chunk

    # -- public API (PackedFoldTrainer-compatible) -----------------------------
    def chunk_fn(self, n_epochs: int):
        """Jitted resumable slice: (params, opt_state, key, batches) ->
        (params, opt_state, key, logs), cached per size."""
        if n_epochs not in self._chunk_cache:
            self._chunk_cache[n_epochs] = jax.jit(
                self._make_train(n_epochs, init_opt=False))
        return self._chunk_cache[n_epochs]

    def _packed(self, per_modality_params):
        from ..train.packed import _pack_params_host

        memo = getattr(self, "_pack_memo", None)
        if memo is not None and memo[0] is per_modality_params:
            return memo[1]
        packed = _pack_params_host(self.stacked, per_modality_params)
        self._pack_memo = (per_modality_params, packed)
        return packed

    def _batches(self, data_list, cov):
        from ..train.packed import make_packed_fold_batches

        return make_packed_fold_batches(self.stacked, data_list, cov,
                                        self.config.batch_size)

    def run(self, per_modality_params, data_list, cov, key=None):
        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        packed = self._packed(per_modality_params)
        batches = self._batches(data_list, cov)
        out, logs = self._train(packed, batches, key)
        host = jax.tree_util.tree_map(np.asarray, jax.device_get(out))
        return (self.stacked.unpack_params(host),
                jax.tree_util.tree_map(np.asarray, jax.device_get(logs)))

    def compile(self, per_modality_params, data_list, cov, key=None) -> float:
        """Lower + compile the EP program without running it; seconds."""
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
        """Checkpointed EP training (state = the PACKED pytree, like the
        packed trainer's own dirs); kill-and-resume is bit-identical to the
        uninterrupted EP run."""
        from ..train.checkpoints import run_chunked

        if key is None:
            key = jax.random.PRNGKey(self.config.seed)
        packed = self._packed(per_modality_params)
        batches = self._batches(data_list, cov)

        def template_fn():
            shapes = jax.eval_shape(self.optimizer.init, packed)
            return {"params": packed, "key": key,
                    "opt_state": jax.tree_util.tree_map(
                        lambda s: np.zeros(s.shape, s.dtype), shapes)}

        def run_chunk(n, p, opt_state, k):
            if opt_state is None:
                opt_state = jax.jit(self.optimizer.init)(p)
            return self.chunk_fn(n)(p, opt_state, k, batches)

        params, logs = run_chunked(state_dir, self.config.epochs,
                                   checkpoint_every, resume, packed, None,
                                   key, run_chunk, template_fn)
        host = jax.tree_util.tree_map(np.asarray, jax.device_get(params))
        return self.stacked.unpack_params(host), logs
