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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.cvae import reparameterize
from ..models.stacked import StackedMultimodalCVAE
from ..ops.linear import leaky_relu
from ..train.packed import PackedStateTrainerBase
from ..train.trainer import _tree_where

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


def make_ep_mesh3(n_fold: int, n_modality: int, n_data: Optional[int] = None,
                  devices: Optional[Sequence] = None) -> Mesh:
    """A ('fold', 'modality', 'data') mesh: fold-parallel training with the
    packed modality axis additionally sharded (GSPMD path — see
    packed_fold_shardings)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % (n_fold * n_modality):
            raise ValueError(
                f"{len(devices)} devices not divisible into "
                f"{n_fold}x{n_modality} fold x modality groups")
        n_data = len(devices) // (n_fold * n_modality)
    if n_fold * n_modality * n_data != len(devices):
        raise ValueError(
            f"mesh {n_fold}x{n_modality}x{n_data} != {len(devices)} devices")
    grid = np.asarray(devices).reshape(n_fold, n_modality, n_data)
    return Mesh(grid, ("fold", "modality", "data"))


def packed_fold_shardings(mesh: Mesh, params_tree, batches_tree, keys):
    """jit in_shardings for the packed fold-parallel trainer
    (train/packed.py PackedMultiFoldTrainer) over a
    ('fold', 'modality', 'data') mesh.

    Every packed-param leaf is [F, M, ...] (stack_params over
    pack_params layouts, alpha included) -> P('fold', 'modality', ...);
    batches shard x [F, NB, M, B, D] over (fold, modality, data rows) and
    the shared covariate/mask blocks over (fold, data rows). XLA/GSPMD then
    inserts the modality-axis all-reduces for the fusion reductions
    (ops/fusion.py jnp.sum over the modality axis) and the grad psums over
    'data' — the same collectives parallel/modality.py schedules by hand
    with shard_map, compiler-placed instead.
    """
    def param_spec(leaf):
        nd = np.ndim(leaf)
        if nd >= 2:
            return NamedSharding(mesh,
                                 P("fold", "modality", *([None] * (nd - 2))))
        return NamedSharding(mesh, P(*(["fold"] if nd else [])))

    params_sh = jax.tree_util.tree_map(param_spec, params_tree)
    batch_specs = {
        "x": P("fold", None, "modality", "data", None),
        "c": P("fold", None, "data", None),
        "mask": P("fold", None, "data"),
        "valid": P("fold", None),
    }
    batches_sh = {k: NamedSharding(mesh, batch_specs[k])
                  for k in batches_tree}
    keys_sh = NamedSharding(mesh, P("fold", *([None] * (np.ndim(keys) - 1))))
    return params_sh, batches_sh, keys_sh


def _packed_opt_shardings(mesh, opt_state, params, params_sh):
    """optax state shardings mirroring packed_fold_shardings' param rule
    (adam moments are param-shaped [F, M, ...]; counts are scalars)."""
    def spec(leaf):
        nd = np.ndim(leaf)
        if nd >= 2:
            return NamedSharding(mesh,
                                 P("fold", "modality", *([None] * (nd - 2))))
        return NamedSharding(mesh, P(*(["fold"] if nd else [])))

    return jax.tree_util.tree_map(spec, opt_state)


packed_fold_shardings.opt = _packed_opt_shardings


def ep_divisible_spec(nm: int, shape, maxis: int = 1,
                      lead=("fold",)) -> P:
    """ONE owner for the EP divisible-or-replicate rule used by every
    grouped-layout surface (the train shardings below, serve's resident
    ensemble, the test stage's fold-vmapped inference): shard dim
    ``maxis`` of a leaf with dims ``shape`` over 'modality' when ``nm``
    (the mesh's 'modality' AXIS SIZE) divides that dim's length,
    replicate it otherwise.
    ``lead`` names the leading dims (usually the fold axis — truncated to
    the leaf's rank); dims past ``maxis`` replicate. Width-uniform [M]
    axes always divide; ragged width-group axes replicate (the groups are
    separable by construction). A NON-modality dim whose length happens
    to divide must NOT reach this rule — callers with such leaves (e.g.
    the endtoend classifier) route them to a fold-only spec explicitly."""
    nd = len(shape)
    names = list(lead[:nd])
    if nd > maxis and shape[maxis] % nm == 0:
        return P(*names, *([None] * (maxis - len(names))), "modality",
                 *([None] * (nd - maxis - 1)))
    return P(*names)


def grouped_fold_shardings(mesh: Mesh, params_tree, batches_tree, keys):
    """jit in_shardings for the GROUPED fold-parallel trainer
    (train/grouped.py GroupedMultiFoldTrainer) over a
    ('fold', 'modality', 'data') mesh — EP composed with the pad-free
    layout (round 5).

    The grouped pytree carries two kinds of modality-ish axes: the
    width-uniform [M] leaves (hidden layers, mu/logvar heads, alpha) and
    the per-width-group [G_g] leaves (encoder layer 0, decoder heads).
    The groups are separable by construction, so each leaf shards its
    axis-1 over 'modality' WHEN DIVISIBLE and replicates otherwise — on
    the flagship UCA cohort (groups of 3 narrow + 1 wide) the uniform
    leaves (the bulk of the chain) shard while the ragged group heads
    replicate; a uniform-width cohort shards everything, matching
    packed_fold_shardings. GSPMD inserts the fusion all-reduces over
    'modality' and the grad psums over 'data'."""
    nm = mesh.shape["modality"]

    def leaf_spec(leaf):
        return NamedSharding(mesh, ep_divisible_spec(nm, np.shape(leaf)))

    params_sh = jax.tree_util.tree_map(leaf_spec, params_tree)

    def x_spec(leaf):
        g = np.shape(leaf)[2]        # [F, NB, G_g, B, d_g]
        return NamedSharding(mesh, P(
            "fold", None, "modality" if g % nm == 0 else None, "data",
            None))

    batches_sh = {
        "x": tuple(x_spec(x) for x in batches_tree["x"]),
        "c": NamedSharding(mesh, P("fold", None, "data", None)),
        "mask": NamedSharding(mesh, P("fold", None, "data")),
        "valid": NamedSharding(mesh, P("fold", None)),
    }
    batches_sh = {k: batches_sh[k] for k in batches_tree}
    keys_sh = NamedSharding(mesh, P("fold", *([None] * (np.ndim(keys) - 1))))
    return params_sh, batches_sh, keys_sh


def _grouped_opt_shardings(mesh, opt_state, params, params_sh):
    """optax state shardings mirroring grouped_fold_shardings' param rule
    (adam moments are param-shaped; counts are scalars)."""
    nm = mesh.shape["modality"]

    def spec(leaf):
        return NamedSharding(mesh, ep_divisible_spec(nm, np.shape(leaf)))

    return jax.tree_util.tree_map(spec, opt_state)


grouped_fold_shardings.opt = _grouped_opt_shardings


def grouped_e2e_fold_shardings(mesh: Mesh, params_tree, batches_tree, keys):
    """jit in_shardings for the packed dual-bank endtoend trainer
    (train/packed_endtoend.GroupedEndToEndMultiTrainer) over a
    ('fold', 'modality', 'data') mesh.

    The enc/dec subtrees follow grouped_fold_shardings' divisible-or-
    replicate rule — the endtoend decoder axis is [2M] (both banks), so it
    shards over 'modality' whenever 2M divides, putting each device
    group's slice of BOTH banks' experts local. The classifier/BatchNorm
    leaves are latent-width tensors with NO modality axis: they replicate
    over 'modality' explicitly (a dimension-divisibility heuristic would
    happily shard a classifier's contraction dim that happens to divide).
    The labels extras block rides the batch-row sharding."""
    nm = mesh.shape["modality"]

    def leaf_spec(leaf):
        return NamedSharding(mesh, ep_divisible_spec(nm, np.shape(leaf)))

    def fold_only(leaf):
        return NamedSharding(mesh, P(*(["fold"] if np.ndim(leaf) else [])))

    params_sh = {
        "enc": jax.tree_util.tree_map(leaf_spec, params_tree["enc"]),
        "dec": jax.tree_util.tree_map(leaf_spec, params_tree["dec"]),
        "classifier": jax.tree_util.tree_map(fold_only,
                                             params_tree["classifier"]),
        "bn_state": jax.tree_util.tree_map(fold_only,
                                           params_tree["bn_state"]),
    }

    def x_spec(leaf):
        g = np.shape(leaf)[2]        # [F, NB, 2G_g, B, d_g]
        return NamedSharding(mesh, P(
            "fold", None, "modality" if g % nm == 0 else None, "data",
            None))

    batches_sh = {
        "x": tuple(x_spec(x) for x in batches_tree["x"]),
        "c": NamedSharding(mesh, P("fold", None, "data", None)),
        "mask": NamedSharding(mesh, P("fold", None, "data")),
        "valid": NamedSharding(mesh, P("fold", None)),
        "extras": {"labels": NamedSharding(mesh,
                                           P("fold", None, "data", None))},
    }
    batches_sh = {k: batches_sh[k] for k in batches_tree}
    keys_sh = NamedSharding(mesh, P("fold", *([None] * (np.ndim(keys) - 1))))
    return params_sh, batches_sh, keys_sh


def _grouped_e2e_opt_shardings(mesh, opt_state, params, params_sh):
    """optax state shardings for the dual-bank endtoend trainer: adam
    moments are param-shaped — reuse the param rule per moment tree."""
    def spec_like(moment_tree):
        return {
            "enc": jax.tree_util.tree_map(
                lambda l: _e2e_leaf(mesh, l), moment_tree["enc"]),
            "dec": jax.tree_util.tree_map(
                lambda l: _e2e_leaf(mesh, l), moment_tree["dec"]),
            "classifier": jax.tree_util.tree_map(
                lambda l: _e2e_fold(mesh, l), moment_tree["classifier"]),
            "bn_state": jax.tree_util.tree_map(
                lambda l: _e2e_fold(mesh, l), moment_tree["bn_state"]),
        }

    def spec(leaf_or_tree):
        if isinstance(leaf_or_tree, dict) and "enc" in leaf_or_tree:
            return spec_like(leaf_or_tree)
        return jax.tree_util.tree_map(lambda l: _e2e_fold(mesh, l),
                                      leaf_or_tree)

    return jax.tree_util.tree_map(
        spec, opt_state,
        is_leaf=lambda n: isinstance(n, dict) and "enc" in n)


def _e2e_leaf(mesh, leaf):
    return NamedSharding(
        mesh, ep_divisible_spec(mesh.shape["modality"], np.shape(leaf)))


def _e2e_fold(mesh, leaf):
    return NamedSharding(mesh, P(*(["fold"] if np.ndim(leaf) else [])))


grouped_e2e_fold_shardings.opt = _grouped_e2e_opt_shardings


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
    col_mask_full = stacked.col_mask_np()

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
        if x_packed.shape[1] % n_data:
            raise ValueError(
                f"batch dim {x_packed.shape[1]} not divisible over the "
                f"{n_data}-way 'data' mesh axis")
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


class EPFoldTrainer(PackedStateTrainerBase):
    """Whole-fold expert-parallel trainer: the epoch x batch ``lax.scan``
    runs INSIDE the shard body, so one jitted program trains the fold with
    the modalities sharded across devices and 2-4 latent-sized psums per
    step as the only inter-device traffic.

    PRNG stream matches train/packed.py's PackedFoldTrainer exactly (the
    same per-epoch/per-step key splits), so with n_data == 1 the trajectory
    matches the --packed_xla path to float tolerance (the psums reorganize
    the modality-axis summation order, so parity is ulp-level, NOT
    bit-identical — tests/test_modality_parallel.py); data shards fold_in
    their axis index into each step's draw (same estimator, different
    sample — see parallel/shardmap_step.py).
    """

    # shard_map's in_specs place the batch shards; a device_put here would
    # commit the whole batch to one device first
    _place = staticmethod(lambda x: x)

    def __init__(self, model, config, n_samples: int, mesh: Mesh):
        from ..train.trainer import build_optimizer

        if config.shuffle:
            raise ValueError("EP trainer trains in fixed batch order")
        if config.precision != "fp32":
            raise ValueError("EP trainer is fp32 (parity path)")
        if getattr(model, "variant", None) != "cvae":
            # documented contract (tested): the 2-axis EP trainer schedules
            # the fusion collectives BY HAND for the cvae loss; the mmjsd/
            # mvtcae skeleton variants ride --packed_xla or the 3-axis
            # (F,M,D) GSPMD form, where the compiler places the variant's
            # collectives itself
            raise ValueError(
                f"expert-parallel (M,D) training supports variant 'cvae' "
                f"only (got {getattr(model, 'variant', None)!r}); use "
                "--packed_xla or the 3-axis --ep_mesh F,M,D form for "
                "mmjsd/mvtcae")
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
        # resume-guard fingerprint (checkpoints.run_chunked via
        # PackedStateTrainerBase): the EP trajectory depends on the mesh
        # geometry (psum partial-sum order), so resumes under a different
        # axis split are refused
        from ..train.trainer import add_batch_meta

        self.loss_meta = add_batch_meta({
            "loss": "packed_stacked", "precision": config.precision,
            "path": ("ep:" + ",".join(f"{n}={mesh.shape[n]}"
                                      for n in mesh.axis_names))}, config)
        self.optimizer = build_optimizer(config, n_samples)
        self.n_data = mesh.shape["data"]
        self._loss = _make_ep_loss(self.stacked, config.combine)
        # numpy until the jit boundary: an eager jnp conversion is a remote
        # round trip through the TPU tunnel at construction time
        self._col = self.stacked.col_mask_np()
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

    def chunk_fn(self, n_epochs: int):
        """Jitted resumable slice: (params, opt_state, key, batches) ->
        (params, opt_state, key, logs), cached per size. run/compile/
        run_resumable come from PackedStateTrainerBase."""
        if n_epochs not in self._chunk_cache:
            self._chunk_cache[n_epochs] = jax.jit(
                self._make_train(n_epochs, init_opt=False))
        return self._chunk_cache[n_epochs]
