"""Fused decoder-head + Gaussian-NLL op with a hand-derived backward
(custom VJP), batch-tiled — the surgical fix for the wide-feature regime.

Why this architecture: at PPMI width (3x3485) the XLA backward costs ~3x
the forward because autodiff materializes the WIDE intermediates of the
decoder head in HBM — the recon means [B, D], the residual, and dmean each
round-trip per modality per step (RESULTS.md round-2 fused-width table).
The whole-step fused kernels attack this too, but their weights+grads for
ALL layers x modalities must co-reside in VMEM, which Mosaic rejects above
~w1536 x 3 modalities (measured, round 3). This op fuses ONLY the wide
segment — the final H -> D projection plus the masked Gaussian NLL
(ops/losses.gaussian_ll, reference cVAE.py:14-15,:1187-1196) — so:

  * forward emits just the per-call scalar ll: the [B, D] means live and
    die in VMEM (no HBM write for the backward's benefit);
  * the backward RECOMPUTES the means tile-by-tile (one extra [tile, H] x
    [H, D] matmul — cheap) and produces d_vm/d_cm/d_lvo/dg with zero wide
    HBM intermediates: HBM sees one read of x and the weights and one
    write of the narrow dg [B, H];
  * resident VMEM is one modality's head (~2 x [H, D] fp32 at PPMI width,
    ~4 MiB) — far under Mosaic's limits, for any modality count, because
    the narrow encoder/decoder-hidden/fusion math stays in XLA (which
    pipelines it against these kernels).

Used by ``fused_decoder_loss_fn`` (a drop-in loss for the cVAE family's
trainers, CLI ``--fused_decoder``); gradient parity vs jax.grad of the
plain loss in tests/test_decoder_nll.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import LANE, _on_tpu, _round_up

_HALF_LOG_2PI = 0.9189385332046727


def _fwd_kernel(d_true: int, g_ref, vm_ref, cm_ref, lvo_ref, x_ref, rm_ref,
                nval_ref, ll_ref):
    i = pl.program_id(0)
    rm = rm_ref[:, :1]
    n = nval_ref[0, 0]
    cmask = (jax.lax.broadcasted_iota(jnp.int32, (1, x_ref.shape[1]), 1)
             < d_true).astype(jnp.float32)
    mean = jnp.dot(g_ref[...], vm_ref[...],
                   preferred_element_type=jnp.float32) + cm_ref[...]
    lvo = lvo_ref[...]
    diff = x_ref[...].astype(jnp.float32) - mean
    ll_elem = (-0.5 * diff * diff * jnp.exp(-lvo) - 0.5 * lvo
               - _HALF_LOG_2PI)
    tile_ll = jnp.reshape(jnp.sum(ll_elem * cmask * rm) / n, (1, 1))

    @pl.when(i == 0)
    def _():
        ll_ref[...] = tile_ll

    @pl.when(i > 0)
    def _():
        ll_ref[...] = ll_ref[...] + tile_ll


def _bwd_kernel(d_true: int, g_ref, vm_ref, cm_ref, lvo_ref, x_ref, rm_ref,
                nval_ref, gbar_ref, dg_ref, dvm_ref, dcm_ref, dlvo_ref):
    i = pl.program_id(0)
    first = i == 0
    rm = rm_ref[:, :1]
    n = nval_ref[0, 0]
    gbar = gbar_ref[0, 0]
    cmask = (jax.lax.broadcasted_iota(jnp.int32, (1, x_ref.shape[1]), 1)
             < d_true).astype(jnp.float32)
    g = g_ref[...]
    # recompute the means for this tile (VMEM-resident, never in HBM)
    mean = jnp.dot(g, vm_ref[...],
                   preferred_element_type=jnp.float32) + cm_ref[...]
    lvo = lvo_ref[...]
    q = jnp.exp(-lvo)
    diff = x_ref[...].astype(jnp.float32) - mean
    # d(ll)/dmean = +(rm*cmask*q*diff)/n (the primal here is ll itself,
    # not the negated total); the caller's cotangent gbar scales everything
    dmean = (rm * cmask * q * diff) * (gbar / n)
    d_lvo_t = jnp.sum(rm * cmask * (0.5 * diff * diff * q - 0.5),
                      axis=0, keepdims=True) * (gbar / n)
    d_vm_t = jnp.dot(g.T, dmean, preferred_element_type=jnp.float32)
    d_cm_t = jnp.sum(dmean, axis=0, keepdims=True)
    dg_ref[...] = jnp.dot(dmean, vm_ref[...].T,
                          preferred_element_type=jnp.float32)

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] = ref[...] + val

    acc(dvm_ref, d_vm_t)
    acc(dcm_ref, d_cm_t)
    acc(dlvo_ref, d_lvo_t)


@functools.lru_cache(maxsize=None)
def _make_op(d_true: int, tile_b: int, interpret: bool):
    """Build the custom-VJP decoder_nll for a static feature width.

    Signature of the returned fn:
      ll = op(g [B, Hp], vm [Hp, Dp], cm [1, Dp], lvo [1, Dp],
              x [B, Dp], rm [B, LANE], n [1, 1])
    Operands must be lane-padded (Hp, Dp multiples of 128; B a multiple of
    tile_b) — ``decoder_nll`` below does the padding.
    """

    def tile_rows(cols):
        return pl.BlockSpec((tile_b, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const2(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def fwd_call(g, vm, cm, lvo, x, rm, n):
        hp, dp = vm.shape
        grid = (g.shape[0] // tile_b,)
        ll = pl.pallas_call(
            functools.partial(_fwd_kernel, d_true),
            grid=grid,
            in_specs=[tile_rows(hp), const2(hp, dp), const2(1, dp),
                      const2(1, dp), tile_rows(dp), tile_rows(LANE),
                      pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            interpret=interpret,
        )(g, vm, cm, lvo, x, rm, n)
        return ll[0, 0]

    def bwd_call(g, vm, cm, lvo, x, rm, n, gbar):
        hp, dp = vm.shape
        b = g.shape[0]
        grid = (b // tile_b,)
        dg, dvm, dcm, dlvo = pl.pallas_call(
            functools.partial(_bwd_kernel, d_true),
            grid=grid,
            in_specs=[tile_rows(hp), const2(hp, dp), const2(1, dp),
                      const2(1, dp), tile_rows(dp), tile_rows(LANE),
                      pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM)],
            out_specs=[tile_rows(hp), const2(hp, dp), const2(1, dp),
                       const2(1, dp)],
            out_shape=[jax.ShapeDtypeStruct((b, hp), jnp.float32),
                       jax.ShapeDtypeStruct((hp, dp), jnp.float32),
                       jax.ShapeDtypeStruct((1, dp), jnp.float32),
                       jax.ShapeDtypeStruct((1, dp), jnp.float32)],
            interpret=interpret,
        )(g, vm, cm, lvo, x, rm, n, gbar)
        return dg, dvm, dcm, dlvo

    @jax.custom_vjp
    def op(g, vm, cm, lvo, x, rm, n):
        return fwd_call(g, vm, cm, lvo, x, rm, n)

    def op_fwd(g, vm, cm, lvo, x, rm, n):
        return fwd_call(g, vm, cm, lvo, x, rm, n), (g, vm, cm, lvo, x, rm, n)

    def op_bwd(res, gbar):
        g, vm, cm, lvo, x, rm, n = res
        dg, dvm, dcm, dlvo = bwd_call(
            g, vm, cm, lvo, x, rm, n,
            jnp.reshape(gbar, (1, 1)).astype(jnp.float32))
        # x/rm/n are data: their zero cotangents are broadcasts of a
        # constant — DCE removes them (nothing consumes data gradients)
        return (dg, dvm, dcm, dlvo, jnp.zeros_like(x), jnp.zeros_like(rm),
                jnp.zeros_like(n))

    op.defvjp(op_fwd, op_bwd)
    return op


def decoder_nll(g, w, b, lvo, x, mask, n, tile_b: int = 64,
                interpret: bool | None = None):
    """Masked Gaussian NLL of ``x`` under the decoder head
    ``N(g @ w + b, exp(lvo))`` — value-equal to
    ``ops.losses.gaussian_ll(x, g @ w + b, lvo, mask)`` with
    ``n == max(sum(mask), 1)``, computed without materializing the wide
    mean/residual in HBM (forward OR backward).

    g: [B, H] last decoder hidden activation; w: [H, D]; b: [D];
    lvo: [1, D]; x: [B, D]; mask: [B] row mask.
    """
    if interpret is None:
        interpret = not _on_tpu()
    b_rows, h = g.shape
    d = x.shape[1]
    hp, dp = _round_up(h, LANE), _round_up(d, LANE)
    bp = _round_up(b_rows, tile_b)
    op = _make_op(d, tile_b, bool(interpret))

    g_p = jnp.pad(g.astype(jnp.float32),
                  ((0, bp - b_rows), (0, hp - h)))
    w_p = jnp.pad(w.astype(jnp.float32), ((0, hp - h), (0, dp - d)))
    b_p = jnp.pad(jnp.reshape(b, (1, -1)).astype(jnp.float32),
                  ((0, 0), (0, dp - d)))
    lvo_p = jnp.pad(jnp.reshape(lvo, (1, -1)).astype(jnp.float32),
                    ((0, 0), (0, dp - d)))
    x_p = jnp.pad(x.astype(jnp.float32), ((0, bp - b_rows), (0, dp - d)))
    rm = jnp.tile(jnp.pad(mask.astype(jnp.float32),
                          (0, bp - b_rows))[:, None], (1, LANE))
    n_arr = jnp.reshape(n, (1, 1)).astype(jnp.float32)
    return op(g_p, w_p, b_p, lvo_p, x_p, rm, n_arr)


def fused_decoder_loss_fn(model, config):
    """Drop-in ``loss_fn(params, batch, key)`` for the cVAE variant with
    the wide decoder-head + NLL segment fused (same math as
    ``default_loss_fn`` / MultimodalCVAE.loss variant 'cvae':
    total = M*KL - sum_m ll_m; reference cVAE.py:1187-1196)."""
    from ..models.cvae import reparameterize
    from ..ops.linear import apply_linear, leaky_relu
    from ..ops.losses import kl_standard_normal

    if getattr(model, "variant", None) != "cvae":
        raise ValueError("fused decoder path supports the 'cvae' variant")
    combine = config.combine
    m_count = model.modalities

    def loss_fn(p, batch, k):
        xes, cs, mask = batch["x"], batch["c"], batch["mask"]
        mus, logvars = model.encode_all(p, list(xes), list(cs))
        fmu, flv = model.fuse(p, mus, logvars, combine)
        z = reparameterize(k, fmu, flv)
        kl = kl_standard_normal(fmu, flv, mask)
        n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
        ll_total = 0.0
        for m in range(m_count):
            dec = p["dec"][m]
            h = jnp.concatenate([z, cs[m].reshape(z.shape[0], -1)], axis=1)
            for layer in dec["hidden"]:
                h = apply_linear(layer, h)
                if model.non_linear:
                    h = leaky_relu(h)
            ll_total = ll_total + decoder_nll(
                h, dec["mean"]["w"], dec["mean"]["b"], dec["logvar_out"],
                xes[m], mask, n)
        total = m_count * kl - ll_total
        return total, {"total": total, "kl": m_count * kl, "ll": ll_total}

    return loss_fn
