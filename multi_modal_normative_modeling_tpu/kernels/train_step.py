"""Fully-fused cVAE training step (forward + hand-derived backward) in one
Pallas TPU kernel.

Why: the per-step time of the XLA train step is bound by HBM traffic of
intermediate activations between fusion boundaries (~65-77us/step for the
flagship workload at <20% MXU utilization; bf16 doesn't help). This kernel
runs the complete packed-modality forward (encoders -> fusion ->
reparameterize -> decoders -> masked ELBO) *and* its backward inside a single
pallas_call, so every activation lives and dies in VMEM: HBM sees one read of
the batch and weights and one write of the gradients.

Scope: the packed cVAE family (models/stacked.py layout), 2 hidden layers,
fusion in {poe, gpoe, moe, mopoe}, fp32. Gradients are verified against
jax.grad of the stacked model in tests/test_train_step_kernel.py (interpret
mode on CPU and on real TPU).

Backward math (masked batch mean over N = sum(rowmask); M modalities):
  total = M*kl - sum_m ll_m
  NLL:    dmean_m = -(rm*cm*q_m*(x-mean))/N,  q_m = exp(-lvo_m)
          dlvo_m  = -sum_b rm*cm*(0.5*(x-mean)^2*q_m - 0.5)/N
  decoder chain: standard MLP backprop with lrelu'(z) recovered from the
          sign of the stored activation (lrelu preserves sign)
  KL:     dmu += M*rm*mu/N ; dlgv += -0.5*M*rm*(1 - e^lgv)/N
  reparam z = mu + eps*e^{lgv/2}: dmu += dz ; dlgv += 0.5*dz*eps*e^{lgv/2}
  gpoe fusion p_m = s_m e^{-lv_m}, P = sum p, mu = sum(p_m mu_m)/P,
          lgv = -log P:
          dP    = -dlgv/P - dmu*mu/P
          dp_m  = dmu*mu_m/P + dP
          dmu_m = dmu*p_m/P ;  dlv_m = -dp_m*p_m
          dalpha via softmax backward of ds_m = sum(dp_m * e^{-lv_m})
  moe:    mu = mean(mu_m), var = mean(e^{lv_m}), lgv = log var:
          dmu_m = dmu/M ; dlv_m = (dlgv/var)*e^{lv_m}/M
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import LANE, SUBLANE, _on_tpu, _round_up

_HALF_LOG_2PI = 0.9189385332046727


def _lrelu(v):
    return jnp.where(v > 0, v, 0.01 * v)


def _dlrelu_from_out(a):
    # lrelu is sign-preserving: a > 0 <=> pre-activation > 0
    return jnp.where(a > 0, 1.0, 0.01)


def _kernel(m_count: int, combine: str, *refs):
    (xc, x, c_tail, eps, rowmask, zmask, colmask, nvalid,
     alpha, w1, b1, w2, b2, wmu, bmu, wlv, blv,
     v1, c1, v2, c2, vm, cm, lvo,
     losses_out, d_alpha, d_w1, d_b1, d_w2, d_b2, d_wmu, d_bmu, d_wlv, d_blv,
     d_v1, d_c1, d_v2, d_c2, d_vm, d_cm, d_lvo) = refs

    n = nvalid[0, 0]
    rm = rowmask[:]                      # [B, 1]
    zm = zmask[:]                        # [1, Zp]
    M = m_count

    # ---------------- forward: encoders -----------------------------------
    a1s, a2s, mus, lvs = [], [], [], []
    for m in range(M):
        a0 = xc[m]
        h1 = _lrelu(jnp.dot(a0, w1[m], preferred_element_type=jnp.float32)
                    + b1[m])
        h2 = _lrelu(jnp.dot(h1, w2[m], preferred_element_type=jnp.float32)
                    + b2[m])
        a1s.append(h1)
        a2s.append(h2)
        mus.append(jnp.dot(h2, wmu[m], preferred_element_type=jnp.float32)
                   + bmu[m])
        lvs.append(jnp.dot(h2, wlv[m], preferred_element_type=jnp.float32)
                   + blv[m])

    # ---------------- fusion ------------------------------------------------
    # alpha lives in SMEM; the softmax runs on M scalars (static M)
    if M == 1:
        mu, lgv = mus[0], lvs[0]
    elif combine == "moe":
        mu = sum(mus) / M
        var = sum(jnp.exp(lv) for lv in lvs) / M
        lgv = jnp.log(var)
    elif combine == "mopoe":
        # PoE expert appended, then uniform mixture (cVAE.py:1060-1083)
        vars_m = [jnp.exp(lv) for lv in lvs]
        Ts = [1.0 / v for v in vars_m]
        Tsum = sum(Ts)
        mu_p = sum(Ts[m] * mus[m] for m in range(M)) / Tsum
        var_p = 1.0 / Tsum
        mu = (sum(mus) + mu_p) / (M + 1)
        var = (sum(vars_m) + var_p) / (M + 1)
        lgv = jnp.log(var)
    else:  # poe / gpoe over variances
        if combine == "gpoe":
            a_vals = [alpha[m, 0] for m in range(M)]
            amax = a_vals[0]
            for v in a_vals[1:]:
                amax = jnp.maximum(amax, v)
            aexp = [jnp.exp(v - amax) for v in a_vals]
            ssum = sum(aexp)
            s = [aexp[m] / ssum for m in range(M)]
        else:
            s = [jnp.float32(1.0) for _ in range(M)]
        ps = [s[m] * jnp.exp(-lvs[m]) for m in range(M)]
        P = sum(ps)
        mu = sum(ps[m] * mus[m] for m in range(M)) / P
        lgv = -jnp.log(P)

    # ---------------- reparameterize + decoders ----------------------------
    half = jnp.exp(0.5 * lgv)
    z = (mu + eps[:] * half) * zm          # padded latent dims zeroed
    zc = jnp.concatenate([z, c_tail[:]], axis=1)

    g1s, g2s, means = [], [], []
    for m in range(M):
        y1 = _lrelu(jnp.dot(zc, v1[m], preferred_element_type=jnp.float32)
                    + c1[m])
        y2 = _lrelu(jnp.dot(y1, v2[m], preferred_element_type=jnp.float32)
                    + c2[m])
        g1s.append(y1)
        g2s.append(y2)
        means.append(jnp.dot(y2, vm[m], preferred_element_type=jnp.float32)
                     + cm[m])

    # ---------------- losses ------------------------------------------------
    # zm masks padded latent dims: unnormalized-precision fusions (poe) give
    # them lgv = -log(M) != 0, which must not contribute to the KL
    kl_rows = -0.5 * jnp.sum(
        (1.0 + lgv - mu ** 2 - jnp.exp(lgv)) * zm, axis=1, keepdims=True)
    kl = jnp.sum(kl_rows * rm) / n

    ll_total = 0.0
    d_zc = jnp.zeros_like(zc)
    for m in range(M):
        cmask = colmask[m]                 # [1, D]
        q = jnp.exp(-lvo[m])               # [1, D]
        diff = x[m] - means[m]
        ll_elem = (-0.5 * diff * diff * q - 0.5 * lvo[m] - _HALF_LOG_2PI)
        ll_m = jnp.sum(ll_elem * cmask * rm) / n
        ll_total += ll_m

        # ---- backward: NLL -> decoder chain (interleaved to free buffers)
        dmean = -(rm * cmask * q * diff) / n
        d_lvo[m] = -jnp.sum(
            rm * cmask * (0.5 * diff * diff * q - 0.5), axis=0, keepdims=True
        ) / n
        d_vm[m] = jnp.dot(g2s[m].T, dmean, preferred_element_type=jnp.float32)
        d_cm[m] = jnp.sum(dmean, axis=0, keepdims=True)
        dg2 = jnp.dot(dmean, vm[m].T, preferred_element_type=jnp.float32)
        dy2 = dg2 * _dlrelu_from_out(g2s[m])
        d_v2[m] = jnp.dot(g1s[m].T, dy2, preferred_element_type=jnp.float32)
        d_c2[m] = jnp.sum(dy2, axis=0, keepdims=True)
        dg1 = jnp.dot(dy2, v2[m].T, preferred_element_type=jnp.float32)
        dy1 = dg1 * _dlrelu_from_out(g1s[m])
        d_v1[m] = jnp.dot(zc.T, dy1, preferred_element_type=jnp.float32)
        d_c1[m] = jnp.sum(dy1, axis=0, keepdims=True)
        d_zc = d_zc + jnp.dot(dy1, v1[m].T,
                              preferred_element_type=jnp.float32)

    total = M * kl - ll_total
    losses_out[0, 0] = total
    losses_out[0, 1] = M * kl
    losses_out[0, 2] = ll_total

    # ---------------- backward: reparam + KL --------------------------------
    z_width = z.shape[1]
    dz = d_zc[:, :z_width] * zm
    dmu = dz + (M * rm * mu * zm) / n
    dlgv = (0.5 * dz * eps[:] * half) - 0.5 * M * rm * zm * (
        1.0 - jnp.exp(lgv)) / n

    # ---------------- backward: fusion --------------------------------------
    for m in range(M):
        d_alpha[m, 0] = jnp.float32(0.0)
    if M == 1:
        dmus = [dmu]
        dlvs = [dlgv]
    elif combine == "moe":
        dvar = dlgv / var
        dmus = [dmu / M for _ in range(M)]
        dlvs = [(dvar / M) * jnp.exp(lvs[m]) for m in range(M)]
    elif combine == "mopoe":
        dvar = dlgv / var
        dmu_p = dmu / (M + 1)
        dvar_p = dvar / (M + 1)
        dTsum = -dvar_p / (Tsum * Tsum) - dmu_p * mu_p / Tsum
        dmus, dlvs = [], []
        for m in range(M):
            dmu_m = dmu / (M + 1) + dmu_p * Ts[m] / Tsum
            dT_m = dmu_p * mus[m] / Tsum + dTsum
            dvar_m = dvar / (M + 1) - dT_m * Ts[m] * Ts[m]
            dmus.append(dmu_m)
            dlvs.append(dvar_m * vars_m[m])
    else:
        dP = -dlgv / P - dmu * mu / P
        dmus, dlvs, ds = [], [], []
        for m in range(M):
            dp_m = dmu * mus[m] / P + dP
            dmus.append(dmu * ps[m] / P)
            dlvs.append(-dp_m * ps[m])
            if combine == "gpoe":
                ds.append(jnp.sum(dp_m * jnp.exp(-lvs[m])))
        if combine == "gpoe":
            total_sds = sum(s[m] * ds[m] for m in range(M))
            for m in range(M):
                d_alpha[m, 0] = s[m] * (ds[m] - total_sds)

    # ---------------- backward: encoders ------------------------------------
    for m in range(M):
        d_wmu[m] = jnp.dot(a2s[m].T, dmus[m],
                           preferred_element_type=jnp.float32)
        d_bmu[m] = jnp.sum(dmus[m], axis=0, keepdims=True)
        d_wlv[m] = jnp.dot(a2s[m].T, dlvs[m],
                           preferred_element_type=jnp.float32)
        d_blv[m] = jnp.sum(dlvs[m], axis=0, keepdims=True)
        da2 = (jnp.dot(dmus[m], wmu[m].T, preferred_element_type=jnp.float32)
               + jnp.dot(dlvs[m], wlv[m].T,
                         preferred_element_type=jnp.float32))
        dz2 = da2 * _dlrelu_from_out(a2s[m])
        d_w2[m] = jnp.dot(a1s[m].T, dz2, preferred_element_type=jnp.float32)
        d_b2[m] = jnp.sum(dz2, axis=0, keepdims=True)
        da1 = jnp.dot(dz2, w2[m].T, preferred_element_type=jnp.float32)
        dz1 = da1 * _dlrelu_from_out(a1s[m])
        d_w1[m] = jnp.dot(xc[m].T, dz1, preferred_element_type=jnp.float32)
        d_b1[m] = jnp.sum(dz1, axis=0, keepdims=True)


class FusedTrainStep:
    """Builds padded operands once and exposes
    ``loss_and_grads(packed_params, x_packed, c, eps, rowmask)``.

    Operates on the models/stacked.py packed parameter layout; returns
    (losses_dict, grads) where grads matches the packed pytree (padding
    entries zero, like jax.grad of the stacked model).
    """

    def __init__(self, stacked_model, combine: str,
                 interpret: bool | None = None):
        from ..models.stacked import StackedMultimodalCVAE

        assert isinstance(stacked_model, StackedMultimodalCVAE)
        self.model = stacked_model
        self.combine = combine.lower()
        if self.combine not in ("poe", "gpoe", "moe", "mopoe"):
            raise NotImplementedError(self.combine)
        self.interpret = (not _on_tpu()) if interpret is None else interpret

        m = stacked_model
        self.M = m.modalities
        self.Z = m.latent_dim
        self.C = m.c_dim
        self.H = [_round_up(h, LANE) for h in m.hidden_dim]
        self.D = _round_up(m.d_max, LANE)
        # covariate rows sit AFTER the lane-padded x block
        self.K = _round_up(self.D + m.c_dim, LANE)
        self.Zp = _round_up(m.latent_dim, LANE)
        self.ZC = _round_up(self.Zp + m.c_dim, LANE)

    # ---- padding helpers ---------------------------------------------------
    def _pad_params(self, p) -> list:
        M, H0, H1 = self.M, self.H[0], self.H[1]

        def pad3(a, rows, cols):
            return jnp.pad(a, ((0, 0), (0, rows - a.shape[1]),
                               (0, cols - a.shape[2])))

        def padb(a, cols):
            return jnp.pad(a, ((0, 0), (0, cols - a.shape[1])))[:, None, :]

        e, d = p["enc"], p["dec"]
        # encoder W1 rows: [x-features | covariates] -> [x(D) | cov | pad]
        xw = e["w1"][:, : self.model.d_max]
        cw = e["w1"][:, self.model.d_max:]
        w1 = jnp.concatenate([
            jnp.pad(xw, ((0, 0), (0, self.D - xw.shape[1]), (0, 0))),
            cw,
        ], axis=1)
        w1 = jnp.pad(w1, ((0, 0), (0, self.K - w1.shape[1]),
                          (0, H0 - w1.shape[2])))
        # decoder V1 rows: [latent | covariates] -> [latent(Zp) | cov | pad]
        zv = d["w1"][:, : self.Z]
        cv = d["w1"][:, self.Z:]
        v1 = jnp.concatenate([
            jnp.pad(zv, ((0, 0), (0, self.Zp - zv.shape[1]), (0, 0))),
            cv,
        ], axis=1)
        v1 = jnp.pad(v1, ((0, 0), (0, self.ZC - v1.shape[1]),
                          (0, H1 - v1.shape[2])))
        return [
            p["alpha"].reshape(self.M, 1).astype(jnp.float32),
            w1, padb(e["b1"], H0),
            pad3(e["w2"], H0, H1), padb(e["b2"], H1),
            pad3(e["wmu"], H1, self.Zp), padb(e["bmu"], self.Zp),
            pad3(e["wlv"], H1, self.Zp), padb(e["blv"], self.Zp),
            v1, padb(d["b1"], H1),
            pad3(d["w2"], H1, H0), padb(d["b2"], H0),
            pad3(d["wm"], H0, self.D), padb(d["bm"], self.D),
            padb(d["lvo"], self.D),
        ]

    def _unpad_grads(self, g: dict) -> dict:
        m = self.model
        dm, z, c = m.d_max, self.Z, self.C
        enc_w1 = jnp.concatenate(
            [g["w1"][:, :dm], g["w1"][:, self.D: self.D + c]], axis=1
        )[:, :, : m.hidden_dim[0]]
        dec_v1 = jnp.concatenate(
            [g["v1"][:, :z], g["v1"][:, self.Zp: self.Zp + c]], axis=1
        )[:, :, : m.hidden_dim[1]]
        return {
            "alpha": g["alpha"][:, 0],
            "enc": {
                "w1": enc_w1,
                "b1": g["b1"][:, 0, : m.hidden_dim[0]],
                "w2": g["w2"][:, : m.hidden_dim[0], : m.hidden_dim[1]],
                "b2": g["b2"][:, 0, : m.hidden_dim[1]],
                "wmu": g["wmu"][:, : m.hidden_dim[1], :z],
                "bmu": g["bmu"][:, 0, :z],
                "wlv": g["wlv"][:, : m.hidden_dim[1], :z],
                "blv": g["blv"][:, 0, :z],
            },
            "dec": {
                "w1": dec_v1,
                "b1": g["c1"][:, 0, : m.hidden_dim[1]],
                "w2": g["v2"][:, : m.hidden_dim[1], : m.hidden_dim[0]],
                "b2": g["c2"][:, 0, : m.hidden_dim[0]],
                "wm": g["vm"][:, : m.hidden_dim[0], :dm],
                "bm": g["cm"][:, 0, :dm],
                "lvo": g["lvo"][:, 0, :dm],
            },
        }

    def loss_and_grads(self, packed_params, x_packed, c, eps, rowmask):
        """x_packed [M, B, d_max]; c [B, c_dim]; eps [B, latent_dim];
        rowmask [B]."""
        M, B = self.M, x_packed.shape[1]
        Bp = _round_up(B, SUBLANE)

        def padmb(a, cols):
            return jnp.pad(a.astype(jnp.float32),
                           ((0, 0), (0, Bp - a.shape[1]),
                            (0, cols - a.shape[2])))

        def padbc(a, cols):
            return jnp.pad(a.astype(jnp.float32),
                           ((0, Bp - a.shape[0]), (0, cols - a.shape[1])))

        x_pad = padmb(x_packed, self.D)
        cb = jnp.broadcast_to(c[None].astype(jnp.float32),
                              (M,) + c.shape)
        xc = jnp.concatenate([x_pad[:, :, : self.D],
                              padmb(cb, self.K - self.D)], axis=2)
        c_tail = padbc(c, self.ZC - self.Zp)
        eps_p = padbc(eps, self.Zp)
        rm = jnp.pad(rowmask.astype(jnp.float32), (0, Bp - B))[:, None]
        zmask = (jax.lax.broadcasted_iota(jnp.int32, (1, self.Zp), 1)
                 < self.Z).astype(jnp.float32)
        colmask = (jax.lax.broadcasted_iota(
            jnp.int32, (M, 1, self.D), 2)
            < jnp.asarray(self.model.input_dim_list)[:, None, None]
        ).astype(jnp.float32)
        nvalid = jnp.maximum(jnp.sum(rowmask.astype(jnp.float32)),
                             1.0).reshape(1, 1)

        params_ops = self._pad_params(packed_params)
        operands = [xc, x_pad, c_tail, eps_p, rm, zmask, colmask,
                    nvalid] + params_ops

        H0, H1 = self.H
        shapes = {
            "losses": (1, 4),
            "alpha": (M, 1),
            "w1": (M, self.K, H0), "b1": (M, 1, H0),
            "w2": (M, H0, H1), "b2": (M, 1, H1),
            "wmu": (M, H1, self.Zp), "bmu": (M, 1, self.Zp),
            "wlv": (M, H1, self.Zp), "blv": (M, 1, self.Zp),
            "v1": (M, self.ZC, H1), "c1": (M, 1, H1),
            "v2": (M, H1, H0), "c2": (M, 1, H0),
            "vm": (M, H0, self.D), "cm": (M, 1, self.D),
            "lvo": (M, 1, self.D),
        }
        out_shape = [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in shapes.values()]
        # losses + d_alpha are scalar-sized -> SMEM; big tensors -> VMEM
        out_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(shapes) - 2)
        )
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]   # nvalid
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]   # alpha
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(params_ops) - 1)
        )
        outs = pl.pallas_call(
            functools.partial(_kernel, M, self.combine),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
        )(*operands)
        named = dict(zip(shapes.keys(), outs))
        losses = {"total": named["losses"][0, 0],
                  "kl": named["losses"][0, 1],
                  "ll": named["losses"][0, 2]}
        return losses, self._unpad_grads(named)
