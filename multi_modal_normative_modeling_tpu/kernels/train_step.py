"""Fully-fused cVAE training step (forward + hand-derived backward) in one
Pallas TPU kernel.

Why: at wide feature dims (PPMI, 3x3485) the XLA train step costs ~6.8x its
own forward pass (measured on v5e, scripts/bench_fused_width.py): autodiff
materializes the wide intermediates (recon means, residuals, dmean) in HBM
between fusion boundaries. This kernel runs the complete packed-modality
forward (encoders -> fusion -> reparameterize -> decoders -> masked ELBO)
*and* its backward inside a single pallas_call, so every activation lives and
dies in VMEM: per step, HBM sees one read of the batch tile and weights and
one write of the gradients.

The hot-path API is PADDED end-to-end: ``pad_params`` / ``pack_batch`` run
once per fold (outside the step scan) and ``loss_and_grads_padded`` consumes
the lane-aligned layouts directly — no per-step padding traffic. The
compat wrapper ``loss_and_grads`` (pad -> kernel -> unpad per call) is used by
the parity tests.

Scope: the packed cVAE family (models/stacked.py layout), ANY number of
hidden layers (the reference ADHD sweep grid spans 1-3 hidden,
commands_list11_adhd.sh:18), fusion in {poe, gpoe, moe, mopoe}, fp32.
All operands must fit VMEM: ~16 MiB/core on v4-class, ~128 MiB on
v5e/v5p-class (fits_vmem pre-checks; the CLI additionally falls back to the
XLA path on Mosaic compile failure). Gradients are verified against jax.grad
of the stacked model in tests/test_train_step_kernel.py (interpret mode on
CPU and on real TPU).

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
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import LANE, SUBLANE, _on_tpu, _round_up

_HALF_LOG_2PI = 0.9189385332046727

# per-core VMEM budgets for the single-block kernel (bytes): v4-class cores
# have 16 MiB vector memory; v5e-class cores compile this kernel up to an
# estimated ~48 MiB working set (measured on v5e: 41 MiB OK, 58 MiB fails in
# Mosaic — scripts/bench_fused_width.py / RESULTS.md).
VMEM_BUDGET_SMALL = 14 * 1024 * 1024
VMEM_BUDGET_LARGE = 48 * 1024 * 1024


def default_vmem_budget() -> int:
    """Best-effort budget for the current backend. Unknown TPU generations
    get the small budget; the fused trainer additionally falls back to XLA if
    Mosaic fails to allocate at compile time."""
    try:
        import jax

        dev = jax.devices()[0]
        kind = getattr(dev, "device_kind", "").lower()
        if any(t in kind for t in ("v5", "v6", "v7")):
            return VMEM_BUDGET_LARGE
    except Exception:
        pass
    return VMEM_BUDGET_SMALL


def _lrelu(v):
    return jnp.where(v > 0, v, 0.01 * v)


def _dlrelu_from_out(a):
    # lrelu is sign-preserving: a > 0 <=> pre-activation > 0
    return jnp.where(a > 0, 1.0, 0.01)


def _kernel(m_count: int, n_hidden: int, combine: str, d_pad: int,
            z_dim: int, dims: Tuple[int, ...], *refs):
    L = n_hidden
    M = m_count
    (xc, c_tail, eps, rowmask, nvalid) = refs[:5]
    pos = 5
    alpha = refs[pos]; pos += 1
    enc_w = [refs[pos + 2 * l] for l in range(L)]
    enc_b = [refs[pos + 2 * l + 1] for l in range(L)]
    pos += 2 * L
    wmu, bmu, wlv, blv = refs[pos:pos + 4]; pos += 4
    dec_w = [refs[pos + 2 * l] for l in range(L)]
    dec_b = [refs[pos + 2 * l + 1] for l in range(L)]
    pos += 2 * L
    vm, cm, lvo = refs[pos:pos + 3]; pos += 3
    losses_out, d_alpha = refs[pos:pos + 2]; pos += 2
    d_enc_w = [refs[pos + 2 * l] for l in range(L)]
    d_enc_b = [refs[pos + 2 * l + 1] for l in range(L)]
    pos += 2 * L
    d_wmu, d_bmu, d_wlv, d_blv = refs[pos:pos + 4]; pos += 4
    d_dec_w = [refs[pos + 2 * l] for l in range(L)]
    d_dec_b = [refs[pos + 2 * l + 1] for l in range(L)]
    pos += 2 * L
    d_vm, d_cm, d_lvo = refs[pos:pos + 3]

    n = nvalid[0, 0]
    rm = rowmask[:]                      # [Bp, 1]
    zp = eps.shape[1]
    # masks are generated on the VPU from static dims (no HBM operands)
    zm = (jax.lax.broadcasted_iota(jnp.int32, (1, zp), 1)
          < z_dim).astype(jnp.float32)

    # ---------------- forward: encoders -----------------------------------
    acts, mus, lvs = [], [], []          # acts[m] = [a_0 .. a_L]
    for m in range(M):
        a = [xc[m]]
        for l in range(L):
            a.append(_lrelu(
                jnp.dot(a[-1], enc_w[l][m],
                        preferred_element_type=jnp.float32) + enc_b[l][m]))
        acts.append(a)
        mus.append(jnp.dot(a[-1], wmu[m], preferred_element_type=jnp.float32)
                   + bmu[m])
        lvs.append(jnp.dot(a[-1], wlv[m], preferred_element_type=jnp.float32)
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

    gacts, means = [], []                  # gacts[m] = [zc, g_1 .. g_L]
    for m in range(M):
        g = [zc]
        for l in range(L):
            g.append(_lrelu(
                jnp.dot(g[-1], dec_w[l][m],
                        preferred_element_type=jnp.float32) + dec_b[l][m]))
        gacts.append(g)
        means.append(jnp.dot(g[-1], vm[m], preferred_element_type=jnp.float32)
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
        cmask = (jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
                 < dims[m]).astype(jnp.float32)
        q = jnp.exp(-lvo[m])               # [1, D]
        x_m = xc[m][:, :d_pad]             # the x block of the packed input
        diff = x_m - means[m]
        ll_elem = (-0.5 * diff * diff * q - 0.5 * lvo[m] - _HALF_LOG_2PI)
        ll_m = jnp.sum(ll_elem * cmask * rm) / n
        ll_total += ll_m

        # ---- backward: NLL -> decoder chain (interleaved to free buffers)
        dmean = -(rm * cmask * q * diff) / n
        d_lvo[m] = -jnp.sum(
            rm * cmask * (0.5 * diff * diff * q - 0.5), axis=0, keepdims=True
        ) / n
        g = gacts[m]
        d_vm[m] = jnp.dot(g[L].T, dmean, preferred_element_type=jnp.float32)
        d_cm[m] = jnp.sum(dmean, axis=0, keepdims=True)
        dg = jnp.dot(dmean, vm[m].T, preferred_element_type=jnp.float32)
        for l in range(L - 1, -1, -1):
            dy = dg * _dlrelu_from_out(g[l + 1])
            d_dec_w[l][m] = jnp.dot(g[l].T, dy,
                                    preferred_element_type=jnp.float32)
            d_dec_b[l][m] = jnp.sum(dy, axis=0, keepdims=True)
            dg = jnp.dot(dy, dec_w[l][m].T,
                         preferred_element_type=jnp.float32)
        d_zc = d_zc + dg

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
        a = acts[m]
        d_wmu[m] = jnp.dot(a[L].T, dmus[m],
                           preferred_element_type=jnp.float32)
        d_bmu[m] = jnp.sum(dmus[m], axis=0, keepdims=True)
        d_wlv[m] = jnp.dot(a[L].T, dlvs[m],
                           preferred_element_type=jnp.float32)
        d_blv[m] = jnp.sum(dlvs[m], axis=0, keepdims=True)
        da = (jnp.dot(dmus[m], wmu[m].T, preferred_element_type=jnp.float32)
              + jnp.dot(dlvs[m], wlv[m].T,
                        preferred_element_type=jnp.float32))
        for l in range(L - 1, -1, -1):
            dz_l = da * _dlrelu_from_out(a[l + 1])
            d_enc_w[l][m] = jnp.dot(a[l].T, dz_l,
                                    preferred_element_type=jnp.float32)
            d_enc_b[l][m] = jnp.sum(dz_l, axis=0, keepdims=True)
            if l > 0:
                da = jnp.dot(dz_l, enc_w[l][m].T,
                             preferred_element_type=jnp.float32)


class FusedTrainStep:
    """Padded-layout fused train step over the models/stacked.py parameter
    pytree (any hidden depth).

    Hot path (used by train/fused.py):
      padded = step.pad_params(packed)               # once per fold
      xc, c_tail, eps_p, rm, nv = ...pack_batch...   # once per fold
      losses, padded_grads = step.loss_and_grads_padded(padded, ...)
      packed = step.unpad_named(padded)              # once, after training

    Compat path (parity tests): ``loss_and_grads`` pads/unpads per call.
    """

    # batch-axis padding multiple (the tiled subclass raises it to tile_b)
    row_align: int = SUBLANE

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
        self.L = m.n_hidden
        self.Z = m.latent_dim
        self.C = m.c_dim
        self.H = [_round_up(h, LANE) for h in m.hidden_dim]
        self.Hr = self.H[::-1]           # decoder hidden widths, in order
        self.D = _round_up(m.d_max, LANE)
        # covariate rows sit AFTER the lane-padded x block
        self.K = _round_up(self.D + m.c_dim, LANE)
        self.Zp = _round_up(m.latent_dim, LANE)
        self.ZC = _round_up(self.Zp + m.c_dim, LANE)
        self._param_names = [k for k in self._grad_shapes() if k != "losses"]

    # ---- VMEM feasibility ----------------------------------------------------
    def vmem_bytes(self, batch: int) -> int:
        """Estimated VMEM residency of the single-block kernel: all inputs,
        outputs and live activations (fp32)."""
        M, L = self.M, self.L
        Bp = _round_up(batch, SUBLANE)
        n = 0
        # batch blocks: xc, means+diff (~2x), eps/zc/masks
        n += M * Bp * self.K            # xc (x is a slice of it)
        n += 2 * M * Bp * self.D        # means + diff live simultaneously
        n += Bp * (self.ZC + self.Zp + 2)
        # params + grads (2x)
        p = M * (self.K * self.H[0] + self.H[0])
        for l in range(1, L):
            p += M * (self.H[l - 1] * self.H[l] + self.H[l])
        p += 2 * M * (self.H[-1] * self.Zp + self.Zp)          # mu/lv heads
        p += M * (self.ZC * self.Hr[0] + self.Hr[0])
        for l in range(1, L):
            p += M * (self.Hr[l - 1] * self.Hr[l] + self.Hr[l])
        p += M * (self.Hr[-1] * self.D + 2 * self.D)           # mean head+lvo
        n += 2 * p
        # activations kept for backward
        n += M * Bp * (sum(self.H) + sum(self.Hr) + 2 * self.Zp)
        return 4 * n

    def fits_vmem(self, batch: int, budget: int | None = None) -> bool:
        if budget is None:
            budget = default_vmem_budget()
        return self.vmem_bytes(batch) <= budget

    # ---- padded parameter layout ---------------------------------------------
    def pad_params(self, p) -> Dict[str, jnp.ndarray]:
        """Packed pytree -> named dict of lane-aligned arrays (the kernel's
        native layout; do this ONCE per fold, train on it, unpad after)."""
        M, L = self.M, self.L

        def pad3(a, rows, cols):
            return jnp.pad(a, ((0, 0), (0, rows - a.shape[1]),
                               (0, cols - a.shape[2])))

        def padb(a, cols):
            return jnp.pad(a, ((0, 0), (0, cols - a.shape[1])))[:, None, :]

        e, d = p["enc"], p["dec"]
        out = {"alpha": p["alpha"].reshape(M, 1).astype(jnp.float32)}
        # encoder W0 rows: [x-features | covariates] -> [x(D) | cov | pad]
        w0 = e["layers"][0]["w"]
        xw = w0[:, : self.model.d_max]
        cw = w0[:, self.model.d_max:]
        w0 = jnp.concatenate([
            jnp.pad(xw, ((0, 0), (0, self.D - xw.shape[1]), (0, 0))),
            cw,
        ], axis=1)
        out["enc_w0"] = jnp.pad(w0, ((0, 0), (0, self.K - w0.shape[1]),
                                     (0, self.H[0] - w0.shape[2])))
        out["enc_b0"] = padb(e["layers"][0]["b"], self.H[0])
        for l in range(1, L):
            out[f"enc_w{l}"] = pad3(e["layers"][l]["w"],
                                    self.H[l - 1], self.H[l])
            out[f"enc_b{l}"] = padb(e["layers"][l]["b"], self.H[l])
        out["wmu"] = pad3(e["wmu"], self.H[-1], self.Zp)
        out["bmu"] = padb(e["bmu"], self.Zp)
        out["wlv"] = pad3(e["wlv"], self.H[-1], self.Zp)
        out["blv"] = padb(e["blv"], self.Zp)
        # decoder V0 rows: [latent | covariates] -> [latent(Zp) | cov | pad]
        v0 = d["layers"][0]["w"]
        zv = v0[:, : self.Z]
        cv = v0[:, self.Z:]
        v0 = jnp.concatenate([
            jnp.pad(zv, ((0, 0), (0, self.Zp - zv.shape[1]), (0, 0))),
            cv,
        ], axis=1)
        out["dec_w0"] = jnp.pad(v0, ((0, 0), (0, self.ZC - v0.shape[1]),
                                     (0, self.Hr[0] - v0.shape[2])))
        out["dec_b0"] = padb(d["layers"][0]["b"], self.Hr[0])
        for l in range(1, L):
            out[f"dec_w{l}"] = pad3(d["layers"][l]["w"],
                                    self.Hr[l - 1], self.Hr[l])
            out[f"dec_b{l}"] = padb(d["layers"][l]["b"], self.Hr[l])
        out["vm"] = pad3(d["wm"], self.Hr[-1], self.D)
        out["cm"] = padb(d["bm"], self.D)
        out["lvo"] = padb(d["lvo"], self.D)
        return out

    def _grad_shapes(self) -> dict:
        M, L = self.M, self.L
        shapes = {"losses": (1, 4), "alpha": (M, 1)}
        shapes["enc_w0"] = (M, self.K, self.H[0])
        shapes["enc_b0"] = (M, 1, self.H[0])
        for l in range(1, L):
            shapes[f"enc_w{l}"] = (M, self.H[l - 1], self.H[l])
            shapes[f"enc_b{l}"] = (M, 1, self.H[l])
        shapes["wmu"] = (M, self.H[-1], self.Zp)
        shapes["bmu"] = (M, 1, self.Zp)
        shapes["wlv"] = (M, self.H[-1], self.Zp)
        shapes["blv"] = (M, 1, self.Zp)
        shapes["dec_w0"] = (M, self.ZC, self.Hr[0])
        shapes["dec_b0"] = (M, 1, self.Hr[0])
        for l in range(1, L):
            shapes[f"dec_w{l}"] = (M, self.Hr[l - 1], self.Hr[l])
            shapes[f"dec_b{l}"] = (M, 1, self.Hr[l])
        shapes["vm"] = (M, self.Hr[-1], self.D)
        shapes["cm"] = (M, 1, self.D)
        shapes["lvo"] = (M, 1, self.D)
        return shapes

    def unpad_named(self, g: Dict[str, jnp.ndarray]) -> dict:
        """Named padded dict (params or grads) -> the packed pytree."""
        m = self.model
        dm, z, c, L = m.d_max, self.Z, self.C, self.L
        h = m.hidden_dim
        hr = h[::-1]
        enc_w0 = jnp.concatenate(
            [g["enc_w0"][:, :dm], g["enc_w0"][:, self.D: self.D + c]], axis=1
        )[:, :, : h[0]]
        dec_v0 = jnp.concatenate(
            [g["dec_w0"][:, :z], g["dec_w0"][:, self.Zp: self.Zp + c]], axis=1
        )[:, :, : hr[0]]
        enc_layers = [{"w": enc_w0, "b": g["enc_b0"][:, 0, : h[0]]}]
        for l in range(1, L):
            enc_layers.append({
                "w": g[f"enc_w{l}"][:, : h[l - 1], : h[l]],
                "b": g[f"enc_b{l}"][:, 0, : h[l]],
            })
        dec_layers = [{"w": dec_v0, "b": g["dec_b0"][:, 0, : hr[0]]}]
        for l in range(1, L):
            dec_layers.append({
                "w": g[f"dec_w{l}"][:, : hr[l - 1], : hr[l]],
                "b": g[f"dec_b{l}"][:, 0, : hr[l]],
            })
        return {
            "alpha": g["alpha"][:, 0],
            "enc": {
                "layers": enc_layers,
                "wmu": g["wmu"][:, : h[-1], :z],
                "bmu": g["bmu"][:, 0, :z],
                "wlv": g["wlv"][:, : h[-1], :z],
                "blv": g["blv"][:, 0, :z],
            },
            "dec": {
                "layers": dec_layers,
                "wm": g["vm"][:, : hr[-1], :dm],
                "bm": g["cm"][:, 0, :dm],
                "lvo": g["lvo"][:, 0, :dm],
            },
        }

    # ---- batch packing ---------------------------------------------------------
    def pack_batch(self, x_packed, c, rowmask):
        """Lane-align one batch once: x_packed [M, B, d_max], c [B, c_dim],
        rowmask [B] -> (xc [M, Bp, K], c_tail [Bp, ZC-Zp], rm [Bp, 1],
        nvalid [1, 1])."""
        M, B = self.M, x_packed.shape[1]
        Bp = _round_up(B, self.row_align)

        def padmb(a, cols):
            return jnp.pad(a.astype(jnp.float32),
                           ((0, 0), (0, Bp - a.shape[1]),
                            (0, cols - a.shape[2])))

        def padbc(a, cols):
            return jnp.pad(a.astype(jnp.float32),
                           ((0, Bp - a.shape[0]), (0, cols - a.shape[1])))

        x_pad = padmb(x_packed, self.D)
        cb = jnp.broadcast_to(c[None].astype(jnp.float32), (M,) + c.shape)
        xc = jnp.concatenate([x_pad, padmb(cb, self.K - self.D)], axis=2)
        c_tail = padbc(c, self.ZC - self.Zp)
        rm = jnp.pad(rowmask.astype(jnp.float32), (0, Bp - B))[:, None]
        nvalid = jnp.maximum(jnp.sum(rowmask.astype(jnp.float32)),
                             1.0).reshape(1, 1)
        return xc, c_tail, rm, nvalid

    def cast_batch(self, batch: dict) -> dict:
        """Storage-dtype cast hook for packed batches (identity here; the
        tiled bf16 subclass overrides it to stream bf16 tiles)."""
        return batch

    def pad_eps(self, eps):
        """[B, latent_dim] -> [Bp, Zp] (the PRNG stream stays the XLA
        trainer's: draw [B, Z] first, pad after)."""
        Bp = _round_up(eps.shape[0], self.row_align)
        return jnp.pad(eps.astype(jnp.float32),
                       ((0, Bp - eps.shape[0]), (0, self.Zp - eps.shape[1])))

    # ---- the fused call ----------------------------------------------------------
    def loss_and_grads_padded(self, padded: Dict[str, jnp.ndarray],
                              xc, c_tail, eps_p, rm, nvalid):
        """All operands in kernel layout; returns (losses, padded_grads) with
        padded_grads matching the pad_params dict (padding entries zero)."""
        operands = ([xc, c_tail, eps_p, rm, nvalid]
                    + [padded[k] for k in self._param_names])
        shapes = self._grad_shapes()
        out_shape = [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in shapes.values()]
        # losses + d_alpha are scalar-sized -> SMEM; big tensors -> VMEM
        out_specs = (
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(shapes) - 2)
        )
        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]   # nvalid
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]   # alpha
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (len(self._param_names) - 1)
        )
        outs = pl.pallas_call(
            functools.partial(_kernel, self.M, self.L, self.combine,
                              self.D, self.Z,
                              tuple(self.model.input_dim_list)),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=self.interpret,
        )(*operands)
        named = dict(zip(shapes.keys(), outs))
        losses = {"total": named["losses"][0, 0],
                  "kl": named["losses"][0, 1],
                  "ll": named["losses"][0, 2]}
        del named["losses"]
        return losses, named

    def loss_and_grads(self, packed_params, x_packed, c, eps, rowmask):
        """Compat wrapper (pads params and batch per call): x_packed
        [M, B, d_max]; c [B, c_dim]; eps [B, latent_dim]; rowmask [B]."""
        padded = self.pad_params(packed_params)
        xc, c_tail, rm, nvalid = self.pack_batch(x_packed, c, rowmask)
        losses, named = self.loss_and_grads_padded(
            padded, xc, c_tail, self.pad_eps(eps), rm, nvalid)
        return losses, self.unpad_named(named)
