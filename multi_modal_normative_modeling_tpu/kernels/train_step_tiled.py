"""Tiled (grid, weights-resident, pipelined) fused cVAE train step.

The single-block kernel (kernels/train_step.py) runs the WHOLE batch in one
pallas_call block, so (a) the batch must fit VMEM next to the weights and
(b) the step serializes — both measured fatal at PPMI width (3x3485:
cannot compile batch 256; batch 128 is 2.1x slower/subject than XLA,
RESULTS.md round-2 fused-width table). This kernel is the standard Pallas
architecture for exactly that regime:

  * grid over BATCH TILES: each grid step processes ``tile_b`` rows
    end-to-end (encoders -> fusion -> reparam -> decoders -> masked ELBO ->
    hand-derived backward — same math as train_step.py:28-43);
  * WEIGHTS RESIDENT: every parameter block uses a constant index map, so
    Mosaic DMAs it into VMEM once and revisits it across grid steps
    (no per-tile weight traffic);
  * GRADIENT ACCUMULATORS RESIDENT: grad outputs also use constant index
    maps — they live in VMEM across the grid, each tile accumulates its
    contribution (@pl.when(first) init), and HBM sees ONE writeback at the
    end. Tiles are exact partial sums: every loss term is a per-row
    quantity normalized by the GLOBAL valid-row count (nvalid, SMEM), so
    sum-over-tiles == full-batch gradients (up to fp add order);
  * batch tiles stream through the automatic pallas pipeline
    (double-buffered DMA overlapping the previous tile's compute).

Optional bfloat16 compute path (``compute_dtype=jnp.bfloat16``): weight
matrices and batch tiles are STORED bf16 (half the resident VMEM and half
the HBM tile traffic), every matmul runs bf16xbf16 on the MXU with fp32
accumulation (preferred_element_type), and all loss math, latent-dim math
(fusion/KL/reparam), biases, and gradient accumulators stay fp32. bf16's
exponent range equals fp32's, so no loss scaling is needed.

Replaces the hot loop of reference
multimodal_kfold_train_cvae_supervised.py:177-199 for wide-feature
regimes; gradient parity vs jax.grad of the stacked model in
tests/test_train_step_tiled.py.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .train_step import (
    _HALF_LOG_2PI,
    FusedTrainStep,
    _dlrelu_from_out,
    _lrelu,
)

# Measured Mosaic ceiling for THIS kernel architecture on v5e (round 3,
# scripts-era probe): with the grid + resident weights/accumulators the
# compiler accepts ~13 MiB estimated residency (3x1536 features) and
# crashes server-side at ~17 MiB (3x2048) — far below the ~48 MiB the
# grid-free single-block kernel compiled at. Budget set under the measured
# ceiling; wide multi-modality shapes (PPMI 3x3485) therefore route to the
# XLA path / the fused decoder+NLL op (kernels/decoder_nll.py) instead.
VMEM_BUDGET_TILED = 14 * 1024 * 1024

# weight tensors cast to the compute dtype on the bf16 path; biases, lvo and
# alpha stay fp32 (added to fp32 matmul outputs / SMEM scalars)
_MATMUL_PARAMS = ("enc_w", "dec_w", "wmu", "wlv", "vm")


def _is_matmul_param(name: str) -> bool:
    return any(name.startswith(p) for p in _MATMUL_PARAMS)


def _tiled_kernel(m_count: int, n_hidden: int, combine: str, d_pad: int,
                  z_dim: int, dims: Tuple[int, ...], cd, *refs):
    """One grid step: full fwd+bwd on a [tile_b] row slice, accumulating
    losses and gradients into the resident outputs. ``cd`` is the compute
    dtype for MXU operands (fp32 or bf16)."""
    L, M = n_hidden, m_count
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

    i = pl.program_id(0)
    first = i == 0

    def acc(ref, idx, val):
        """Initialize-or-accumulate into a resident output slot."""
        @pl.when(first)
        def _():
            ref[idx] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[idx] = ref[idx] + val

    def dot32(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    n = nvalid[0, 0]
    # rowmask is carried lane-wide ([Bp, LANE], all lanes equal) so every
    # grid-blocked operand keeps a 128-lane last dim (Mosaic-conservative);
    # the kernel uses one lane
    rm = rowmask[:, :1]                    # [tile_b, 1] fp32
    zp = eps.shape[1]
    zm = (jax.lax.broadcasted_iota(jnp.int32, (1, zp), 1)
          < z_dim).astype(jnp.float32)

    # ---------------- forward: encoders ------------------------------------
    # activations are stored in the compute dtype (halved VMEM residency on
    # the bf16 path); lrelu is sign-preserving, so the backward recovers
    # lrelu' from the stored activation in either dtype
    acts, mus, lvs = [], [], []
    for m in range(M):
        a = [xc[m]]                        # already storage dtype == cd
        for l in range(L):
            h = _lrelu(dot32(a[-1], enc_w[l][m]) + enc_b[l][m])
            a.append(h.astype(cd))
        acts.append(a)
        mus.append(dot32(a[-1], wmu[m]) + bmu[m])      # fp32
        lvs.append(dot32(a[-1], wlv[m]) + blv[m])      # fp32

    # ---------------- fusion (fp32, latent-dim sized) -----------------------
    if M == 1:
        mu, lgv = mus[0], lvs[0]
    elif combine == "moe":
        mu = sum(mus) / M
        var = sum(jnp.exp(lv) for lv in lvs) / M
        lgv = jnp.log(var)
    elif combine == "mopoe":
        vars_m = [jnp.exp(lv) for lv in lvs]
        Ts = [1.0 / v for v in vars_m]
        Tsum = sum(Ts)
        mu_p = sum(Ts[m] * mus[m] for m in range(M)) / Tsum
        mu = (sum(mus) + mu_p) / (M + 1)
        var = (sum(vars_m) + 1.0 / Tsum) / (M + 1)
        lgv = jnp.log(var)
    else:  # poe / gpoe
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

    # ---------------- reparameterize + decoders -----------------------------
    half = jnp.exp(0.5 * lgv)
    z = (mu + eps[:].astype(jnp.float32) * half) * zm
    zc = jnp.concatenate([z.astype(cd), c_tail[:].astype(cd)], axis=1)

    gacts, means = [], []
    for m in range(M):
        g = [zc]
        for l in range(L):
            h = _lrelu(dot32(g[-1], dec_w[l][m]) + dec_b[l][m])
            g.append(h.astype(cd))
        gacts.append(g)
        means.append(dot32(g[-1], vm[m]) + cm[m])      # fp32

    # ---------------- losses + interleaved decoder backward -----------------
    kl_rows = -0.5 * jnp.sum(
        (1.0 + lgv - mu ** 2 - jnp.exp(lgv)) * zm, axis=1, keepdims=True)
    kl = jnp.sum(kl_rows * rm) / n

    ll_total = 0.0
    d_zc = jnp.zeros(zc.shape, jnp.float32)
    for m in range(M):
        cmask = (jax.lax.broadcasted_iota(jnp.int32, (1, d_pad), 1)
                 < dims[m]).astype(jnp.float32)
        q = jnp.exp(-lvo[m])
        x_m = xc[m][:, :d_pad].astype(jnp.float32)
        diff = x_m - means[m]
        ll_elem = (-0.5 * diff * diff * q - 0.5 * lvo[m] - _HALF_LOG_2PI)
        ll_total += jnp.sum(ll_elem * cmask * rm) / n

        dmean = -(rm * cmask * q * diff) / n           # fp32
        acc(d_lvo, m, -jnp.sum(
            rm * cmask * (0.5 * diff * diff * q - 0.5), axis=0,
            keepdims=True) / n)
        g = gacts[m]
        dmean_c = dmean.astype(cd)
        acc(d_vm, m, dot32(g[L].T, dmean_c))
        acc(d_cm, m, jnp.sum(dmean, axis=0, keepdims=True))
        dg = dot32(dmean_c, vm[m].T)
        for l in range(L - 1, -1, -1):
            dy = (dg * _dlrelu_from_out(g[l + 1].astype(jnp.float32)))
            dy_c = dy.astype(cd)
            acc(d_dec_w[l], m, dot32(g[l].T, dy_c))
            acc(d_dec_b[l], m, jnp.sum(dy, axis=0, keepdims=True))
            dg = dot32(dy_c, dec_w[l][m].T)
        d_zc = d_zc + dg

    total = M * kl - ll_total
    # losses live in a (1, 4) VMEM accumulator (vector store)
    acc(losses_out, (slice(None), slice(None)), jnp.concatenate([
        jnp.reshape(total, (1, 1)), jnp.reshape(M * kl, (1, 1)),
        jnp.reshape(ll_total, (1, 1)), jnp.zeros((1, 1), jnp.float32),
    ], axis=1))

    # ---------------- backward: reparam + KL --------------------------------
    dz = d_zc[:, : z.shape[1]] * zm
    dmu = dz + (M * rm * mu * zm) / n
    dlgv = (0.5 * dz * eps[:].astype(jnp.float32) * half) \
        - 0.5 * M * rm * zm * (1.0 - jnp.exp(lgv)) / n

    # ---------------- backward: fusion --------------------------------------
    if M == 1:
        dmus, dlvs = [dmu], [dlgv]
        d_alpha_vals = [jnp.float32(0.0)] * M
    elif combine == "moe":
        dvar = dlgv / var
        dmus = [dmu / M for _ in range(M)]
        dlvs = [(dvar / M) * jnp.exp(lvs[m]) for m in range(M)]
        d_alpha_vals = [jnp.float32(0.0)] * M
    elif combine == "mopoe":
        dvar = dlgv / var
        dmu_p = dmu / (M + 1)
        dvar_p = dvar / (M + 1)
        dTsum = -dvar_p / (Tsum * Tsum) - dmu_p * mu_p / Tsum
        dmus, dlvs = [], []
        for m in range(M):
            dT_m = dmu_p * mus[m] / Tsum + dTsum
            dvar_m = dvar / (M + 1) - dT_m * Ts[m] * Ts[m]
            dmus.append(dmu / (M + 1) + dmu_p * Ts[m] / Tsum)
            dlvs.append(dvar_m * vars_m[m])
        d_alpha_vals = [jnp.float32(0.0)] * M
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
            d_alpha_vals = [s[m] * (ds[m] - total_sds) for m in range(M)]
        else:
            d_alpha_vals = [jnp.float32(0.0)] * M
    acc(d_alpha, (slice(None), slice(None)), jnp.concatenate(
        [jnp.reshape(v, (1, 1)) for v in d_alpha_vals], axis=0))

    # ---------------- backward: encoders ------------------------------------
    for m in range(M):
        a = acts[m]
        dmu_c = dmus[m].astype(cd)
        dlv_c = dlvs[m].astype(cd)
        acc(d_wmu, m, dot32(a[L].T, dmu_c))
        acc(d_bmu, m, jnp.sum(dmus[m], axis=0, keepdims=True))
        acc(d_wlv, m, dot32(a[L].T, dlv_c))
        acc(d_blv, m, jnp.sum(dlvs[m], axis=0, keepdims=True))
        da = dot32(dmu_c, wmu[m].T) + dot32(dlv_c, wlv[m].T)
        for l in range(L - 1, -1, -1):
            dz_l = da * _dlrelu_from_out(a[l + 1].astype(jnp.float32))
            dz_c = dz_l.astype(cd)
            acc(d_enc_w[l], m, dot32(a[l].T, dz_c))
            acc(d_enc_b[l], m, jnp.sum(dz_l, axis=0, keepdims=True))
            if l > 0:
                da = dot32(dz_c, enc_w[l][m].T)


class TiledFusedTrainStep(FusedTrainStep):
    """Grid-tiled fused train step on the same padded layout as
    FusedTrainStep (pad_params / unpad_named / _grad_shapes inherited).

    ``tile_b``: rows per grid step (auto-chosen to fit the VMEM budget if
    None). ``compute_dtype``: jnp.float32 (exact-math parity) or
    jnp.bfloat16 (bf16-resident weights + tiles, fp32 accumulation).
    """

    def __init__(self, stacked_model, combine: str, tile_b: int = None,
                 compute_dtype=jnp.float32, interpret: bool | None = None,
                 batch_hint: int = None):
        super().__init__(stacked_model, combine, interpret=interpret)
        self.compute_dtype = jnp.dtype(compute_dtype)
        if self.compute_dtype not in (jnp.dtype(jnp.float32),
                                      jnp.dtype(jnp.bfloat16)):
            raise ValueError(f"compute_dtype {compute_dtype}")
        if tile_b is None:
            tile_b = self.choose_tile(batch_hint=batch_hint)
        # bf16 blocks need (16, 128) min tiles; fp32 (8, 128)
        align = 16 if self.compute_dtype == jnp.dtype(jnp.bfloat16) else 8
        if tile_b % align:
            raise ValueError(f"tile_b {tile_b} must be a multiple of "
                             f"{align} for {self.compute_dtype}")
        self.tile_b = tile_b
        # make_packed_batches / pad_eps round the batch axis to this
        self.row_align = tile_b

    # ---- VMEM feasibility ---------------------------------------------------
    def _param_floats(self) -> Tuple[int, int]:
        """(matmul-weight floats, small-param floats) of the padded layout."""
        M, L = self.M, self.L
        w = M * self.K * self.H[0]
        for l in range(1, L):
            w += M * self.H[l - 1] * self.H[l]
        w += 2 * M * self.H[-1] * self.Zp
        w += M * self.ZC * self.Hr[0]
        for l in range(1, L):
            w += M * self.Hr[l - 1] * self.Hr[l]
        w += M * self.Hr[-1] * self.D
        small = M * (sum(self.H) + 2 * self.Zp + sum(self.Hr) + 2 * self.D)
        return w, small

    def vmem_bytes_tiled(self, tile_b: int) -> int:
        """Estimated resident VMEM: weights (storage dtype) + fp32 grad
        accumulators + double-buffered batch tiles + live activations."""
        M = self.M
        wf, sf = self._param_floats()
        wbytes = 2 if self.compute_dtype == jnp.dtype(jnp.bfloat16) else 4
        n = wf * wbytes + sf * 4          # resident params
        n += (wf + sf) * 4                # fp32 grad accumulators
        # double-buffered tiles: xc is the big one
        tile = M * tile_b * self.K + tile_b * (self.ZC - self.Zp)
        n += 2 * tile * wbytes + 2 * tile_b * (self.Zp + 1) * 4
        # activations: per-modality hidden/latent chains (cd) + the widest
        # live pair (means + diff, fp32) for ONE modality at a time
        n += M * tile_b * (sum(self.H) + sum(self.Hr)
                           + 2 * self.Zp) * wbytes
        n += 3 * tile_b * self.D * 4
        return n

    def choose_tile(self, budget: int = None, batch_hint: int = None) -> int:
        """Largest power-of-two tile under the VMEM budget. ``batch_hint``
        caps the tile at the (alignment-rounded) batch size — a tile larger
        than the batch would only pad every batch up to itself (wasted
        rows) while RAISING the real block residency."""
        if budget is None:
            budget = VMEM_BUDGET_TILED
        floor = 16 if self.compute_dtype == jnp.dtype(jnp.bfloat16) else 8
        cap = 512
        if batch_hint is not None:
            cap = max(floor, -(-batch_hint // floor) * floor)
        for tile in (512, 256, 128, 64, 32, 16, 8):
            if floor <= tile <= cap and self.vmem_bytes_tiled(tile) <= budget:
                return tile
        return floor

    def fits_vmem(self, batch: int, budget: int = None) -> bool:
        """Whether the COMPILED block residency fits: batches are padded UP
        to tile_b (row_align), so the block is always tile_b rows — do not
        understate with min(tile_b, batch)."""
        if budget is None:
            budget = VMEM_BUDGET_TILED
        return self.vmem_bytes_tiled(self.tile_b) <= budget

    # ---- storage-dtype casts -------------------------------------------------
    def cast_exec(self, padded: Dict[str, jnp.ndarray]):
        """fp32 padded params -> execution copy (weights in the compute
        dtype; biases/alpha/lvo stay fp32). Identity for fp32."""
        if self.compute_dtype == jnp.dtype(jnp.float32):
            return padded
        return {k: (v.astype(jnp.bfloat16) if _is_matmul_param(k) else v)
                for k, v in padded.items()}

    def cast_batch(self, batch: dict) -> dict:
        """Storage-dtype batch: xc / c_tail tiles in the compute dtype (the
        HBM->VMEM tile stream), rm/nvalid fp32."""
        if self.compute_dtype == jnp.dtype(jnp.float32):
            return batch
        out = dict(batch)
        out["xc"] = batch["xc"].astype(jnp.bfloat16)
        out["c_tail"] = batch["c_tail"].astype(jnp.bfloat16)
        return out

    # ---- the tiled call -----------------------------------------------------
    def loss_and_grads_padded(self, padded: Dict[str, jnp.ndarray],
                              xc, c_tail, eps_p, rm, nvalid):
        """Same contract as FusedTrainStep.loss_and_grads_padded, but the
        batch axis must be a multiple of ``tile_b`` (make_packed_batches
        honors ``row_align``). Weight operands may be pre-cast via
        cast_exec; fp32 inputs are accepted and cast here (convenient for
        the parity tests)."""
        cd = self.compute_dtype
        if cd != jnp.dtype(jnp.float32):
            padded = self.cast_exec(padded)
            xc = xc.astype(jnp.bfloat16)
            c_tail = c_tail.astype(jnp.bfloat16)
        bp = xc.shape[1]
        if bp % self.tile_b:
            raise ValueError(f"batch rows {bp} not a multiple of "
                             f"tile_b {self.tile_b}")
        grid = (bp // self.tile_b,)
        tb = self.tile_b

        from .mlp import LANE

        # lane-widen the [Bp, 1] row mask: grid-blocked operands keep a
        # 128-lane last dim (Mosaic-conservative; see _tiled_kernel)
        rm_wide = jnp.tile(rm.astype(jnp.float32), (1, LANE))
        operands = ([xc, c_tail, eps_p, rm_wide, nvalid]
                    + [padded[k] for k in self._param_names])
        shapes = self._grad_shapes()
        out_shape = [jax.ShapeDtypeStruct(s, jnp.float32)
                     for s in shapes.values()]

        def tile_rows(block):
            return pl.BlockSpec(block, lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def const3(arr):
            return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                                memory_space=pltpu.VMEM)

        in_specs = [
            pl.BlockSpec((self.M, tb, self.K), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),          # xc
            tile_rows((tb, c_tail.shape[1])),               # c_tail
            tile_rows((tb, eps_p.shape[1])),                # eps
            tile_rows((tb, LANE)),                          # rm (lane-wide)
            pl.BlockSpec(nvalid.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # nvalid
            pl.BlockSpec((self.M, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # alpha
        ] + [const3(padded[k]) for k in self._param_names[1:]]

        # every output is a VMEM accumulator with a constant index map
        # (resident across the grid, one HBM writeback at the end)
        out_specs = [pl.BlockSpec(s, lambda i, _n=len(s): (0,) * _n,
                                  memory_space=pltpu.VMEM)
                     for s in shapes.values()]

        outs = pl.pallas_call(
            functools.partial(_tiled_kernel, self.M, self.L, self.combine,
                              self.D, self.Z,
                              tuple(self.model.input_dim_list), cd),
            grid=grid,
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
