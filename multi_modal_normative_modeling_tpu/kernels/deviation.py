"""Fused inference + deviation kernel.

Computes, for one modality, the whole test-time tail in a single pallas_call:
decode z through the conditional decoder MLP and emit both the reconstruction
mean and the per-subject deviation sum((x - x_hat)^2)/D (utils_vae.py:147-148,
cVAE.py:1210-1211) — x is read once from HBM, intermediate activations and
the squared-error matrix never leave VMEM.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp import LANE, SUBLANE, _on_tpu, _pad2, _pad_bias, _round_up, _leaky


def _kernel(n_hidden: int, non_linear: bool, true_d: int, *refs):
    """refs: zc, x, W_0,b_0.., Wmean,bmean, recon_out, dev_out."""
    zc, x = refs[0], refs[1]
    idx = 2
    h = zc[:]
    for _ in range(n_hidden):
        w, b = refs[idx], refs[idx + 1]
        idx += 2
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        if non_linear:
            h = _leaky(h)
    wm, bm = refs[idx], refs[idx + 1]
    recon_out, dev_out = refs[idx + 2], refs[idx + 3]
    mean = jnp.dot(h, wm[:], preferred_element_type=jnp.float32) + bm[:]
    recon_out[:] = mean
    err = (x[:] - mean) ** 2
    # padded feature columns: x==0 and mean==bias-extended... zero-pad the
    # mean's padded columns explicitly before reducing
    col = jax.lax.broadcasted_iota(jnp.int32, err.shape, 1)
    err = jnp.where(col < true_d, err, 0.0)
    dev_out[:] = jnp.sum(err, axis=1, keepdims=True) / true_d


def fused_pred_deviation(dec_params: dict, z: jnp.ndarray, c: jnp.ndarray,
                         x: jnp.ndarray, non_linear: bool,
                         interpret: bool | None = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (reconstruction [B, D], deviation [B])."""
    if interpret is None:
        interpret = not _on_tpu()
    b = z.shape[0]
    out_dim = dec_params["mean"]["w"].shape[1]

    zc = jnp.concatenate([z, c.reshape(b, -1)], axis=1).astype(jnp.float32)
    k0_p = _round_up(zc.shape[1], LANE)
    b_p = _round_up(b, SUBLANE)
    out_p = _round_up(out_dim, LANE)
    zc = jnp.pad(zc, ((0, b_p - b), (0, k0_p - zc.shape[1])))
    x_p = jnp.pad(x.astype(jnp.float32),
                  ((0, b_p - b), (0, out_p - out_dim)))

    operands = [zc, x_p]
    in_dim = k0_p
    for layer in dec_params["hidden"]:
        w = layer["w"].astype(jnp.float32)
        od = _round_up(w.shape[1], LANE)
        operands.append(_pad2(w, in_dim, od))
        operands.append(_pad_bias(layer["b"].astype(jnp.float32), od))
        in_dim = od
    operands.append(_pad2(dec_params["mean"]["w"].astype(jnp.float32),
                          in_dim, out_p))
    operands.append(_pad_bias(dec_params["mean"]["b"].astype(jnp.float32),
                              out_p))

    recon, dev = pl.pallas_call(
        functools.partial(_kernel, len(dec_params["hidden"]), non_linear,
                          out_dim),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((b_p, out_p), jnp.float32),
            jax.ShapeDtypeStruct((b_p, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return recon[:b, :out_dim], dev[:b, 0]
