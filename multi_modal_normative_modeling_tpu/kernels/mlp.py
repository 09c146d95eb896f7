"""Fused conditional MLP kernels (Pallas TPU).

The reference runs each Linear as a separate eager op
(cVAE.py:161-172, :197-206); XLA already fuses some of that, but the fully
fused kernel keeps the whole encoder chain's activations in VMEM: one HBM
read of x/c, one HBM write of (mu, logvar). Weights for these models are tiny
(<= ~3.6k x 128 fp32), so they sit whole in VMEM beside a batch tile.

Layout rules (pallas_guide): fp32 tiles are (8, 128); all feature dims are
zero-padded to multiples of 128 and the batch to multiples of 8. Zero padding
is exact for this math: padded K columns contribute 0 to dot products,
LeakyReLU(0)=0 propagates, and padded batch rows are discarded on return.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
BATCH_TILE = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad2(a, rows: int, cols: int):
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _pad_bias(b, cols: int):
    return jnp.pad(b.reshape(1, -1), ((0, 0), (0, cols - b.shape[-1])))


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _leaky(h):
    return jnp.where(h > 0, h, 0.01 * h)


def _encoder_kernel(n_hidden: int, non_linear: bool, *refs):
    """refs: xc, W_0,b_0..W_{n-1},b_{n-1}, Wm,bm,Wl,bl, mu_out, lv_out."""
    xc = refs[0]
    idx = 1
    h = xc[:]
    for _ in range(n_hidden):
        w, b = refs[idx], refs[idx + 1]
        idx += 2
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        if non_linear:
            h = _leaky(h)
    wm, bm, wl, bl = refs[idx], refs[idx + 1], refs[idx + 2], refs[idx + 3]
    mu_out, lv_out = refs[idx + 4], refs[idx + 5]
    mu_out[:] = jnp.dot(h, wm[:], preferred_element_type=jnp.float32) + bm[:]
    lv_out[:] = jnp.dot(h, wl[:], preferred_element_type=jnp.float32) + bl[:]


def fused_encoder(enc_params: dict, x: jnp.ndarray, c: jnp.ndarray,
                  non_linear: bool, interpret: bool | None = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas version of models.cvae.apply_encoder: one kernel for the whole
    (concat -> hidden linears [+LeakyReLU] -> mu/logvar heads) chain."""
    if interpret is None:
        interpret = not _on_tpu()
    b, _ = x.shape
    latent = enc_params["mu"]["w"].shape[1]

    xc = jnp.concatenate([x, c], axis=1).astype(jnp.float32)
    k0 = xc.shape[1]
    k0_p = _round_up(k0, LANE)
    b_p = _round_up(b, BATCH_TILE if b > BATCH_TILE else SUBLANE)
    xc = jnp.pad(xc, ((0, b_p - b), (0, k0_p - k0)))

    operands = [xc]
    in_dim = k0_p
    for layer in enc_params["hidden"]:
        w = layer["w"].astype(jnp.float32)
        out_dim = _round_up(w.shape[1], LANE)
        operands.append(_pad2(w, in_dim, out_dim))
        operands.append(_pad_bias(layer["b"].astype(jnp.float32), out_dim))
        in_dim = out_dim
    lat_p = _round_up(latent, LANE)
    for head in ("mu", "logvar"):
        w = enc_params[head]["w"].astype(jnp.float32)
        operands.append(_pad2(w, in_dim, lat_p))
        operands.append(_pad_bias(enc_params[head]["b"].astype(jnp.float32),
                                  lat_p))

    n_hidden = len(enc_params["hidden"])
    grid = (b_p // BATCH_TILE,) if b_p > BATCH_TILE else ()

    if not grid:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands)
        out_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        out_shape = [
            jax.ShapeDtypeStruct((b_p, lat_p), jnp.float32),
            jax.ShapeDtypeStruct((b_p, lat_p), jnp.float32),
        ]
    else:
        tile = BATCH_TILE
        in_specs = [pl.BlockSpec((tile, k0_p), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)]
        in_specs += [pl.BlockSpec(op.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for op in operands[1:]]
        out_specs = [pl.BlockSpec((tile, lat_p), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [
            jax.ShapeDtypeStruct((b_p, lat_p), jnp.float32),
            jax.ShapeDtypeStruct((b_p, lat_p), jnp.float32),
        ]

    mu, lv = pl.pallas_call(
        functools.partial(_encoder_kernel, n_hidden, non_linear),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return mu[:b, :latent], lv[:b, :latent]


def _decoder_kernel(n_hidden: int, non_linear: bool, *refs):
    """refs: zc, W_0,b_0.., Wmean,bmean, mean_out."""
    zc = refs[0]
    idx = 1
    h = zc[:]
    for _ in range(n_hidden):
        w, b = refs[idx], refs[idx + 1]
        idx += 2
        h = jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]
        if non_linear:
            h = _leaky(h)
    wm, bm = refs[idx], refs[idx + 1]
    out = refs[idx + 2]
    out[:] = jnp.dot(h, wm[:], preferred_element_type=jnp.float32) + bm[:]


def fused_decoder_mean(dec_params: dict, z: jnp.ndarray, c: jnp.ndarray,
                       non_linear: bool, interpret: bool | None = None
                       ) -> jnp.ndarray:
    """Pallas version of models.cvae.apply_decoder's mean path.

    Single-block (no batch tiling, unlike fused_encoder): the whole batch's
    activations must fit VMEM. Callers handle overflow — the test stage's
    --fused_inference path falls back to the XLA program when Mosaic
    rejects the shape (cli/test_supervised.py)."""
    if interpret is None:
        interpret = not _on_tpu()
    b = z.shape[0]
    out_dim = dec_params["mean"]["w"].shape[1]

    zc = jnp.concatenate([z, c.reshape(b, -1)], axis=1).astype(jnp.float32)
    k0 = zc.shape[1]
    k0_p = _round_up(k0, LANE)
    b_p = _round_up(b, SUBLANE)
    zc = jnp.pad(zc, ((0, b_p - b), (0, k0_p - k0)))

    operands = [zc]
    in_dim = k0_p
    for layer in dec_params["hidden"]:
        w = layer["w"].astype(jnp.float32)
        od = _round_up(w.shape[1], LANE)
        operands.append(_pad2(w, in_dim, od))
        operands.append(_pad_bias(layer["b"].astype(jnp.float32), od))
        in_dim = od
    out_p = _round_up(out_dim, LANE)
    operands.append(_pad2(dec_params["mean"]["w"].astype(jnp.float32),
                          in_dim, out_p))
    operands.append(_pad_bias(dec_params["mean"]["b"].astype(jnp.float32),
                              out_p))

    mean = pl.pallas_call(
        functools.partial(_decoder_kernel, len(dec_params["hidden"]),
                          non_linear),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_p, out_p), jnp.float32),
        interpret=interpret,
    )(*operands)
    return mean[:b, :out_dim]
