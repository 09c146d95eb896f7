"""Latent expert-fusion ops.

All ops consume stacked per-modality statistics of shape [M, B, D] (M experts
over batch B, latent dim D) and return fused ([B, D], [B, D]) statistics.

Parity notes against the reference cVAE.py:
  * ``product_of_experts`` (cVAE.py:986-998): the reference's
    ``ProductOfExperts`` returns the fused *variance* under the name
    ``pd_logvar``; every live caller then takes ``torch.log`` of it
    (cVAE.py:1178), so the net math is a correct precision-weighted PoE over
    variances. We implement the net math (SURVEY.md Q3).
  * ``gpoe`` (cVAE.py:1154-1157): learnable per-modality weights, softmaxed
    over the modality axis, scaling each expert's precision.
  * ``mixture_of_experts`` (cVAE.py:1000-1011): softmax over all-ones weights
    == arithmetic mean of means and of variances.
  * ``mixture_of_product_of_experts`` (cVAE.py:1060-1083): PoE appended as an
    (M+1)-th expert, then MoE.
  * ``poe_logvar`` (``ProductOfExperts2``, cVAE.py:1482-1489): fuses (mu,
    logvar) pairs and returns a true logvar — used by the DMVAE family and by
    mvtCAE's 'poe' branch (which passes *variances* where logvars are
    expected; see models/multimodal.py for that quirk's reproduction).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import nn as jnn


def product_of_experts(mus: jnp.ndarray, variances: jnp.ndarray):
    """Precision-weighted product of Gaussian experts over axis 0."""
    precision = 1.0 / variances
    total_precision = jnp.sum(precision, axis=0)
    fused_mu = jnp.sum(mus * precision, axis=0) / total_precision
    fused_var = 1.0 / total_precision
    return fused_mu, fused_var


def gpoe(mus: jnp.ndarray, variances: jnp.ndarray, alpha: jnp.ndarray):
    """Generalized PoE with learnable per-modality weights.

    ``alpha`` has shape [M]; softmax over modalities scales each expert's
    precision (cVAE.py:1154-1157).
    """
    weights = jnn.softmax(alpha).reshape(-1, 1, 1)
    weighted_precision = weights / variances
    total = jnp.sum(weighted_precision, axis=0)
    fused_mu = jnp.sum(mus * weighted_precision, axis=0) / total
    fused_var = 1.0 / total
    return fused_mu, fused_var


def mixture_of_experts(mus: jnp.ndarray, variances: jnp.ndarray):
    """Uniform mixture: arithmetic mean of means and variances."""
    m = mus.shape[0]
    fused_mu = jnp.sum(mus, axis=0) / m
    fused_var = jnp.sum(variances, axis=0) / m
    return fused_mu, fused_var


def mixture_of_product_of_experts(mus: jnp.ndarray, variances: jnp.ndarray):
    """MoPoE: append the PoE expert, then take the uniform mixture."""
    poe_mu, poe_var = product_of_experts(mus, variances)
    mus_ext = jnp.concatenate([mus, poe_mu[None]], axis=0)
    var_ext = jnp.concatenate([variances, poe_var[None]], axis=0)
    return mixture_of_experts(mus_ext, var_ext)


def poe_logvar(mus: jnp.ndarray, logvars: jnp.ndarray):
    """PoE over (mu, logvar) returning a true logvar (ProductOfExperts2)."""
    precision = jnp.exp(-logvars)
    total = jnp.sum(precision, axis=0)
    fused_mu = jnp.sum(mus * precision, axis=0) / total
    fused_logvar = -jnp.log(total)
    return fused_mu, fused_logvar


def combine_latent(mus: jnp.ndarray, variances: jnp.ndarray, combine: str,
                   alpha: jnp.ndarray | None = None,
                   single_modality_shortcut: bool = True):
    """Dispatch on the fusion name, matching cVAE_multimodal.combine_latent
    (cVAE.py:1144-1164) including the M==1 shortcut at :1146.

    ``combine`` is resolved at trace time (it is a static Python string).
    """
    if single_modality_shortcut and mus.shape[0] == 1:
        return mus[0], variances[0]
    combine = combine.lower()
    if combine == "poe":
        return product_of_experts(mus, variances)
    if combine == "gpoe":
        if alpha is None:
            raise ValueError("gpoe requires alpha weights")
        return gpoe(mus, variances, alpha)
    if combine == "moe":
        return mixture_of_experts(mus, variances)
    if combine == "mopoe":
        return mixture_of_product_of_experts(mus, variances)
    raise ValueError("No such combination method")
