"""Loss terms shared by the model zoo.

All terms support an optional per-row validity ``mask`` so that padded batches
(used by the fold-vectorized trainer) reproduce the reference's unpadded batch
means exactly: the reference reduces each term with ``.mean(0)`` over the
actual batch (cVAE.py:14-15, :1138-1139), so masked means divide by the count
of valid rows, not the padded size.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_HALF_LOG_2PI = 0.9189385332046727  # 0.5 * log(2*pi)


def _masked_mean(per_row: jnp.ndarray, mask: Optional[jnp.ndarray]):
    if mask is None:
        return jnp.mean(per_row)
    mask = mask.astype(per_row.dtype)
    return jnp.sum(per_row * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def kl_standard_normal(mu: jnp.ndarray, logvar: jnp.ndarray,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """KL(N(mu, exp(logvar)) || N(0, I)), summed over dims, mean over batch
    (cVAE.py:1138-1139)."""
    per_row = -0.5 * jnp.sum(1.0 + logvar - mu ** 2 - jnp.exp(logvar), axis=1)
    return _masked_mean(per_row, mask)


def gaussian_ll(x: jnp.ndarray, mean: jnp.ndarray, logvar_out: jnp.ndarray,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Gaussian log-likelihood of x under N(mean, exp(logvar_out)), summed
    over features, mean over batch — torch ``Normal.log_prob(x).sum(1).mean(0)``
    with the decoder's learnable homoscedastic output logvar (cVAE.py:14-15,
    :193-206)."""
    inv_var = jnp.exp(-logvar_out)
    per_row = jnp.sum(
        -0.5 * (x - mean) ** 2 * inv_var - 0.5 * logvar_out - _HALF_LOG_2PI,
        axis=1,
    )
    return _masked_mean(per_row, mask)


def neg_half_sse(x: jnp.ndarray, recon: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """-0.5 * sum((x - recon)^2, dims).mean(0) — the DMVAE-family 'll'
    (cVAE.py:1566)."""
    per_row = -0.5 * jnp.sum((x - recon) ** 2, axis=1)
    return _masked_mean(per_row, mask)


def neg_mse(x: jnp.ndarray, recon_mean: jnp.ndarray,
            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """-MSE over all elements — nm-MLP's calc_ll (nmmlp.py:124-127)."""
    sq = (x - recon_mean) ** 2
    if mask is None:
        return -jnp.mean(sq)
    m = mask.astype(sq.dtype)[:, None]
    return -jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * sq.shape[1], 1.0)


def gaussian_kl_pair(mu_p, logvar_p, mu_q, logvar_q) -> jnp.ndarray:
    """Elementwise KL(N_p || N_q) for diagonal Gaussians (torch
    kl_divergence(Normal, Normal) semantics)."""
    var_p = jnp.exp(logvar_p)
    var_q = jnp.exp(logvar_q)
    return 0.5 * (logvar_q - logvar_p) + (var_p + (mu_p - mu_q) ** 2) / (2.0 * var_q) - 0.5


def pairwise_jsd(mus, logvars, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mmJSD's pairwise-KL regularizer (cVAE.py:1404-1411): mean KL over all
    ordered pairs i<j, averaged over elements (torch ``.mean()``)."""
    n = len(mus)
    if n < 2:
        # no pairs: zero regularizer (the reference's n*(n-1)/2 denominator
        # would divide by zero; single-modality mmJSD is otherwise valid)
        return jnp.asarray(0.0)
    total = 0.0
    for i in range(n):
        for j in range(i + 1, n):
            kl = gaussian_kl_pair(mus[i], logvars[i], mus[j], logvars[j])
            if mask is None:
                total = total + jnp.mean(kl)
            else:
                m = mask.astype(kl.dtype)[:, None]
                total = total + jnp.sum(kl * m) / jnp.maximum(
                    jnp.sum(m) * kl.shape[1], 1.0
                )
    return total / (n * (n - 1) / 2)


def margin_contrastive(deviation_health, deviation_disease, labels, margin,
                       mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """End-to-end margin contrastive loss over per-sample deviations
    (cVAE.py:2176-2179)."""
    labels = labels.astype(deviation_health.dtype)
    per_row = (1.0 - labels) * jnp.maximum(
        margin + deviation_health - deviation_disease, 0.0
    ) + labels * jnp.maximum(margin + deviation_disease - deviation_health, 0.0)
    return _masked_mean(per_row, mask)


def cross_entropy_logits(logits, labels, mask: Optional[jnp.ndarray] = None):
    """Mean cross-entropy over int labels (torch F.cross_entropy)."""
    log_z = jax.nn.logsumexp(logits, axis=1)
    picked = jnp.take_along_axis(
        logits, labels[:, None].astype(jnp.int32), axis=1
    )[:, 0]
    return _masked_mean(log_z - picked, mask)


def focal_loss(inputs, targets, alpha_focal: float, gamma_focal: float,
               logits: bool = True, reduction: str = "mean"):
    """Focal BCE (FocalLoss, cVAE.py:113-138; legacy adversarial-
    discriminator objective). Reproduces the reference's branch on the first
    target: a batch whose first target is 0 uses
    alpha*(1-pt)^gamma*BCE, otherwise (1-alpha)*pt^gamma*BCE.
    """
    inputs = inputs.reshape(-1)
    targets = targets.reshape(-1).astype(inputs.dtype)
    if logits:
        # binary_cross_entropy_with_logits, elementwise
        bce = jnp.maximum(inputs, 0) - inputs * targets + jnp.log1p(
            jnp.exp(-jnp.abs(inputs)))
    else:
        clipped = jnp.clip(inputs, 1e-12, 1.0 - 1e-7)
        bce = -(targets * jnp.log(clipped)
                + (1.0 - targets) * jnp.log(1.0 - clipped))
    pt = jnp.exp(-bce)
    loss_neg = alpha_focal * (1.0 - pt) ** gamma_focal * bce
    loss_pos = (1.0 - alpha_focal) * pt ** gamma_focal * bce
    out = jnp.where(targets[0] == 0, loss_neg, loss_pos)
    if reduction == "mean":
        return jnp.mean(out)
    if reduction == "sum":
        return jnp.sum(out)
    return out
