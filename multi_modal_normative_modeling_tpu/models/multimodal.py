"""The shared-skeleton multimodal cVAE family: cVAE_multimodal, mmJSD, mvtCAE.

Functional re-design of cVAE.py:1087-1214 (cVAE_multimodal), :1354-1448
(mmJSD, final definition) and :1754-1893 (mvtCAE). All three share the same
per-modality Encoder/Decoder stacks and learnable gPoE weights; they differ in
how latents are fused and in the loss:

  cvae    loss_m = KL(mu_mm, logvar_mm) - gaussian_ll; fusion by `combine`
          with the single-modality shortcut (cVAE.py:1146).
  mmjsd   fusion always precision-weighted over exp(logvars) (cVAE.py:1399);
          loss adds the pairwise-KL "JSD" regularizer to every modality's
          term (cVAE.py:1425-1435). NOTE the reference computes the JSD over
          M copies of the *fused* statistics (cVAE.py:1427), which is
          identically zero; reproduced for parity with `jsd_on_fused=True`
          (set False for the intended per-modality JSD).
  mvtcae  no single-modality shortcut; fused variance clamped >= 1e-6
          (cVAE.py:1824); loss = KL + 1e-5 * ll + beta(1e-4) * TC where the
          TC term degenerates (see total_correlation below); the 'poe' branch
          routes through ProductOfExperts2 with variances passed where
          logvars are expected (cVAE.py:1782-1783) — reproduced bit-for-bit.

Forward/loss are pure functions over a parameter pytree; the training step
jits and vmaps them over folds. An optional per-row `mask` makes padded
batches numerically identical to the reference's ragged final batch.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import fusion
from ..ops.losses import gaussian_ll, kl_standard_normal, neg_mse, pairwise_jsd
from .cvae import (
    apply_decoder,
    apply_encoder,
    init_decoder,
    init_encoder,
    reparameterize,
)


def total_correlation(mus_stack: jnp.ndarray,
                      mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mvtCAE's TC term, reproducing cVAE.py:1859-1865 exactly.

    The reference's ``log_qz_xi`` is ``scalar - scalar.mean()`` == 0, so the
    term reduces to ``-sum_i mean_j logsumexp_batch(mus[j, :, i])``.
    """
    if mask is not None:
        neg_inf = jnp.asarray(-jnp.inf, mus_stack.dtype)
        mus_stack = jnp.where(mask[None, :, None] > 0, mus_stack, neg_inf)
    lse = jax.nn.logsumexp(mus_stack, axis=1)  # [M, D]
    return -jnp.sum(jnp.mean(lse, axis=0))


class MultimodalCVAE:
    """Stateless model description; parameters live in pytrees."""

    def __init__(self, input_dim_list: Sequence[int], hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, modalities: int,
                 non_linear: bool = True, variant: str = "cvae",
                 jsd_on_fused: bool = True, dtype=jnp.float32):
        # "nmmlp" is the nm-MLP local model (multimodal_kfold_cvae_nmmlp.py:39-
        # 240): same skeleton, MSE-based log-likelihood (nmmlp:124-127), no
        # single-modality fusion shortcut (nmmlp:129-143). Its MLP diagnosis
        # head is excluded from the optimizer and from the loss in the
        # reference (nmmlp:92-98, :169-188), so it is not materialized here.
        assert variant in ("cvae", "mmjsd", "mvtcae", "nmmlp")
        self.input_dim_list = list(input_dim_list)
        self.hidden_dim = list(hidden_dim)
        self.latent_dim = latent_dim
        self.c_dim = c_dim
        self.modalities = modalities
        self.non_linear = non_linear
        self.variant = variant
        self.jsd_on_fused = jsd_on_fused
        self.dtype = dtype
        self.mvtcae_beta = 0.0001  # cVAE.py:1771

    # -- parameters ---------------------------------------------------------
    def init_params(self, key) -> dict:
        keys = jax.random.split(key, 2 * self.modalities + 1)
        encoders = [
            init_encoder(keys[i], self.input_dim_list[i], self.hidden_dim,
                         self.latent_dim, self.c_dim, self.dtype)
            for i in range(self.modalities)
        ]
        decoders = [
            init_decoder(keys[self.modalities + i], self.input_dim_list[i],
                         self.hidden_dim, self.latent_dim, self.c_dim,
                         dtype=self.dtype)
            for i in range(self.modalities)
        ]
        alpha = jax.random.normal(keys[-1], (self.modalities,), self.dtype)
        return {"enc": encoders, "dec": decoders, "alpha": alpha}

    # -- forward ------------------------------------------------------------
    def encode_all(self, params, xes, cs):
        mus, logvars = [], []
        for i in range(self.modalities):
            mu, lv = apply_encoder(params["enc"][i], xes[i], cs[i],
                                   self.non_linear)
            mus.append(mu)
            logvars.append(lv)
        return jnp.stack(mus), jnp.stack(logvars)

    def fuse(self, params, mus, logvars, combine: str):
        """Returns (fused_mu, fused_logvar). ``combine`` is trace-static."""
        combine = combine.lower()
        if self.variant == "mmjsd":
            # always precision-weighted, no shortcut (cVAE.py:1399-1402)
            variances = jnp.exp(logvars)
            fused_mu, fused_var = fusion.product_of_experts(mus, variances)
            return fused_mu, jnp.log(fused_var)
        variances = jnp.exp(logvars)
        if self.variant == "mvtcae":
            if combine == "poe":
                # reference quirk: ProductOfExperts2 fed variances as logvars
                fused_mu, fused_var = fusion.poe_logvar(mus, variances)
            else:
                fused_mu, fused_var = fusion.combine_latent(
                    mus, variances, combine, params["alpha"],
                    single_modality_shortcut=False,
                )
            fused_var = jnp.maximum(fused_var, 1e-6)  # cVAE.py:1824
            return fused_mu, jnp.log(fused_var)
        fused_mu, fused_var = fusion.combine_latent(
            mus, variances, combine, params["alpha"],
            single_modality_shortcut=(self.variant != "nmmlp"),
        )
        return fused_mu, jnp.log(fused_var)

    def forward(self, params, xes: List[jnp.ndarray], cs: List[jnp.ndarray],
                key, combine: str) -> dict:
        """forward_multimodal: encode -> fuse -> reparameterize -> decode all."""
        mus, logvars = self.encode_all(params, xes, cs)
        fused_mu, fused_logvar = self.fuse(params, mus, logvars, combine)
        z = reparameterize(key, fused_mu, fused_logvar)
        recon_means, recon_logvars = [], []
        for i in range(self.modalities):
            mean, lv_out = apply_decoder(params["dec"][i], z, cs[i],
                                         self.non_linear)
            recon_means.append(mean)
            recon_logvars.append(lv_out)
        return {
            "recon_means": recon_means,
            "recon_logvars": recon_logvars,
            "mu_multimodal": fused_mu,
            "logvar_multimodal": fused_logvar,
            "mus": mus,
            "logvars": logvars,
            "z": z,
        }

    # -- losses ---------------------------------------------------------------
    def loss(self, params, xes, fwd, mask: Optional[jnp.ndarray] = None) -> dict:
        kl_total = 0.0
        ll_total = 0.0
        total = 0.0
        extras = {}
        if self.variant == "mmjsd":
            if self.jsd_on_fused:
                # cVAE.py:1427 — JSD over M copies of the fused stats (== 0)
                stats = [fwd["mu_multimodal"]] * self.modalities
                lvs = [fwd["logvar_multimodal"]] * self.modalities
            else:
                stats = list(fwd["mus"])
                lvs = list(fwd["logvars"])
            jsd = pairwise_jsd(stats, lvs, mask)
        if self.variant == "mvtcae":
            tc = total_correlation(fwd["mus"], mask)
            extras["tc"] = tc * self.modalities
        for i in range(self.modalities):
            kl = kl_standard_normal(fwd["mu_multimodal"],
                                    fwd["logvar_multimodal"], mask)
            if self.variant == "nmmlp":
                ll = neg_mse(xes[i], fwd["recon_means"][i], mask)
            else:
                ll = gaussian_ll(xes[i], fwd["recon_means"][i],
                                 fwd["recon_logvars"][i], mask)
            kl_total += kl
            ll_total += ll
            if self.variant in ("cvae", "nmmlp"):
                total += kl - ll
            elif self.variant == "mmjsd":
                total += kl + jsd - ll
            elif self.variant == "mvtcae":
                total += kl + 0.00001 * ll + self.mvtcae_beta * tc
        out = {"total": total, "kl": kl_total, "ll": ll_total}
        out.update(extras)
        if self.variant == "mmjsd":
            out["jsd"] = jsd
        return out

    # -- inference ------------------------------------------------------------
    def pred_recon(self, params, xes, cs, key, combine: str) -> List[jnp.ndarray]:
        """Stochastic reconstruction at test time (cVAE.py:1198-1208 —
        reparameterize is used even for inference, SURVEY.md Q2)."""
        fwd = self.forward(params, xes, cs, key, combine)
        return fwd["recon_means"]

    @staticmethod
    def reconstruction_deviation(x, x_pred) -> jnp.ndarray:
        """Per-subject mean squared error over features (cVAE.py:1210-1211)."""
        return jnp.sum((x - x_pred) ** 2, axis=1) / x.shape[1]

    def latent_stats(self, params, xes, cs, combine: str):
        """(fused_mu, fused_var) without sampling — feeds the latent
        deviation utilities (utils_vae.py:155-161)."""
        mus, logvars = self.encode_all(params, xes, cs)
        fused_mu, fused_logvar = self.fuse(params, mus, logvars, combine)
        return fused_mu, jnp.exp(fused_logvar)

    def pred_recon_fused(self, params, xes, cs, key, combine: str,
                         interpret: bool | None = None):
        """Fused-kernel inference path: Pallas encoder kernels per modality,
        fusion in-registers, then one decode+deviation kernel per modality.

        Returns (recon_means list, deviations list) — numerically equivalent
        to pred_recon + reconstruction_deviation (same PRNG stream).
        """
        from ..kernels import fused_encoder, fused_pred_deviation

        mus, logvars = [], []
        for i in range(self.modalities):
            mu, lv = fused_encoder(params["enc"][i], xes[i], cs[i],
                                   self.non_linear, interpret=interpret)
            mus.append(mu)
            logvars.append(lv)
        fused_mu, fused_logvar = self.fuse(params, jnp.stack(mus),
                                           jnp.stack(logvars), combine)
        z = reparameterize(key, fused_mu, fused_logvar)
        recons, deviations = [], []
        for i in range(self.modalities):
            recon, dev = fused_pred_deviation(params["dec"][i], z, cs[i],
                                              xes[i], self.non_linear,
                                              interpret=interpret)
            recons.append(recon)
            deviations.append(dev)
        return recons, deviations
