"""Split-latent family: DMVAE, WeightedDMVAE, mmVAEPlus.

Functional re-design of cVAE.py:1491-1598 (DMVAE), :1620-1747 (WeightedDMVAE)
and :1895-2002 (mmVAEPlus, final definition). All three share:

  * plain 2-hidden-layer ReLU ``VariationalEncoder`` per modality that
    ignores covariates (cVAE.py:1454-1467) and emits latent_dim (mu, logvar);
  * the first s_dim = c_dim latent dims are the modality-private code, the
    remaining latent_dim - c_dim dims are shared;
  * the shared code is fused by a correct PoE over (mu, logvar)
    (``ProductOfExperts2``, cVAE.py:1482-1489);
  * each modality decodes concat(z_shared, mu_private_i) — total width back
    to latent_dim — through a sigmoid-output MLP (cVAE.py:1469-1480);
  * loss = beta * KL(shared) - sum_m -0.5*||x - recon||^2, with
    beta = 1.0 (DMVAE), 0.05 (mmVAEPlus); WeightedDMVAE instead weights each
    modality's KL and SSE terms by a learnable positive weight (cVAE.py:1651,
    :1692-1708; initialized |N(0,1)|, unconstrained afterwards).

Requires latent_dim > c_dim.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.fusion import poe_logvar
from ..ops.losses import (
    kl_standard_normal,
    neg_half_sse,
)
from ..ops.linear import apply_linear, init_mlp
from .cvae import reparameterize


class DMVAEFamily:
    def __init__(self, input_dim_list: Sequence[int], hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, modalities: int,
                 variant: str = "dmvae", dtype=jnp.float32):
        assert variant in ("dmvae", "weighted", "mmvaeplus")
        # Reference quirk: with latent_dim <= c_dim (e.g. the default
        # hz=[110,110,10] with c_dim=29), torch's mu[:, :c_dim] clamps to the
        # full latent and mu[:, c_dim:] is EMPTY — the "shared" code is
        # zero-width, PoE/KL over it are no-ops, and the model trains as a
        # per-modality autoencoder on the private code (cVAE.py:1525-1526,
        # :1547-1551). jnp slicing reproduces this silently-degenerate
        # behavior exactly; we only surface a warning.
        if latent_dim <= c_dim:
            import warnings

            warnings.warn(
                f"DMVAE-family with latent_dim={latent_dim} <= c_dim={c_dim}:"
                " shared code is empty (reference-compatible degenerate mode)"
            )
        self.input_dim_list = list(input_dim_list)
        self.hidden_dim = list(hidden_dim)
        self.latent_dim = latent_dim
        self.c_dim = c_dim
        self.s_dim = c_dim
        self.modalities = modalities
        self.variant = variant
        self.beta = {"dmvae": 1.0, "weighted": 1.0, "mmvaeplus": 0.05}[variant]
        self.dtype = dtype

    def init_params(self, key) -> dict:
        h = self.hidden_dim
        keys = jax.random.split(key, 2 * self.modalities + 1)
        encoders = []
        decoders = []
        for i in range(self.modalities):
            d = self.input_dim_list[i]
            ek = jax.random.split(keys[i], 3)
            encoders.append({
                "trunk": init_mlp(ek[0], [d, h[0], h[1]], self.dtype),
                "mu": init_mlp(ek[1], [h[1], self.latent_dim], self.dtype)[0],
                "logvar": init_mlp(ek[2], [h[1], self.latent_dim], self.dtype)[0],
            })
            decoders.append({
                "layers": init_mlp(keys[self.modalities + i],
                                   [self.latent_dim, h[1], h[0], d], self.dtype),
            })
        params = {"enc": encoders, "dec": decoders}
        if self.variant == "weighted":
            params["weights"] = jnp.abs(
                jax.random.normal(keys[-1], (self.modalities,), self.dtype)
            )
        return params

    def encode(self, params, x, m: int):
        h = x
        for layer in params["enc"][m]["trunk"]:
            h = jax.nn.relu(apply_linear(layer, h))
        mu = apply_linear(params["enc"][m]["mu"], h)
        logvar = apply_linear(params["enc"][m]["logvar"], h)
        s = self.s_dim
        return mu[:, :s], logvar[:, :s], mu[:, s:], logvar[:, s:]

    def decode(self, params, z_combined, m: int):
        h = z_combined
        layers = params["dec"][m]["layers"]
        for layer in layers[:-1]:
            h = jax.nn.relu(apply_linear(layer, h))
        return jax.nn.sigmoid(apply_linear(layers[-1], h))

    def forward(self, params, xes: List[jnp.ndarray], cs, key,
                combine: str = "poe") -> dict:
        mu_s, mu_c, logvar_c = [], [], []
        for i in range(self.modalities):
            ms, _ls, mc, lc = self.encode(params, xes[i], i)
            mu_s.append(ms)
            mu_c.append(mc)
            logvar_c.append(lc)
        fused_mu, fused_logvar = poe_logvar(jnp.stack(mu_c), jnp.stack(logvar_c))
        z = reparameterize(key, fused_mu, fused_logvar)
        recons = [
            self.decode(params, jnp.concatenate([z, mu_s[i]], axis=1), i)
            for i in range(self.modalities)
        ]
        return {"recon_means": recons, "mu_c": fused_mu,
                "logvar_c": fused_logvar}

    def loss(self, params, xes, fwd, mask: Optional[jnp.ndarray] = None) -> dict:
        mu_c, logvar_c = fwd["mu_c"], fwd["logvar_c"]
        kl_one = kl_standard_normal(mu_c, logvar_c, mask)
        kl = 0.0
        ll = 0.0
        for i in range(self.modalities):
            ll_i = neg_half_sse(xes[i], fwd["recon_means"][i], mask)
            if self.variant == "weighted":
                w = params["weights"][i]
                kl += kl_one * w
                ll += ll_i * w
            else:
                kl += kl_one
                ll += ll_i
        if self.variant == "weighted":
            total = kl - ll
        else:
            total = kl * self.beta - ll
        return {"total": total, "kl": kl, "ll": ll}

    def pred_recon(self, params, xes, cs, key, combine: str = "poe"):
        return self.forward(params, xes, cs, key, combine)["recon_means"]

    @staticmethod
    def reconstruction_deviation(x, x_pred) -> jnp.ndarray:
        return jnp.sum((x - x_pred) ** 2, axis=1) / x.shape[1]
