"""End-to-end supervised dual-decoder model (nm-PM-cont).

Functional re-design of the winning ``cVAE_multimodal_endtoend``
(cVAE.py:2021-2207): shared per-modality encoders, a *health* and a *disease*
decoder bank, PoE latent fusion over (mu, logvar), and a latent classifier MLP
(Linear->BatchNorm->ReLU->Dropout blocks, cVAE.py:2004-2018).

Loss (cVAE.py:2140-2200):
  w_rec * (recon_nll_health + recon_nll_disease)
  + w_kl * KL(fused || N(0, I))
  + cross_entropy(classifier logits, labels)
  + w_con * margin-contrastive on mean-over-modalities deviations
    (health-decoder deviation should be lower for label-0 subjects, disease-
    decoder deviation lower for label-1 subjects).

``predict`` classifies from the fused mean without sampling (cVAE.py:2202) in
eval mode (BatchNorm running stats, no dropout).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.fusion import poe_logvar
from ..ops.losses import (
    cross_entropy_logits,
    gaussian_ll,
    kl_standard_normal,
    margin_contrastive,
)
from .cvae import (
    apply_classifier,
    apply_decoder,
    apply_encoder,
    init_classifier,
    init_decoder,
    init_encoder,
    reparameterize,
)


class EndToEndCVAE:
    def __init__(self, input_dim_list: Sequence[int], hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, modalities: int,
                 non_linear: bool = True,
                 classifier_layers: Sequence[int] = (128, 64),
                 dropout_rate: float = 0.5, num_classes: int = 2,
                 dtype=jnp.float32):
        self.input_dim_list = list(input_dim_list)
        self.hidden_dim = list(hidden_dim)
        self.latent_dim = latent_dim
        self.c_dim = c_dim
        self.modalities = modalities
        self.non_linear = non_linear
        self.classifier_layers = list(classifier_layers)
        self.dropout_rate = dropout_rate
        self.num_classes = num_classes
        self.dtype = dtype

    def init_params(self, key) -> dict:
        keys = jax.random.split(key, 3 * self.modalities + 1)
        enc = [init_encoder(keys[i], self.input_dim_list[i], self.hidden_dim,
                            self.latent_dim, self.c_dim, self.dtype)
               for i in range(self.modalities)]
        dec_h = [init_decoder(keys[self.modalities + i],
                              self.input_dim_list[i], self.hidden_dim,
                              self.latent_dim, self.c_dim, dtype=self.dtype)
                 for i in range(self.modalities)]
        dec_d = [init_decoder(keys[2 * self.modalities + i],
                              self.input_dim_list[i], self.hidden_dim,
                              self.latent_dim, self.c_dim, dtype=self.dtype)
                 for i in range(self.modalities)]
        clf = init_classifier(keys[-1], self.latent_dim,
                              self.classifier_layers, self.num_classes,
                              self.dtype)
        return {"enc": enc, "dec_health": dec_h, "dec_disease": dec_d,
                "classifier": clf["params"], "bn_state": clf["state"]}

    def _encode_fuse(self, params, xes, cs):
        mus, logvars = [], []
        for i in range(self.modalities):
            mu, lv = apply_encoder(params["enc"][i], xes[i], cs[i],
                                   self.non_linear)
            mus.append(mu)
            logvars.append(lv)
        # PoE over (mu, logvar) (cVAE.py:2083-2090) — the shared
        # ProductOfExperts2 op
        return poe_logvar(jnp.stack(mus), jnp.stack(logvars))

    def forward(self, params, xes: List[jnp.ndarray], cs: List[jnp.ndarray],
                key, train: bool = True,
                mask: Optional[jnp.ndarray] = None) -> dict:
        fused_mu, fused_logvar = self._encode_fuse(params, xes, cs)
        key, z_key, drop_key = jax.random.split(key, 3)
        z = reparameterize(z_key, fused_mu, fused_logvar)
        recons_h, recons_d = [], []
        for i in range(self.modalities):
            recons_h.append(apply_decoder(params["dec_health"][i], z, cs[i],
                                          self.non_linear))
            recons_d.append(apply_decoder(params["dec_disease"][i], z, cs[i],
                                          self.non_linear))
        logits, new_bn_state = apply_classifier(
            params["classifier"], params["bn_state"], z, drop_key,
            self.dropout_rate, train, mask,
        )
        return {
            "recons_health": recons_h,
            "recons_disease": recons_d,
            "mu": fused_mu,
            "logvar": fused_logvar,
            "logits": logits,
            "bn_state": new_bn_state,
        }

    def loss(self, params, xes, fwd, labels, margin: float = 1.0,
             weight_contrastive: float = 0.1, weight_kl: float = 0.1,
             weight_rec: float = 0.1,
             mask: Optional[jnp.ndarray] = None) -> dict:
        recon_h = 0.0
        recon_d = 0.0
        dev_h, dev_d = [], []
        for i in range(self.modalities):
            mean_h, lv_h = fwd["recons_health"][i]
            mean_d, lv_d = fwd["recons_disease"][i]
            # NLL = -gaussian_ll (exact: negation commutes with the
            # masked mean in IEEE arithmetic)
            recon_h += -gaussian_ll(xes[i], mean_h, lv_h, mask)
            recon_d += -gaussian_ll(xes[i], mean_d, lv_d, mask)
            dev_h.append(jnp.mean((xes[i] - mean_h) ** 2, axis=1))
            dev_d.append(jnp.mean((xes[i] - mean_d) ** 2, axis=1))
        deviation_h = jnp.stack(dev_h).mean(axis=0)
        deviation_d = jnp.stack(dev_d).mean(axis=0)

        contrastive = margin_contrastive(deviation_h, deviation_d, labels,
                                         margin, mask)
        kl = kl_standard_normal(fwd["mu"], fwd["logvar"], mask)
        ce = cross_entropy_logits(fwd["logits"], labels, mask)
        total = (weight_rec * (recon_h + recon_d) + weight_kl * kl + ce
                 + weight_contrastive * contrastive)
        return {
            "total_loss": total,
            "recon_loss_health": recon_h,
            "recon_loss_disease": recon_d,
            "kl_loss": kl,
            "classification_loss": ce,
            "contrastive_loss": contrastive,
        }

    def predict(self, params, xes, cs, key=None):
        """Eval-mode classifier logits from the fused mean (cVAE.py:2202)."""
        fused_mu, _ = self._encode_fuse(params, xes, cs)
        if key is None:
            key = jax.random.PRNGKey(0)
        logits, _ = apply_classifier(
            params["classifier"], params["bn_state"], fused_mu, key,
            self.dropout_rate, train=False,
        )
        return logits
