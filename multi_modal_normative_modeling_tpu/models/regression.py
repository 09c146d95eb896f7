"""Continuous-score regression variant (cVAE_multimodal_regression).

Re-design of cVAE.py:2211-2346: the cVAE_multimodal skeleton plus a regression
head — an MLP (sum(input_dims) -> 128 -> 64 -> 1, ReLU) fed the *concatenated
reconstruction residuals* x - x_hat across modalities (cVAE.py:2320-2323).
Loss = sum_m (KL - gaussian_ll) + lambda * MSE(fi_pred, fi_true)
(cVAE.py:2332-2346). Covariates are the raw 2-column [AGE, PTGENDER]
(c_dim=2, multimodal_kfold_train_cvae_supervised_regression.py:83-84).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.linear import apply_mlp, init_mlp
from ..ops.losses import _masked_mean
from .multimodal import MultimodalCVAE


class RegressionCVAE:
    def __init__(self, input_dim_list: Sequence[int], hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, modalities: int,
                 non_linear: bool = True, dtype=jnp.float32):
        self.base = MultimodalCVAE(input_dim_list, hidden_dim, latent_dim,
                                   c_dim, modalities, non_linear,
                                   variant="cvae", dtype=dtype)
        self.input_dim_list = list(input_dim_list)
        self.modalities = modalities
        self.dtype = dtype

    def init_params(self, key) -> dict:
        k_base, k_reg = jax.random.split(key)
        params = self.base.init_params(k_base)
        params["regressor"] = init_mlp(
            k_reg, [sum(self.input_dim_list), 128, 64, 1], self.dtype
        )
        return params

    def forward(self, params, xes: List[jnp.ndarray], cs: List[jnp.ndarray],
                key, combine: str) -> dict:
        fwd = self.base.forward(params, xes, cs, key, combine)
        residuals = [xes[i] - fwd["recon_means"][i]
                     for i in range(self.modalities)]
        concat = jnp.concatenate(residuals, axis=1)
        fwd["fi_pred"] = apply_mlp(params["regressor"], concat,
                                   activation=jax.nn.relu)
        return fwd

    def loss(self, params, xes, fwd, true_fi, lambda_reg: float = 1.0,
             mask: Optional[jnp.ndarray] = None) -> dict:
        losses = self.base.loss(params, xes, fwd, mask)
        err = (fwd["fi_pred"].reshape(-1) - true_fi.reshape(-1)) ** 2
        regression = _masked_mean(err, mask)
        losses["regression"] = regression
        losses["total"] = losses["total"] + lambda_reg * regression
        return losses

    # single-modality encode/decode used by the ROI-wise deviation extraction
    # (regression script :183-188)
    def roiwise_deviation(self, params, x, c, key, modal_idx: int):
        from .cvae import apply_decoder, apply_encoder, reparameterize

        mu, logvar = apply_encoder(params["enc"][modal_idx], x, c,
                                   self.base.non_linear)
        z = reparameterize(key, mu, logvar)
        mean, _ = apply_decoder(params["dec"][modal_idx], z, c,
                                self.base.non_linear)
        return (x - mean) ** 2

    def pred_fi(self, params, xes, cs, key, combine: str):
        return self.forward(params, xes, cs, key, combine)["fi_pred"]
