"""Packed (width-grouped) form of the regression variant.

cVAE_multimodal_regression (models/regression.py, reference
cVAE.py:2211-2346) is the cvae skeleton plus a regression MLP
(sum(input_dims) -> 128 -> 64 -> 1, ReLU) fed the CONCATENATED
reconstruction residuals x - x_hat across modalities. The skeleton packs
exactly like models/grouped.GroupedStackedCVAE (variant 'cvae'); the
residual concat re-assembles the per-group recon rows back into ORIGINAL
modality order (the regressor's input feature order is part of the
numerics), and the regressor itself is a single narrow MLP that stays the
canonical apply_mlp.

Numerics identical to RegressionCVAE (same PRNG stream: one [B, Z] draw),
verified in tests/test_packed_regression.py down to trained-trajectory
parity under the reference's per-epoch shuffling.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops.linear import apply_mlp
from ..ops.losses import _masked_mean
from .grouped import GroupedStackedCVAE
from .regression import RegressionCVAE


class GroupedRegressionCVAE:
    """Numerically-equivalent packed form of RegressionCVAE."""

    def __init__(self, input_dim_list: Sequence[int],
                 hidden_dim: Sequence[int], latent_dim: int, c_dim: int,
                 modalities: int, non_linear: bool = True,
                 dtype=jnp.float32):
        self.base = RegressionCVAE(input_dim_list, hidden_dim, latent_dim,
                                   c_dim, modalities, non_linear, dtype)
        self.skel = GroupedStackedCVAE(input_dim_list, hidden_dim,
                                       latent_dim, c_dim, modalities,
                                       non_linear, dtype, variant="cvae")
        self.input_dim_list = list(input_dim_list)
        self.modalities = modalities
        self.groups = self.skel.groups
        # original modality m -> (group index, row within group)
        self._locate = []
        for m in range(modalities):
            gi = next(g for g, (_, idx) in enumerate(self.groups)
                      if m in idx)
            self._locate.append((gi, self.groups[gi][1].index(m)))

    # -- parameter packing --------------------------------------------------
    def init_params(self, key) -> dict:
        return self.pack_params(self.base.init_params(key))

    def pack_params(self, per: dict) -> dict:
        packed = self.skel.pack_params(
            {"enc": per["enc"], "dec": per["dec"], "alpha": per["alpha"]})
        packed["regressor"] = per["regressor"]
        return packed

    def unpack_params(self, packed: dict) -> dict:
        out = self.skel.unpack_params(
            {"enc": packed["enc"], "dec": packed["dec"],
             "alpha": packed["alpha"]})
        out["regressor"] = packed["regressor"]
        return out

    # -- data packing -------------------------------------------------------
    def pack_inputs(self, xes):
        return self.skel.pack_inputs(xes)

    # -- compute ------------------------------------------------------------
    def forward(self, params, x_groups, c: jnp.ndarray, key,
                combine: str) -> dict:
        fwd = self.skel.forward(params, x_groups, c, key, combine)
        # residual concat in ORIGINAL modality order (cVAE.py:2320-2323)
        residuals = []
        for m in range(self.modalities):
            gi, within = self._locate[m]
            residuals.append(x_groups[gi][within]
                             - fwd["recon_means"][gi][within])
        concat = jnp.concatenate(residuals, axis=1)   # [B, sum(d_m)]
        fwd["fi_pred"] = apply_mlp(params["regressor"], concat,
                                   activation=jax.nn.relu)
        return fwd

    def loss(self, params, x_groups, fwd, true_fi, lambda_reg: float = 1.0,
             mask: Optional[jnp.ndarray] = None) -> dict:
        losses = self.skel.loss(params, x_groups, fwd, mask)
        err = (fwd["fi_pred"].reshape(-1) - true_fi.reshape(-1)) ** 2
        regression = _masked_mean(err, mask)
        losses["regression"] = regression
        losses["total"] = losses["total"] + lambda_reg * regression
        return losses

    def pred_fi(self, params, x_groups, c, key, combine: str):
        return self.forward(params, x_groups, c, key, combine)["fi_pred"]
