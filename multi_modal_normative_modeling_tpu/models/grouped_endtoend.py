"""Packed (width-grouped) form of the end-to-end dual-decoder model.

The nm-PM-cont model (models/endtoend.py, reference cVAE.py:2021-2207) has
TWO decoder banks — health and disease — which makes it the longest
serialized matmul chain in the zoo: the per-modality layout runs
2M decoder chains back-to-back per step. Under the repo's measured
performance model (the step is chain-latency bound, not FLOP/HBM bound —
RESULTS.md), that chain length is exactly what costs.

TPU-first packing: both banks are INDEPENDENT given the fused latent z, so
they stack along one [2M] modality axis — each decoder layer is ONE
batched ``einsum('mbk,mkh->mbh')`` over all 2M (bank, modality) pairs,
halving the decoder chain vs running the banks serially and cutting the
whole chain by ~2Mx vs per-modality. Width-dependent ops (encoder layer 0,
decoder mean heads + NLL) run per width group at exact width like
models/grouped.py — zero padded FLOPs on mixed-width cohorts; uniform
widths reduce to a single group.

Axis layouts:
  * encoder axis: [M] in grouped modality order (models/grouped.width_groups)
  * decoder axis: [2M]; within each width group the entries are the
    group's health decoders (grouped order) then its disease decoders, so
    the group's input block is just ``concat([x_g, x_g])`` and the
    recon/deviation rows split at the group midpoint.

The classifier head (Linear->BN->ReLU->Dropout, cVAE.py:2004-2018) is a
single small latent-width MLP — it stays the canonical apply_classifier
(packing it would save nothing and fork the BatchNorm state logic).

Numerics: identical math to EndToEndCVAE (PoE sums are
permutation-invariant; deviation means over modalities likewise), same
PRNG stream (the same 3-way key split, one [B, Z] draw, one dropout
stream), verified in tests/test_packed_endtoend.py down to
trained-trajectory parity.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fusion import poe_logvar
from ..ops.linear import leaky_relu
from ..ops.losses import (
    _HALF_LOG_2PI,
    cross_entropy_logits,
    kl_standard_normal,
    margin_contrastive,
)
from .cvae import apply_classifier, reparameterize
from .endtoend import EndToEndCVAE
from .grouped import (
    grouped_encode,
    pack_grouped_encoder,
    unpack_grouped_encoder,
    width_groups,
)


class GroupedEndToEnd:
    """Numerically-equivalent packed form of EndToEndCVAE."""

    def __init__(self, input_dim_list: Sequence[int],
                 hidden_dim: Sequence[int], latent_dim: int, c_dim: int,
                 modalities: int, non_linear: bool = True,
                 classifier_layers: Sequence[int] = (128, 64),
                 dropout_rate: float = 0.5, num_classes: int = 2,
                 dtype=jnp.float32):
        assert len(hidden_dim) >= 1, "at least one hidden layer"
        self.base = EndToEndCVAE(input_dim_list, hidden_dim, latent_dim,
                                 c_dim, modalities, non_linear,
                                 classifier_layers, dropout_rate,
                                 num_classes, dtype)
        self.input_dim_list = list(input_dim_list)
        self.hidden_dim = list(hidden_dim)
        self.n_hidden = len(hidden_dim)
        self.latent_dim = latent_dim
        self.c_dim = c_dim
        self.modalities = modalities
        self.non_linear = non_linear
        self.dropout_rate = dropout_rate
        self.groups = width_groups(input_dim_list)
        self.perm = [m for _, idx in self.groups for m in idx]
        self.inv_perm = np.argsort(self.perm)
        # decoder-bank axis order: per group, health entries then disease
        # entries (both in grouped order) — the group's x block is then
        # concat([x_g, x_g]) and rows split at the group midpoint
        self._dec_order = []
        for _, idx in self.groups:
            self._dec_order += [("dec_health", m) for m in idx]
            self._dec_order += [("dec_disease", m) for m in idx]
        self.bounds2 = np.cumsum([0] + [2 * len(idx)
                                        for _, idx in self.groups])

    # -- parameter packing --------------------------------------------------
    def init_params(self, key) -> dict:
        return self.pack_params(self.base.init_params(key))

    def pack_params(self, per: dict) -> dict:
        """EndToEndCVAE pytree -> grouped layout with the [2M] dual-bank
        decoder axis; classifier/bn_state pass through unchanged."""
        L = self.n_hidden
        stack = lambda xs: jnp.stack(xs)
        dec_layers = [{
            "w": stack([per[bank][m]["hidden"][l]["w"]
                        for bank, m in self._dec_order]),
            "b": stack([per[bank][m]["hidden"][l]["b"]
                        for bank, m in self._dec_order]),
        } for l in range(L)]
        dec_out = []
        for _, idx in self.groups:
            entries = ([("dec_health", m) for m in idx]
                       + [("dec_disease", m) for m in idx])
            dec_out.append({
                "wm": stack([per[b][m]["mean"]["w"] for b, m in entries]),
                "bm": stack([per[b][m]["mean"]["b"] for b, m in entries]),
                "lvo": stack([per[b][m]["logvar_out"][0]
                              for b, m in entries]),
            })
        return {
            "enc": pack_grouped_encoder(self.groups, self.perm,
                                        per["enc"], L),
            "dec": {"layers": dec_layers, "out": dec_out},
            "classifier": per["classifier"],
            "bn_state": per["bn_state"],
        }

    def unpack_params(self, packed: dict) -> dict:
        """Inverse -> the EndToEndCVAE pytree (checkpoints/eval)."""
        enc = unpack_grouped_encoder(self.groups, self.perm, packed["enc"],
                                     self.modalities)
        pos = {bm: i for i, bm in enumerate(self._dec_order)}
        banks = {"dec_health": [], "dec_disease": []}
        d = packed["dec"]
        for bank in ("dec_health", "dec_disease"):
            for m in range(self.modalities):
                gi = next(g for g, (_, idx) in enumerate(self.groups)
                          if m in idx)
                within_g = self.groups[gi][1].index(m)
                # the group's out tensors hold health rows then disease rows
                row = within_g if bank == "dec_health" else (
                    len(self.groups[gi][1]) + within_g)
                p = pos[(bank, m)]
                banks[bank].append({
                    "hidden": [{"w": lay["w"][p], "b": lay["b"][p]}
                               for lay in d["layers"]],
                    "mean": {"w": d["out"][gi]["wm"][row],
                             "b": d["out"][gi]["bm"][row]},
                    "logvar_out": d["out"][gi]["lvo"][row][None, :],
                })
        return {"enc": enc, "dec_health": banks["dec_health"],
                "dec_disease": banks["dec_disease"],
                "classifier": packed["classifier"],
                "bn_state": packed["bn_state"]}

    # -- data packing -------------------------------------------------------
    def pack_inputs(self, xes: Sequence[np.ndarray]) -> Tuple[np.ndarray, ...]:
        """list of [B, D_m] -> tuple per width group of [G_g, B, d_g]
        (the ENCODER axis; the decoder's 2x block is formed in-trace)."""
        return tuple(
            np.stack([np.asarray(xes[m], np.float32) for m in idx])
            for _, idx in self.groups)

    # -- compute ------------------------------------------------------------
    def forward(self, params, x_groups, c: jnp.ndarray, key,
                train: bool = True,
                mask: Optional[jnp.ndarray] = None) -> dict:
        act = leaky_relu if self.non_linear else (lambda a: a)
        mus, logvars = grouped_encode(params["enc"], x_groups, c, act)
        # PoE over (mu, logvar) (cVAE.py:2083-2090); axis-0 sums are
        # permutation-invariant over the grouped order
        fused_mu, fused_logvar = poe_logvar(mus, logvars)
        key, z_key, drop_key = jax.random.split(key, 3)  # base's exact split
        z = reparameterize(z_key, fused_mu, fused_logvar)

        d = params["dec"]
        zc = jnp.concatenate([z, c], axis=1)      # [B, Z+C]
        g = act(jnp.einsum("bk,mkh->mbh", zc, d["layers"][0]["w"])
                + d["layers"][0]["b"][:, None, :])        # [2M, B, .]
        for lay in d["layers"][1:]:
            g = act(jnp.einsum("mbk,mkh->mbh", g, lay["w"])
                    + lay["b"][:, None, :])
        means = []
        for gi, out in enumerate(d["out"]):
            lo, hi = int(self.bounds2[gi]), int(self.bounds2[gi + 1])
            means.append(jnp.einsum("gbk,gkd->gbd", g[lo:hi], out["wm"])
                         + out["bm"][:, None, :])  # [2G_g, B, d_g]
        logits, new_bn_state = apply_classifier(
            params["classifier"], params["bn_state"], z, drop_key,
            self.dropout_rate, train, mask)
        return {
            "recon_means": tuple(means),
            "mu": fused_mu,
            "logvar": fused_logvar,
            "logits": logits,
            "bn_state": new_bn_state,
        }

    def loss(self, params, x_groups, fwd, labels, margin: float = 1.0,
             weight_contrastive: float = 0.1, weight_kl: float = 0.1,
             weight_rec: float = 0.1,
             mask: Optional[jnp.ndarray] = None) -> dict:
        """Identical math to EndToEndCVAE.loss (cVAE.py:2140-2200) on the
        grouped dual-bank layout: per-(bank, modality) Gaussian NLL and
        deviations come from the [2G_g, B] group rows, split at the group
        midpoint into the health/disease halves."""
        recon_h = 0.0
        recon_d = 0.0
        dev_h_rows, dev_d_rows = [], []
        for gi, out in enumerate(params["dec"]["out"]):
            gg = len(self.groups[gi][1])
            x2 = jnp.concatenate([x_groups[gi], x_groups[gi]], axis=0)
            means = fwd["recon_means"][gi]
            lvo = out["lvo"][:, None, :]          # [2G_g, 1, d_g]
            sq = (x2 - means) ** 2
            ll_rows = jnp.sum(-0.5 * sq * jnp.exp(-lvo) - 0.5 * lvo
                              - _HALF_LOG_2PI, axis=2)        # [2G_g, B]
            if mask is None:
                ll_entry = jnp.mean(ll_rows, axis=1)
            else:
                w = mask.astype(ll_rows.dtype)
                ll_entry = (jnp.sum(ll_rows * w[None, :], axis=1)
                            / jnp.maximum(jnp.sum(w), 1.0))
            recon_h += -jnp.sum(ll_entry[:gg])
            recon_d += -jnp.sum(ll_entry[gg:])
            # per-subject feature-mean deviation (unmasked feature mean,
            # exactly the base model; the row mask applies inside the
            # contrastive term)
            dev = jnp.mean(sq, axis=2)                        # [2G_g, B]
            dev_h_rows.append(dev[:gg])
            dev_d_rows.append(dev[gg:])
        deviation_h = jnp.concatenate(dev_h_rows, axis=0).mean(axis=0)
        deviation_d = jnp.concatenate(dev_d_rows, axis=0).mean(axis=0)

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

    def predict(self, params, x_groups, c, key=None):
        """Eval-mode classifier logits from the fused mean (cVAE.py:2202)."""
        act = leaky_relu if self.non_linear else (lambda a: a)
        mus, logvars = grouped_encode(params["enc"], x_groups, c, act)
        fused_mu, _ = poe_logvar(mus, logvars)
        if key is None:
            key = jax.random.PRNGKey(0)
        logits, _ = apply_classifier(
            params["classifier"], params["bn_state"], fused_mu, key,
            self.dropout_rate, train=False)
        return logits
