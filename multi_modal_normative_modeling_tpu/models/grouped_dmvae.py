"""Packed (width-grouped) form of the split-latent DMVAE family.

DMVAE / WeightedDMVAE / mmVAEPlus (models/dmvae.py, reference
cVAE.py:1491-1747, :1895-2002) share one skeleton: a plain 2-hidden-layer
ReLU encoder per modality that IGNORES covariates, a private/shared latent
split at s_dim = c_dim, PoE over the shared code, and a sigmoid-output
decoder per modality fed concat(z_shared, mu_private). That makes packing
simpler than the cvae skeleton's (no covariate concat), and the same
width-grouped recipe applies: width-dependent ops (encoder layer 0,
decoder output layer + SSE) run per width group at exact width, everything
width-uniform is one [M, B, H] batched einsum over all modalities in
grouped order.

The split/fuse math is permutation-invariant (PoE precision sums over the
modality axis; the loss is a plain sum of per-modality terms — the
weighted variant's weights are permuted positionally alongside), so
trajectories match the per-modality model to float-reorder tolerance
(tests/test_packed_dmvae.py).

DMVAEFamily's degenerate latent_dim <= c_dim mode (empty shared code —
PARITY quirk ledger) packs identically: the shared slices are zero-width
and the PoE/KL over them are no-ops, exactly as in the per-modality model.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

import jax

from ..ops.fusion import poe_logvar
from ..ops.losses import kl_standard_normal
from .cvae import reparameterize
from .dmvae import DMVAEFamily
from .grouped import width_groups


class GroupedDMVAE:
    """Numerically-equivalent packed form of DMVAEFamily."""

    def __init__(self, input_dim_list: Sequence[int],
                 hidden_dim: Sequence[int], latent_dim: int, c_dim: int,
                 modalities: int, variant: str = "dmvae",
                 dtype=jnp.float32):
        assert variant in ("dmvae", "weighted", "mmvaeplus")
        self.base = DMVAEFamily(input_dim_list, hidden_dim, latent_dim,
                                c_dim, modalities, variant, dtype)
        self.input_dim_list = list(input_dim_list)
        self.hidden_dim = list(hidden_dim)
        self.latent_dim = latent_dim
        self.s_dim = self.base.s_dim
        self.modalities = modalities
        self.variant = variant
        self.groups = width_groups(input_dim_list)
        self.perm = [m for _, idx in self.groups for m in idx]
        self.inv_perm = np.argsort(self.perm)
        self.bounds = np.cumsum([0] + [len(idx) for _, idx in self.groups])

    # -- parameter packing --------------------------------------------------
    def init_params(self, key) -> dict:
        return self.pack_params(self.base.init_params(key))

    def pack_params(self, per: dict) -> dict:
        """DMVAEFamily pytree -> grouped layout. Encoder trunk layer 0 and
        the decoder's final (output) layer are width-dependent and stack
        per group at exact width; the trunk's second layer, the merged
        mu/logvar heads and the decoder's latent-side layers stack over all
        modalities in grouped order."""
        stack = lambda xs: jnp.stack(xs)
        pi = self.perm
        # depths come from the ACTUAL per-modality lists, not
        # len(hidden_dim): DMVAEFamily always builds a 2-layer trunk and a
        # 3-layer decoder from h[0]/h[1] (dmvae.py init_params), silently
        # ignoring extra hidden dims — the packed form must mirror that,
        # not crash indexing trunk[2] on a 3-hidden-dim config
        n_trunk = len(per["enc"][pi[0]]["trunk"])
        n_dec = len(per["dec"][pi[0]]["layers"])
        enc0 = [{
            "w": stack([per["enc"][m]["trunk"][0]["w"] for m in idx]),
            "b": stack([per["enc"][m]["trunk"][0]["b"] for m in idx]),
        } for _, idx in self.groups]
        dec_out = [{
            "w": stack([per["dec"][m]["layers"][-1]["w"] for m in idx]),
            "b": stack([per["dec"][m]["layers"][-1]["b"] for m in idx]),
        } for _, idx in self.groups]
        packed = {
            "enc": {
                "layer0": enc0,
                "trunk": [{
                    "w": stack([per["enc"][m]["trunk"][l]["w"]
                                for m in pi]),
                    "b": stack([per["enc"][m]["trunk"][l]["b"]
                                for m in pi]),
                } for l in range(1, n_trunk)],
                "wmu": stack([per["enc"][m]["mu"]["w"] for m in pi]),
                "bmu": stack([per["enc"][m]["mu"]["b"] for m in pi]),
                "wlv": stack([per["enc"][m]["logvar"]["w"] for m in pi]),
                "blv": stack([per["enc"][m]["logvar"]["b"] for m in pi]),
            },
            "dec": {
                "layers": [{
                    "w": stack([per["dec"][m]["layers"][l]["w"]
                                for m in pi]),
                    "b": stack([per["dec"][m]["layers"][l]["b"]
                                for m in pi]),
                } for l in range(n_dec - 1)],
                "out": dec_out,
            },
        }
        if self.variant == "weighted":
            packed["weights"] = per["weights"][jnp.asarray(pi)]
        return packed

    def unpack_params(self, packed: dict) -> dict:
        inv = {pm: i for i, pm in enumerate(self.perm)}
        enc, dec = [], []
        for m in range(self.modalities):
            gi = next(g for g, (_, idx) in enumerate(self.groups)
                      if m in idx)
            within = self.groups[gi][1].index(m)
            p = inv[m]
            e = packed["enc"]
            trunk = [{"w": e["layer0"][gi]["w"][within],
                      "b": e["layer0"][gi]["b"][within]}]
            trunk += [{"w": lay["w"][p], "b": lay["b"][p]}
                      for lay in e["trunk"]]
            enc.append({
                "trunk": trunk,
                "mu": {"w": e["wmu"][p], "b": e["bmu"][p]},
                "logvar": {"w": e["wlv"][p], "b": e["blv"][p]},
            })
            d = packed["dec"]
            layers = [{"w": lay["w"][p], "b": lay["b"][p]}
                      for lay in d["layers"]]
            layers.append({"w": d["out"][gi]["w"][within],
                           "b": d["out"][gi]["b"][within]})
            dec.append({"layers": layers})
        out = {"enc": enc, "dec": dec}
        if self.variant == "weighted":
            out["weights"] = packed["weights"][jnp.asarray(self.inv_perm)]
        return out

    # -- data packing -------------------------------------------------------
    def pack_inputs(self, xes: Sequence[np.ndarray]) -> Tuple[np.ndarray, ...]:
        return tuple(
            np.stack([np.asarray(xes[m], np.float32) for m in idx])
            for _, idx in self.groups)

    # -- compute ------------------------------------------------------------
    def forward(self, params, x_groups, key) -> dict:
        relu = jax.nn.relu
        e = params["enc"]
        hs = [relu(jnp.einsum("gbk,gkh->gbh", x_groups[gi], lay0["w"])
                   + lay0["b"][:, None, :])
              for gi, lay0 in enumerate(e["layer0"])]
        h = jnp.concatenate(hs, axis=0)           # [M, B, h0] grouped order
        for lay in e["trunk"]:
            h = relu(jnp.einsum("mbk,mkh->mbh", h, lay["w"])
                     + lay["b"][:, None, :])
        # merged mu/logvar heads (one [M, h1, 2Z] einsum, exact math)
        wml = jnp.concatenate([e["wmu"], e["wlv"]], axis=2)
        bml = jnp.concatenate([e["bmu"], e["blv"]], axis=1)
        stats = jnp.einsum("mbk,mkz->mbz", h, wml) + bml[:, None, :]
        z_dim = e["wmu"].shape[2]
        mus, logvars = stats[..., :z_dim], stats[..., z_dim:]
        s = self.s_dim
        mu_s = mus[:, :, :s]                      # private codes [M, B, s]
        fused_mu, fused_logvar = poe_logvar(mus[:, :, s:],
                                            logvars[:, :, s:])
        z = reparameterize(key, fused_mu, fused_logvar)

        # per-modality decoder input concat(z, mu_private_m): [M, B, Z]
        z_comb = jnp.concatenate(
            [jnp.broadcast_to(z, (self.modalities,) + z.shape), mu_s],
            axis=2)
        d = params["dec"]
        g = z_comb
        for lay in d["layers"]:
            g = relu(jnp.einsum("mbk,mkh->mbh", g, lay["w"])
                     + lay["b"][:, None, :])
        recons = []
        for gi, out in enumerate(d["out"]):
            lo, hi = int(self.bounds[gi]), int(self.bounds[gi + 1])
            recons.append(jax.nn.sigmoid(
                jnp.einsum("gbk,gkd->gbd", g[lo:hi], out["w"])
                + out["b"][:, None, :]))
        return {"recon_means": tuple(recons), "mu_c": fused_mu,
                "logvar_c": fused_logvar}

    def loss(self, params, x_groups, fwd,
             mask: Optional[jnp.ndarray] = None) -> dict:
        """Identical math to DMVAEFamily.loss: beta-weighted shared KL
        minus the per-modality -0.5*SSE terms (weighted variant scales both
        by the grouped-order-permuted learnable weights)."""
        kl_one = kl_standard_normal(fwd["mu_c"], fwd["logvar_c"], mask)
        lls = []
        for gi in range(len(self.groups)):
            sq = (x_groups[gi] - fwd["recon_means"][gi]) ** 2
            if mask is None:
                lls.append(-0.5 * jnp.mean(jnp.sum(sq, axis=2), axis=1))
            else:
                w = mask.astype(sq.dtype)
                lls.append(-0.5 * jnp.sum(jnp.sum(sq, axis=2)
                                          * w[None, :], axis=1)
                           / jnp.maximum(jnp.sum(w), 1.0))
        ll_m = jnp.concatenate(lls)               # [M] grouped order
        if self.variant == "weighted":
            wts = params["weights"]
            kl = kl_one * jnp.sum(wts)
            ll = jnp.sum(ll_m * wts)
            total = kl - ll
        else:
            kl = kl_one * self.modalities
            ll = jnp.sum(ll_m)
            total = kl * self.base.beta - ll
        return {"total": total, "kl": kl, "ll": ll}

    def pred_recon(self, params, x_groups, key):
        return self.forward(params, x_groups, key)["recon_means"]

    def reconstruction_deviation(self, x_groups, recons) -> jnp.ndarray:
        """Per-modality per-subject MSE, [M, B] in GROUPED order."""
        return jnp.concatenate([jnp.mean((xg - rg) ** 2, axis=2)
                                for xg, rg in zip(x_groups, recons)],
                               axis=0)
