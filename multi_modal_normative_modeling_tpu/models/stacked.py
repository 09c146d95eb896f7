"""Stacked-modality cVAE: all modalities in one batched matmul per layer.

The per-modality model (models/multimodal.py) launches ~6 matmuls per
modality per step; at these tensor sizes the TPU step is *launch-bound*, not
FLOP-bound (measured ~77us/step with <20% MXU utilization). This variant
packs the M modalities into a leading axis — inputs zero-padded to the widest
modality, parameters stacked [M, ...] — so each layer is ONE
``einsum('mbk,mkh->mbh')`` batched matmul regardless of M. Padded input
columns carry zero weights and zero data, so the math is exactly the
per-modality model's (verified in tests/test_stacked.py down to gradients);
padding rows receive zero gradients and stay zero under Adam.

Supports ANY hidden depth (the reference's ADHD sweep spans 1-3 hidden
layers, commands_list11_adhd.sh:18 — "20 10" through "1024 512 256 32"):
encoder layers run (D+C) -> h0 -> ... -> h_{L-1}, decoder layers run
(Z+C) -> h_{L-1} -> ... -> h0 -> D, matching models/cvae.py.

This is the SURVEY §2.6 "modalities stay in-kernel" design: fold-parallelism
via vmap on top gives [F, M, B, D] operands — large, uniform batched matmuls
that XLA maps straight onto the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops import fusion
from ..ops.linear import leaky_relu
from ..ops.losses import _HALF_LOG_2PI, kl_standard_normal
from .cvae import reparameterize
from .multimodal import MultimodalCVAE


# registry-name -> packed-variant mapping for the cvae-skeleton zoo (the
# models whose encoder/decoder MLPs are identical and thus share THESE
# layouts; the DMVAE family splits private/shared latents and packs on its
# own split-latent grouped layout instead — models/grouped_dmvae.py)
SKELETON_VARIANTS = {
    "cVAE_multimodal": "cvae",
    "mmJSD": "mmjsd",
    "mvtCAE": "mvtcae",
}


def _pad_axis0(a: jnp.ndarray, size: int) -> jnp.ndarray:
    return jnp.pad(a, [(0, size - a.shape[0])] + [(0, 0)] * (a.ndim - 1))


def skeleton_fuse(variant: str, params, mus, logvars, combine: str):
    """Variant-exact fusion on stacked [M, B, Z] stats — mirrors
    MultimodalCVAE.fuse branch-for-branch (incl. the mvtcae
    ProductOfExperts2 quirk and var clamp). All fusion ops reduce the
    modality axis with permutation-invariant sums, so the padded
    (original-order) and width-grouped (grouped-order) layouts share this
    one owner. Returns (fused_mu, fused_logvar)."""
    combine = combine.lower()
    if variant == "mmjsd":
        fused_mu, fused_var = fusion.product_of_experts(mus,
                                                        jnp.exp(logvars))
        return fused_mu, jnp.log(fused_var)
    variances = jnp.exp(logvars)
    if variant == "mvtcae":
        if combine == "poe":
            fused_mu, fused_var = fusion.poe_logvar(mus, variances)
        else:
            fused_mu, fused_var = fusion.combine_latent(
                mus, variances, combine, params["alpha"],
                single_modality_shortcut=False)
        fused_var = jnp.maximum(fused_var, 1e-6)
        return fused_mu, jnp.log(fused_var)
    fused_mu, fused_var = fusion.combine_latent(
        mus, variances, combine, params["alpha"],
        single_modality_shortcut=(variant != "nmmlp"))
    return fused_mu, jnp.log(fused_var)


def skeleton_total(variant: str, m_count: int, kl, ll, mu, logvar, mus,
                   logvars, mask, jsd_on_fused: bool,
                   mvtcae_beta: float) -> dict:
    """Variant loss composition shared by the packed layouts: ``ll`` is the
    per-modality ll vector [M]; ``mu``/``logvar`` the fused stats;
    ``mus``/``logvars`` the per-modality stats [M, B, Z] in ORIGINAL
    modality order — the mmJSD pairwise KL runs over ordered pairs i<j
    (ops/losses.py:83-85), so stat order is part of the numerics and the
    grouped layout un-permutes before calling."""
    out = {"kl": m_count * kl, "ll": jnp.sum(ll)}
    if variant == "mmjsd":
        from ..ops.losses import pairwise_jsd

        if jsd_on_fused:
            stats = [mu] * m_count
            lvs = [logvar] * m_count
        else:
            stats = [mus[m] for m in range(m_count)]
            lvs = [logvars[m] for m in range(m_count)]
        jsd = pairwise_jsd(stats, lvs, mask)
        out["jsd"] = jsd
        out["total"] = m_count * (kl + jsd) - jnp.sum(ll)
    elif variant == "mvtcae":
        from .multimodal import total_correlation

        tc = total_correlation(mus, mask)
        out["tc"] = tc * m_count
        out["total"] = (m_count * kl + 0.00001 * jnp.sum(ll)
                        + m_count * mvtcae_beta * tc)
    else:
        out["total"] = m_count * kl - jnp.sum(ll)
    return out


class StackedMultimodalCVAE:
    """Numerically-equivalent packed form of the MultimodalCVAE skeleton.

    ``variant`` extends the packed layout to the whole cvae-skeleton zoo
    (round 4): 'mmjsd' and 'mvtcae' share the exact encoder/decoder MLPs
    and differ only in the fuse step and loss regularizers
    (models/multimodal.py fuse/loss, reference cVAE.py:1354/:1754), so the
    packed einsums are identical — only ``_fuse``/``loss`` branch.
    'nmmlp' (no single-modality shortcut, -MSE ll) rides too."""

    def __init__(self, input_dim_list: Sequence[int], hidden_dim: Sequence[int],
                 latent_dim: int, c_dim: int, modalities: int,
                 non_linear: bool = True, dtype=jnp.float32,
                 variant: str = "cvae", jsd_on_fused: bool = True):
        assert len(hidden_dim) >= 1, "at least one hidden layer"
        assert variant in ("cvae", "mmjsd", "mvtcae", "nmmlp")
        self.variant = variant
        self.base = MultimodalCVAE(input_dim_list, hidden_dim, latent_dim,
                                   c_dim, modalities, non_linear,
                                   variant=variant, dtype=dtype,
                                   jsd_on_fused=jsd_on_fused)
        self.input_dim_list = list(input_dim_list)
        self.d_max = max(input_dim_list)
        self.hidden_dim = list(hidden_dim)
        self.n_hidden = len(hidden_dim)
        self.latent_dim = latent_dim
        self.c_dim = c_dim
        self.modalities = modalities
        self.non_linear = non_linear
        self.dtype = dtype

    # -- parameter packing ----------------------------------------------------
    def init_params(self, key) -> dict:
        """Init identically to MultimodalCVAE then pack (same distributions)."""
        return self.pack_params(self.base.init_params(key))

    def pack_params(self, per_modality: dict) -> dict:
        """Per-modality pytree -> stacked [M, ...] arrays with zero padding
        on the (modality-specific) input/output feature dims.

        Layout: enc["layers"] / dec["layers"] are lists of {"w","b"} stacked
        over modalities; enc layer 0's W rows are [x-block padded to d_max |
        covariates] so packed inputs stay aligned across modalities."""
        dm, L = self.d_max, self.n_hidden
        enc_layers = [{"w": [], "b": []} for _ in range(L)]
        dec_layers = [{"w": [], "b": []} for _ in range(L)]
        enc_wmu, enc_bmu, enc_wlv, enc_blv = [], [], [], []
        dec_wm, dec_bm, dec_lvo = [], [], []
        for m in range(self.modalities):
            e = per_modality["enc"][m]
            d_m = self.input_dim_list[m]
            for l in range(L):
                w = e["hidden"][l]["w"]
                if l == 0:
                    # W rows are [x-features (D_m), covariates (c)]; pad the
                    # x-block to d_max so the covariate rows stay aligned with
                    # the packed input's trailing c columns
                    w = jnp.concatenate(
                        [_pad_axis0(w[:d_m], dm), w[d_m:]], axis=0)
                enc_layers[l]["w"].append(w)
                enc_layers[l]["b"].append(e["hidden"][l]["b"])
            enc_wmu.append(e["mu"]["w"])
            enc_bmu.append(e["mu"]["b"])
            enc_wlv.append(e["logvar"]["w"])
            enc_blv.append(e["logvar"]["b"])
            d = per_modality["dec"][m]
            for l in range(L):
                dec_layers[l]["w"].append(d["hidden"][l]["w"])
                dec_layers[l]["b"].append(d["hidden"][l]["b"])
            dec_wm.append(jnp.pad(d["mean"]["w"],
                                  ((0, 0), (0, dm - d["mean"]["w"].shape[1]))))
            dec_bm.append(jnp.pad(d["mean"]["b"],
                                  (0, dm - d["mean"]["b"].shape[0])))
            dec_lvo.append(jnp.pad(d["logvar_out"][0],
                                   (0, dm - d["logvar_out"].shape[1])))
        stack = lambda xs: jnp.stack(xs)
        return {
            "enc": {
                "layers": [{"w": stack(lay["w"]), "b": stack(lay["b"])}
                           for lay in enc_layers],
                "wmu": stack(enc_wmu), "bmu": stack(enc_bmu),
                "wlv": stack(enc_wlv), "blv": stack(enc_blv),
            },
            "dec": {
                "layers": [{"w": stack(lay["w"]), "b": stack(lay["b"])}
                           for lay in dec_layers],
                "wm": stack(dec_wm), "bm": stack(dec_bm),
                "lvo": stack(dec_lvo),
            },
            "alpha": per_modality["alpha"],
        }

    def unpack_params(self, packed: dict) -> dict:
        """Stacked arrays -> the per-modality pytree (for checkpoints /
        interchange with MultimodalCVAE)."""
        out = {"enc": [], "dec": [], "alpha": packed["alpha"]}
        for m in range(self.modalities):
            d = self.input_dim_list[m]
            e = packed["enc"]
            hidden = []
            for l, lay in enumerate(e["layers"]):
                w = lay["w"][m]
                if l == 0:
                    w = jnp.concatenate([w[:d], w[self.d_max:]], axis=0)
                hidden.append({"w": w, "b": lay["b"][m]})
            out["enc"].append({
                "hidden": hidden,
                "mu": {"w": e["wmu"][m], "b": e["bmu"][m]},
                "logvar": {"w": e["wlv"][m], "b": e["blv"][m]},
            })
            dd = packed["dec"]
            out["dec"].append({
                "hidden": [{"w": lay["w"][m], "b": lay["b"][m]}
                           for lay in dd["layers"]],
                "mean": {"w": dd["wm"][m][:, :d], "b": dd["bm"][m][:d]},
                "logvar_out": dd["lvo"][m][None, :d],
            })
        return out

    # -- data packing -----------------------------------------------------------
    def pack_inputs(self, xes: Sequence[np.ndarray]) -> np.ndarray:
        """list of [B, D_m] -> [M, B, d_max] zero-padded."""
        b = xes[0].shape[0]
        out = np.zeros((self.modalities, b, self.d_max), dtype=np.float32)
        for m, x in enumerate(xes):
            out[m, :, : x.shape[1]] = x
        return out

    def col_mask_np(self) -> np.ndarray:
        """[M, d_max] 1.0 over each modality's true features (host array —
        keep it numpy until a jit boundary; an eager jnp conversion costs a
        remote round trip through the TPU tunnel)."""
        mask = np.zeros((self.modalities, self.d_max), dtype=np.float32)
        for m, d in enumerate(self.input_dim_list):
            mask[m, :d] = 1.0
        return mask

    def col_mask(self) -> jnp.ndarray:
        return jnp.asarray(self.col_mask_np())

    # -- compute ------------------------------------------------------------------
    def _fuse(self, params, mus, logvars, combine: str):
        return skeleton_fuse(self.variant, params, mus, logvars, combine)

    def forward(self, params, x_packed: jnp.ndarray, c: jnp.ndarray, key,
                combine: str) -> dict:
        """x_packed: [M, B, d_max]; c: [B, c_dim] (shared covariates)."""
        act = leaky_relu if self.non_linear else (lambda a: a)
        m, b, _ = x_packed.shape
        e = params["enc"]
        h = jnp.concatenate(
            [x_packed, jnp.broadcast_to(c, (m,) + c.shape)], axis=2
        )
        for lay in e["layers"]:
            h = act(jnp.einsum("mbk,mkh->mbh", h, lay["w"])
                    + lay["b"][:, None, :])
        # merged mu/logvar heads (trainer.fused_heads_loss_fn's trick, exact
        # math): one [M, H, 2Z] einsum instead of two serialized [M, H, Z]
        # ones — each output element is the same dot product, the chain
        # just loses a link per direction
        wml = jnp.concatenate([e["wmu"], e["wlv"]], axis=2)
        bml = jnp.concatenate([e["bmu"], e["blv"]], axis=1)
        stats = jnp.einsum("mbk,mkz->mbz", h, wml) + bml[:, None, :]
        z_dim = e["wmu"].shape[2]
        mus, logvars = stats[..., :z_dim], stats[..., z_dim:]

        fused_mu, fused_logvar = self._fuse(params, mus, logvars, combine)
        z = reparameterize(key, fused_mu, fused_logvar)

        d = params["dec"]
        zc = jnp.concatenate([z, c], axis=1)  # [B, Z+C]
        g = act(jnp.einsum("bk,mkh->mbh", zc, d["layers"][0]["w"])
                + d["layers"][0]["b"][:, None, :])
        for lay in d["layers"][1:]:
            g = act(jnp.einsum("mbk,mkh->mbh", g, lay["w"])
                    + lay["b"][:, None, :])
        means = jnp.einsum("mbk,mkd->mbd", g, d["wm"]) + d["bm"][:, None, :]
        return {
            "recon_means": means,                 # [M, B, d_max]
            "mu_multimodal": fused_mu,
            "logvar_multimodal": fused_logvar,
            "mus": mus,
            "logvars": logvars,
            "z": z,
        }

    def loss(self, params, x_packed, fwd,
             mask: Optional[jnp.ndarray] = None) -> dict:
        """Identical math to MultimodalCVAE(variant).loss on the packed
        layout: per-modality ll (Gaussian NLL, or -MSE for nmmlp) with the
        fused KL and the variant regularizers (mmJSD pairwise-KL, mvtCAE
        TC), feature-masked so padded columns contribute nothing."""
        m_count = self.modalities
        col = self.col_mask()[:, None, :]                      # [M, 1, d_max]
        mu, logvar = fwd["mu_multimodal"], fwd["logvar_multimodal"]

        if self.variant == "nmmlp":
            # nm-MLP ll = -MSE over each modality's true elements
            sq = ((x_packed - fwd["recon_means"]) ** 2) * col  # [M, B, dm]
            dims = jnp.asarray(self.input_dim_list, sq.dtype)
            if mask is None:
                ll = -jnp.sum(sq, axis=(1, 2)) / (sq.shape[1] * dims)
            else:
                w = mask.astype(sq.dtype)
                ll = (-jnp.sum(sq * w[None, :, None], axis=(1, 2))
                      / (jnp.maximum(jnp.sum(w), 1.0) * dims))
        else:
            lvo = params["dec"]["lvo"][:, None, :]             # [M, 1, d_max]
            ll_elem = (-0.5 * (x_packed - fwd["recon_means"]) ** 2
                       * jnp.exp(-lvo) - 0.5 * lvo - _HALF_LOG_2PI) * col
            ll_rows = jnp.sum(ll_elem, axis=2)                 # [M, B]
            if mask is None:
                ll = jnp.mean(ll_rows, axis=1)                 # [M]
            else:
                w = mask.astype(ll_rows.dtype)
                ll = (jnp.sum(ll_rows * w[None, :], axis=1)
                      / jnp.maximum(jnp.sum(w), 1.0))
        kl = kl_standard_normal(mu, logvar, mask)
        # .get: kernel-path reference losses build a minimal fwd without
        # the per-modality stats; only the mmjsd opt-out / mvtcae branches
        # of skeleton_total consume them
        return skeleton_total(self.variant, m_count, kl, ll, mu, logvar,
                              fwd.get("mus"), fwd.get("logvars"), mask,
                              self.base.jsd_on_fused, self.base.mvtcae_beta)

    def pred_recon(self, params, x_packed, c, key, combine: str):
        return self.forward(params, x_packed, c, key, combine)["recon_means"]

    def reconstruction_deviation(self, x_packed, recon) -> jnp.ndarray:
        """Per-modality per-subject MSE over the modality's true features,
        as ONE [M, B] array (the packed counterpart of MultimodalCVAE's
        per-modality list)."""
        col = self.col_mask()[:, None, :]
        sq = ((x_packed - recon) ** 2) * col
        dims = jnp.asarray(self.input_dim_list, sq.dtype)
        return jnp.sum(sq, axis=2) / dims[:, None]
