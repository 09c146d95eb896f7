"""Fused train-step kernel: hand-derived backward vs jax.grad (all fusions)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.kernels.train_step import FusedTrainStep
from multi_modal_normative_modeling_tpu.models.stacked import (
    StackedMultimodalCVAE,
)
from multi_modal_normative_modeling_tpu.ops import fusion
from multi_modal_normative_modeling_tpu.ops.linear import leaky_relu

DIMS = [24, 40, 16]
C, Z, B = 5, 6, 9


@pytest.fixture(scope="module")
def problem():
    model = StackedMultimodalCVAE(DIMS, [12, 12], Z, C, len(DIMS))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(B, d)).astype(np.float32) for d in DIMS]
    xp = jnp.asarray(model.pack_inputs(xes))
    c = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(B, Z)).astype(np.float32))
    rowmask = jnp.asarray(np.r_[np.ones(7), np.zeros(2)].astype(np.float32))
    return model, params, xp, c, eps, rowmask


def _reference_loss(model, xp, c, eps, rowmask, combine):
    """Stacked-model forward with externally supplied reparam noise."""

    def loss_ref(p):
        act = leaky_relu
        m_cnt = model.modalities
        e = p["enc"]
        xcat = jnp.concatenate(
            [xp, jnp.broadcast_to(c, (m_cnt,) + c.shape)], axis=2)
        h = act(jnp.einsum("mbk,mkh->mbh", xcat, e["w1"]) + e["b1"][:, None])
        h = act(jnp.einsum("mbk,mkh->mbh", h, e["w2"]) + e["b2"][:, None])
        mus = jnp.einsum("mbk,mkz->mbz", h, e["wmu"]) + e["bmu"][:, None]
        lvs = jnp.einsum("mbk,mkz->mbz", h, e["wlv"]) + e["blv"][:, None]
        fm, fv = fusion.combine_latent(mus, jnp.exp(lvs), combine,
                                       p["alpha"], True)
        lgv = jnp.log(fv)
        z = fm + eps * jnp.exp(0.5 * lgv)
        d = p["dec"]
        zc = jnp.concatenate([z, c], axis=1)
        g = act(jnp.einsum("bk,mkh->mbh", zc, d["w1"]) + d["b1"][:, None])
        g = act(jnp.einsum("mbk,mkh->mbh", g, d["w2"]) + d["b2"][:, None])
        means = jnp.einsum("mbk,mkd->mbd", g, d["wm"]) + d["bm"][:, None]
        fwd = {"recon_means": means, "mu_multimodal": fm,
               "logvar_multimodal": lgv}
        return model.loss(p, xp, fwd, rowmask)["total"]

    return loss_ref


@pytest.mark.parametrize("combine", ["gpoe", "poe", "moe", "mopoe"])
def test_fused_grads_match_autodiff(problem, combine):
    model, params, xp, c, eps, rowmask = problem
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, combine)
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)

    step = FusedTrainStep(model, combine, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)

    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        grads, ref_grads,
    )


def test_single_modality_shortcut_path():
    model = StackedMultimodalCVAE([30], [12, 12], Z, C, 1)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    xp = jnp.asarray(model.pack_inputs(
        [rng.normal(size=(B, 30)).astype(np.float32)]))
    c = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(B, Z)).astype(np.float32))
    rowmask = jnp.ones((B,), jnp.float32)

    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)
    step = FusedTrainStep(model, "gpoe", interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)
    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        grads, ref_grads,
    )
