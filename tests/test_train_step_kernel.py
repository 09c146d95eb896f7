"""Fused train-step kernel: hand-derived backward vs jax.grad (all fusions,
1/2/3 hidden layers — the reference ADHD sweep grid spans all three,
commands_list11_adhd.sh:18)."""
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


def _make_problem(hidden, dims=DIMS, seed=0):
    model = StackedMultimodalCVAE(dims, hidden, Z, C, len(dims))
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(seed)
    xes = [rng.normal(size=(B, d)).astype(np.float32) for d in dims]
    xp = jnp.asarray(model.pack_inputs(xes))
    c = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(B, Z)).astype(np.float32))
    rowmask = jnp.asarray(np.r_[np.ones(B - 2), np.zeros(2)].astype(np.float32))
    return model, params, xp, c, eps, rowmask


def _reference_loss(model, xp, c, eps, rowmask, combine):
    """Stacked-model forward with externally supplied reparam noise."""

    def loss_ref(p):
        act = leaky_relu
        m_cnt = model.modalities
        e = p["enc"]
        h = jnp.concatenate(
            [xp, jnp.broadcast_to(c, (m_cnt,) + c.shape)], axis=2)
        for lay in e["layers"]:
            h = act(jnp.einsum("mbk,mkh->mbh", h, lay["w"])
                    + lay["b"][:, None])
        mus = jnp.einsum("mbk,mkz->mbz", h, e["wmu"]) + e["bmu"][:, None]
        lvs = jnp.einsum("mbk,mkz->mbz", h, e["wlv"]) + e["blv"][:, None]
        fm, fv = fusion.combine_latent(mus, jnp.exp(lvs), combine,
                                       p["alpha"], True)
        lgv = jnp.log(fv)
        z = fm + eps * jnp.exp(0.5 * lgv)
        d = p["dec"]
        zc = jnp.concatenate([z, c], axis=1)
        g = act(jnp.einsum("bk,mkh->mbh", zc, d["layers"][0]["w"])
                + d["layers"][0]["b"][:, None])
        for lay in d["layers"][1:]:
            g = act(jnp.einsum("mbk,mkh->mbh", g, lay["w"])
                    + lay["b"][:, None])
        means = jnp.einsum("mbk,mkd->mbd", g, d["wm"]) + d["bm"][:, None]
        fwd = {"recon_means": means, "mu_multimodal": fm,
               "logvar_multimodal": lgv}
        return model.loss(p, xp, fwd, rowmask)["total"]

    return loss_ref


def _assert_grads_close(grads, ref_grads):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5),
        grads, ref_grads,
    )


@pytest.mark.parametrize("combine", ["gpoe", "poe", "moe", "mopoe"])
def test_fused_grads_match_autodiff(combine):
    model, params, xp, c, eps, rowmask = _make_problem([12, 12])
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, combine)
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)

    step = FusedTrainStep(model, combine, interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)

    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    _assert_grads_close(grads, ref_grads)


@pytest.mark.parametrize("hidden", [[14], [12, 12], [20, 12, 8]],
                         ids=["1hidden", "2hidden", "3hidden"])
def test_fused_grads_match_autodiff_any_depth(hidden):
    """Covers the reference sweep's '20 10' / '110 110 10' /
    '1024 512 256 32' shape families (commands_list11_adhd.sh:18)."""
    model, params, xp, c, eps, rowmask = _make_problem(hidden, seed=2)
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)
    step = FusedTrainStep(model, "gpoe", interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)
    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    _assert_grads_close(grads, ref_grads)


def test_single_modality_shortcut_path():
    model, params, xp, c, eps, rowmask = _make_problem([12, 12], dims=[30],
                                                       seed=1)
    loss_ref = _reference_loss(model, xp, c, eps, rowmask, "gpoe")
    ref_total, ref_grads = jax.value_and_grad(loss_ref)(params)
    step = FusedTrainStep(model, "gpoe", interpret=True)
    losses, grads = step.loss_and_grads(params, xp, c, eps, rowmask)
    np.testing.assert_allclose(float(losses["total"]), float(ref_total),
                               rtol=1e-5)
    _assert_grads_close(grads, ref_grads)


def test_vmem_feasibility_estimate():
    """Flagship shapes fit a v5e-class budget (and even a v4-class one at
    reduced batch); PPMI width fits only the large-VMEM budget."""
    from multi_modal_normative_modeling_tpu.kernels.train_step import (
        VMEM_BUDGET_LARGE,
        VMEM_BUDGET_SMALL,
    )

    flagship = StackedMultimodalCVAE([90, 90, 90, 270], [110, 110], 10, 29, 4)
    step = FusedTrainStep(flagship, "gpoe", interpret=True)
    assert step.fits_vmem(256, VMEM_BUDGET_LARGE)
    assert step.fits_vmem(64, VMEM_BUDGET_SMALL)
    ppmi = StackedMultimodalCVAE([3485, 3485, 3485], [110, 110], 10, 29, 3)
    pstep = FusedTrainStep(ppmi, "gpoe", interpret=True)
    # batch 256 exceeds even the v5e-calibrated budget (Mosaic fails there,
    # measured); batch 128 compiles and runs on v5e
    assert not pstep.fits_vmem(256, VMEM_BUDGET_SMALL)
    assert not pstep.fits_vmem(256, VMEM_BUDGET_LARGE)
    assert pstep.fits_vmem(128, VMEM_BUDGET_LARGE)
