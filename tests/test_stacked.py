"""StackedMultimodalCVAE ≡ MultimodalCVAE: forward, loss, gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.models.stacked import (
    StackedMultimodalCVAE,
)

DIMS = [24, 40, 16]
C = 5


@pytest.fixture
def pair():
    base = build_model("cVAE_multimodal", DIMS, [12, 12], 6, C, len(DIMS))
    stacked = StackedMultimodalCVAE(DIMS, [12, 12], 6, C, len(DIMS))
    params = base.init_params(jax.random.PRNGKey(0))
    packed = stacked.pack_params(params)
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    return base, stacked, params, packed, xes, c


@pytest.mark.parametrize("combine", ["poe", "gpoe", "moe", "mopoe"])
def test_forward_and_loss_equivalence(pair, combine):
    base, stacked, params, packed, xes, c = pair
    key = jax.random.PRNGKey(3)

    fwd_ref = base.forward(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                           combine)
    loss_ref = base.loss(params, xes, fwd_ref)

    x_packed = jnp.asarray(stacked.pack_inputs(xes))
    fwd = stacked.forward(packed, x_packed, jnp.asarray(c), key, combine)
    loss = stacked.loss(packed, x_packed, fwd)

    np.testing.assert_allclose(np.asarray(fwd["mu_multimodal"]),
                               np.asarray(fwd_ref["mu_multimodal"]),
                               rtol=1e-5, atol=1e-6)
    for m in range(len(DIMS)):
        np.testing.assert_allclose(
            np.asarray(fwd["recon_means"][m][:, : DIMS[m]]),
            np.asarray(fwd_ref["recon_means"][m]), rtol=1e-4, atol=1e-5)
    for k in ("total", "kl", "ll"):
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5)


def test_gradient_equivalence(pair):
    base, stacked, params, packed, xes, c = pair
    key = jax.random.PRNGKey(3)

    def loss_base(p):
        fwd = base.forward(p, xes, [jnp.asarray(c)] * len(DIMS), key, "gpoe")
        return base.loss(p, xes, fwd)["total"]

    def loss_stacked(p):
        x_packed = jnp.asarray(stacked.pack_inputs(xes))
        fwd = stacked.forward(p, x_packed, jnp.asarray(c), key, "gpoe")
        return stacked.loss(p, x_packed, fwd)["total"]

    g_ref = jax.grad(loss_base)(params)
    g_packed = jax.grad(loss_stacked)(packed)
    # compare through the unpack mapping
    g_unpacked = stacked.unpack_params(g_packed)
    for m in range(len(DIMS)):
        np.testing.assert_allclose(
            np.asarray(g_unpacked["enc"][m]["hidden"][0]["w"]),
            np.asarray(g_ref["enc"][m]["hidden"][0]["w"]),
            rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_unpacked["dec"][m]["mean"]["w"]),
            np.asarray(g_ref["dec"][m]["mean"]["w"]),
            rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(g_unpacked["dec"][m]["logvar_out"]),
            np.asarray(g_ref["dec"][m]["logvar_out"]),
            rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_packed["alpha"]),
                               np.asarray(g_ref["alpha"]),
                               rtol=5e-4, atol=1e-6)
    # gradients on padded weight rows must be exactly zero
    pad_rows = np.asarray(
        g_packed["enc"]["layers"][0]["w"])[0, DIMS[0]: stacked.d_max]
    np.testing.assert_array_equal(pad_rows, 0.0)


def test_pack_roundtrip(pair):
    base, stacked, params, packed, xes, c = pair
    restored = stacked.unpack_params(packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_deviation_equivalence(pair):
    base, stacked, params, packed, xes, c = pair
    key = jax.random.PRNGKey(11)
    ref = base.pred_recon(params, xes, [jnp.asarray(c)] * len(DIMS), key,
                          "poe")
    x_packed = jnp.asarray(stacked.pack_inputs(xes))
    recon = stacked.pred_recon(packed, x_packed, jnp.asarray(c), key, "poe")
    devs = stacked.reconstruction_deviation(x_packed, recon)
    for m in range(len(DIMS)):
        ref_dev = np.asarray(base.reconstruction_deviation(xes[m], ref[m]))
        np.testing.assert_allclose(np.asarray(devs[m]), ref_dev,
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("hidden", [[14], [20, 12, 8]],
                         ids=["1hidden", "3hidden"])
def test_equivalence_any_depth(hidden):
    """Forward/loss/gradient parity at the sweep grid's other depths
    (commands_list11_adhd.sh:18: '20 10' and '1024 512 256 32' families)."""
    base = build_model("cVAE_multimodal", DIMS, hidden, 6, C, len(DIMS))
    stacked = StackedMultimodalCVAE(DIMS, hidden, 6, C, len(DIMS))
    params = base.init_params(jax.random.PRNGKey(0))
    packed = stacked.pack_params(params)
    rng = np.random.default_rng(4)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in DIMS]
    c = rng.normal(size=(9, C)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    def loss_base(p):
        fwd = base.forward(p, xes, [jnp.asarray(c)] * len(DIMS), key, "gpoe")
        return base.loss(p, xes, fwd)["total"]

    def loss_stacked(p):
        x_packed = jnp.asarray(stacked.pack_inputs(xes))
        fwd = stacked.forward(p, x_packed, jnp.asarray(c), key, "gpoe")
        return stacked.loss(p, x_packed, fwd)["total"]

    t_ref, g_ref = jax.value_and_grad(loss_base)(params)
    t_pk, g_packed = jax.value_and_grad(loss_stacked)(packed)
    np.testing.assert_allclose(float(t_pk), float(t_ref), rtol=2e-5)
    g_unpacked = stacked.unpack_params(g_packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5),
        g_unpacked, g_ref)
    # pack/unpack roundtrip at this depth
    restored = stacked.unpack_params(packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)
