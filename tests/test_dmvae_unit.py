"""Direct unit tests for the split-latent DMVAE family (dmvae / weighted /
mmvaeplus) — shapes, private/shared split semantics, the empty-shared
degenerate mode (reference quirk, cVAE.py:1525-1551), and the weighted
variant's learnable loss weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models.dmvae import DMVAEFamily


def _make(variant, latent_dim=12, c_dim=4):
    return DMVAEFamily(input_dim_list=[20, 30], hidden_dim=[16, 8],
                       latent_dim=latent_dim, c_dim=c_dim, modalities=2,
                       variant=variant)


@pytest.mark.parametrize("variant", ["dmvae", "weighted", "mmvaeplus"])
def test_forward_shapes_and_loss(variant):
    model = _make(variant)
    key = jax.random.PRNGKey(0)
    params = model.init_params(key)
    xes = [jax.random.uniform(jax.random.PRNGKey(i + 1), (7, d))
           for i, d in enumerate([20, 30])]
    fwd = model.forward(params, xes, None, key)
    assert [r.shape for r in fwd["recon_means"]] == [(7, 20), (7, 30)]
    # shared code spans latent_dim - c_dim dims
    assert fwd["mu_c"].shape == (7, 12 - 4)
    losses = model.loss(params, xes, fwd)
    assert np.isfinite(float(losses["total"]))
    # sigmoid output decoder
    for r in fwd["recon_means"]:
        assert (np.asarray(r) >= 0).all() and (np.asarray(r) <= 1).all()


def test_private_shared_split():
    model = _make("dmvae")
    params = model.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 20))
    mu_s, logvar_s, mu_c, logvar_c = model.encode(params, x, 0)
    assert mu_s.shape == (5, 4) and mu_c.shape == (5, 8)
    assert logvar_s.shape == (5, 4) and logvar_c.shape == (5, 8)


def test_empty_shared_degenerate_mode_warns_and_runs():
    """latent_dim <= c_dim: the reference silently trains with a zero-width
    shared code (cVAE.py:1525-1526); we reproduce that but warn."""
    with pytest.warns(UserWarning, match="shared code is empty"):
        model = _make("dmvae", latent_dim=4, c_dim=4)
    params = model.init_params(jax.random.PRNGKey(0))
    xes = [jax.random.uniform(jax.random.PRNGKey(i + 1), (6, d))
           for i, d in enumerate([20, 30])]
    fwd = model.forward(params, xes, None, jax.random.PRNGKey(9))
    assert fwd["mu_c"].shape == (6, 0)          # zero-width shared code
    losses = model.loss(params, xes, fwd)
    assert float(losses["kl"]) == 0.0           # KL over nothing is a no-op
    assert np.isfinite(float(losses["total"]))


def test_weighted_variant_scales_loss_terms():
    model = _make("weighted")
    params = model.init_params(jax.random.PRNGKey(0))
    assert params["weights"].shape == (2,)
    assert (np.asarray(params["weights"]) >= 0).all()  # |N(0,1)| init
    xes = [jax.random.uniform(jax.random.PRNGKey(i + 1), (6, d))
           for i, d in enumerate([20, 30])]
    key = jax.random.PRNGKey(3)
    fwd = model.forward(params, xes, None, key)
    base = model.loss(params, xes, fwd)
    doubled = dict(params, weights=params["weights"] * 2.0)
    fwd2 = model.forward(doubled, xes, None, key)  # weights don't affect fwd
    scaled = model.loss(doubled, xes, fwd2)
    np.testing.assert_allclose(float(scaled["total"]),
                               2.0 * float(base["total"]), rtol=1e-6)


def test_masked_rows_do_not_affect_loss():
    model = _make("dmvae")
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    xes = [jax.random.uniform(jax.random.PRNGKey(i + 1), (6, d))
           for i, d in enumerate([20, 30])]
    fwd = model.forward(params, xes, None, key)
    mask = jnp.array([1.0, 1.0, 1.0, 1.0, 0.0, 0.0])
    masked = model.loss(params, xes, fwd, mask)
    # recompute on only the valid rows; losses must match
    xes4 = [x[:4] for x in xes]
    fwd4 = {"recon_means": [r[:4] for r in fwd["recon_means"]],
            "mu_c": fwd["mu_c"][:4], "logvar_c": fwd["logvar_c"][:4]}
    direct = model.loss(params, xes4, fwd4)
    np.testing.assert_allclose(float(masked["total"]),
                               float(direct["total"]), rtol=1e-5)
