"""Unit tests for fusion ops and losses against independently-implemented
reference formulas (torch, CPU) and hand-computed values."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from multi_modal_normative_modeling_tpu.ops import fusion, losses


@pytest.fixture
def stats():
    rng = np.random.default_rng(0)
    mus = rng.normal(size=(3, 5, 4)).astype(np.float32)
    logvars = rng.normal(size=(3, 5, 4)).astype(np.float32) * 0.3
    return mus, logvars


def test_poe_matches_reference_formula(stats):
    mus, logvars = stats
    variances = np.exp(logvars)
    mu, var = fusion.product_of_experts(jnp.asarray(mus),
                                        jnp.asarray(variances))
    # reference math (cVAE.py:993-998): precision-weighted mean, with the
    # returned "logvar" actually being the variance that callers then log
    t = 1.0 / torch.tensor(variances)
    pd_mu = torch.sum(torch.tensor(mus) * t, dim=0) / torch.sum(t, dim=0)
    pd_var = 1.0 / torch.sum(t, dim=0)
    np.testing.assert_allclose(np.asarray(mu), pd_mu.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), pd_var.numpy(), rtol=1e-6)


def test_gpoe_matches_reference_formula(stats):
    mus, logvars = stats
    variances = np.exp(logvars)
    alpha = np.asarray([0.2, -1.0, 0.5], dtype=np.float32)
    mu, var = fusion.gpoe(jnp.asarray(mus), jnp.asarray(variances),
                          jnp.asarray(alpha))
    # cVAE.py:1154-1157
    a = torch.softmax(torch.tensor(alpha), dim=0).reshape(3, 1, 1)
    tv = torch.tensor(variances)
    tm = torch.tensor(mus)
    ref_mu = torch.sum(tm * a / tv, dim=0) / torch.sum(a / tv, dim=0)
    ref_var = 1 / torch.sum(a / tv, dim=0)
    np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), ref_var.numpy(), rtol=1e-5)


def test_moe_is_arithmetic_mean(stats):
    mus, logvars = stats
    variances = np.exp(logvars)
    mu, var = fusion.mixture_of_experts(jnp.asarray(mus),
                                        jnp.asarray(variances))
    np.testing.assert_allclose(np.asarray(mu), mus.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), variances.mean(axis=0),
                               rtol=1e-6)


def test_mopoe_appends_poe_expert(stats):
    mus, logvars = stats
    variances = np.exp(logvars)
    mu, var = fusion.mixture_of_product_of_experts(jnp.asarray(mus),
                                                   jnp.asarray(variances))
    poe_mu, poe_var = fusion.product_of_experts(jnp.asarray(mus),
                                                jnp.asarray(variances))
    expected_mu = (mus.sum(axis=0) + np.asarray(poe_mu)) / 4
    expected_var = (variances.sum(axis=0) + np.asarray(poe_var)) / 4
    np.testing.assert_allclose(np.asarray(mu), expected_mu, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), expected_var, rtol=1e-5)


def test_poe_logvar_matches_products_of_experts2(stats):
    mus, logvars = stats
    mu, lv = fusion.poe_logvar(jnp.asarray(mus), jnp.asarray(logvars))
    # cVAE.py:1482-1489
    var = torch.exp(torch.tensor(logvars))
    var_inv = 1.0 / var
    ref_mu = torch.sum(torch.tensor(mus) * var_inv, dim=0) / torch.sum(var_inv, dim=0)
    ref_lv = torch.log(1.0 / torch.sum(var_inv, dim=0))
    np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lv), ref_lv.numpy(), rtol=1e-5)


def test_single_modality_shortcut(stats):
    mus, logvars = stats
    variances = np.exp(logvars)
    mu, var = fusion.combine_latent(jnp.asarray(mus[:1]),
                                    jnp.asarray(variances[:1]), "gpoe")
    np.testing.assert_allclose(np.asarray(mu), mus[0])
    np.testing.assert_allclose(np.asarray(var), variances[0])


def test_kl_matches_torch():
    rng = np.random.default_rng(1)
    mu = rng.normal(size=(6, 4)).astype(np.float32)
    logvar = rng.normal(size=(6, 4)).astype(np.float32) * 0.2
    ours = losses.kl_standard_normal(jnp.asarray(mu), jnp.asarray(logvar))
    tm, tl = torch.tensor(mu), torch.tensor(logvar)
    ref = -0.5 * torch.sum(1 + tl - tm.pow(2) - tl.exp(), dim=1).mean(0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_gaussian_ll_matches_torch_normal():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 5)).astype(np.float32)
    mean = rng.normal(size=(6, 5)).astype(np.float32)
    logvar_out = np.full((1, 5), -3.0, dtype=np.float32)
    ours = losses.gaussian_ll(jnp.asarray(x), jnp.asarray(mean),
                              jnp.asarray(logvar_out))
    dist = torch.distributions.Normal(
        torch.tensor(mean), torch.tensor(logvar_out).exp().pow(0.5))
    ref = dist.log_prob(torch.tensor(x)).sum(dim=1).mean(0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_masked_losses_equal_unpadded():
    """Padding + masking must reproduce exact unpadded batch means."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(5, 7)).astype(np.float32)
    mean = rng.normal(size=(5, 7)).astype(np.float32)
    lv = np.full((1, 7), -3.0, dtype=np.float32)
    pad = lambda a: np.pad(a, ((0, 3), (0, 0)))
    mask = np.array([1, 1, 1, 1, 1, 0, 0, 0], dtype=np.float32)

    for fn, args, pargs in [
        (losses.gaussian_ll, (x, mean, lv), (pad(x), pad(mean), lv)),
        (losses.kl_standard_normal, (x, mean), (pad(x), pad(mean))),
        (losses.neg_half_sse, (x, mean), (pad(x), pad(mean))),
        (losses.neg_mse, (x, mean), (pad(x), pad(mean))),
    ]:
        ref = float(fn(*(jnp.asarray(a) for a in args)))
        got = float(fn(*(jnp.asarray(a) for a in pargs),
                       mask=jnp.asarray(mask)))
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_pairwise_jsd_matches_torch_kl():
    rng = np.random.default_rng(4)
    mus = [jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
           for _ in range(3)]
    lvs = [jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32) * 0.2)
           for _ in range(3)]
    ours = float(losses.pairwise_jsd(mus, lvs))
    total = 0.0
    n = 3
    for i in range(n):
        for j in range(i + 1, n):
            p = torch.distributions.Normal(
                torch.tensor(np.asarray(mus[i])),
                torch.tensor(np.asarray(jnp.exp(0.5 * lvs[i]))))
            q = torch.distributions.Normal(
                torch.tensor(np.asarray(mus[j])),
                torch.tensor(np.asarray(jnp.exp(0.5 * lvs[j]))))
            total += torch.distributions.kl_divergence(p, q).mean().item()
    ref = total / (n * (n - 1) / 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(8, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=8)
    ours = float(losses.cross_entropy_logits(jnp.asarray(logits),
                                             jnp.asarray(labels)))
    ref = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_margin_contrastive_matches_torch():
    rng = np.random.default_rng(6)
    dh = rng.random(8).astype(np.float32)
    dd = rng.random(8).astype(np.float32)
    labels = rng.integers(0, 2, size=8)
    ours = float(losses.margin_contrastive(jnp.asarray(dh), jnp.asarray(dd),
                                           jnp.asarray(labels), 1.0))
    tl = torch.tensor(labels, dtype=torch.float32)
    th, td = torch.tensor(dh), torch.tensor(dd)
    ref = torch.mean((1 - tl) * torch.relu(1.0 + th - td)
                     + tl * torch.relu(1.0 + td - th)).item()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_fusion_property_invariants():
    """Property checks: identical experts collapse correctly; fusions agree
    on M==1 semantics."""
    rng = np.random.default_rng(7)
    mu = rng.normal(size=(1, 6, 4)).astype(np.float32)
    var = np.exp(rng.normal(size=(1, 6, 4)).astype(np.float32) * 0.3)
    m3_mu = np.repeat(mu, 3, axis=0)
    m3_var = np.repeat(var, 3, axis=0)

    # PoE of M identical experts: same mean, variance / M
    pm, pv = fusion.product_of_experts(jnp.asarray(m3_mu), jnp.asarray(m3_var))
    np.testing.assert_allclose(np.asarray(pm), mu[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pv), var[0] / 3, rtol=1e-5)

    # MoE of identical experts: unchanged
    mm, mv = fusion.mixture_of_experts(jnp.asarray(m3_mu), jnp.asarray(m3_var))
    np.testing.assert_allclose(np.asarray(mm), mu[0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mv), var[0], rtol=1e-6)

    # gPoE with uniform weights == PoE with precisions scaled by 1/M
    alpha = jnp.zeros(3)
    gm, gv = fusion.gpoe(jnp.asarray(m3_mu), jnp.asarray(m3_var), alpha)
    np.testing.assert_allclose(np.asarray(gm), mu[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), var[0], rtol=1e-5)

    # MoPoE of identical experts: mean unchanged, var = (M*v + v/M)/(M+1)
    om, ov = fusion.mixture_of_product_of_experts(jnp.asarray(m3_mu),
                                                  jnp.asarray(m3_var))
    np.testing.assert_allclose(np.asarray(om), mu[0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ov),
                               (3 * var[0] + var[0] / 3) / 4, rtol=1e-5)


def test_poe_logvar_consistent_with_poe():
    rng = np.random.default_rng(8)
    mus = rng.normal(size=(3, 5, 4)).astype(np.float32)
    logvars = (rng.normal(size=(3, 5, 4)) * 0.3).astype(np.float32)
    m1, lv = fusion.poe_logvar(jnp.asarray(mus), jnp.asarray(logvars))
    m2, v = fusion.product_of_experts(jnp.asarray(mus),
                                      jnp.exp(jnp.asarray(logvars)))
    # exp(-lv) vs 1/exp(lv) and exp(log(.)) round trips in fp32: a few ulps
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jnp.exp(lv)), np.asarray(v),
                               rtol=2e-4)


def test_linear_init_matches_torch_distribution():
    """init_linear draws W and b from U(-1/sqrt(fan_in), 1/sqrt(fan_in)) —
    torch nn.Linear's default (reference models rely on it for parity)."""
    import jax

    from multi_modal_normative_modeling_tpu.ops.linear import init_linear

    fan_in, fan_out = 64, 32
    bound = 1.0 / np.sqrt(fan_in)
    layer = init_linear(jax.random.PRNGKey(0), fan_in, fan_out)
    w, b = np.asarray(layer["w"]), np.asarray(layer["b"])
    assert w.shape == (fan_in, fan_out) and b.shape == (fan_out,)
    assert np.abs(w).max() <= bound and np.abs(b).max() <= bound
    # uniform, not gaussian: spread close to the full interval
    assert np.abs(w).max() > 0.9 * bound
    assert w.std() == pytest.approx(2 * bound / np.sqrt(12), rel=0.1)
