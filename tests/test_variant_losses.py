"""End-to-end and regression model losses vs torch-implemented reference
formulas (cVAE.py:2140-2200, :2332-2346)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from multi_modal_normative_modeling_tpu.models.endtoend import EndToEndCVAE
from multi_modal_normative_modeling_tpu.models.regression import RegressionCVAE

DIMS = [14, 18]
C, Z, B = 5, 6, 12


def test_endtoend_loss_matches_torch_formulas():
    rng = np.random.default_rng(0)
    model = EndToEndCVAE(DIMS, [10, 10], Z, C, 2, non_linear=True,
                         classifier_layers=[8], dropout_rate=0.0)
    params = model.init_params(jax.random.PRNGKey(0))
    xes = [jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
           for d in DIMS]
    cs = [jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))] * 2
    labels = jnp.asarray(rng.integers(0, 2, size=B))

    fwd = model.forward(params, xes, cs, jax.random.PRNGKey(3), train=True)
    losses = model.loss(params, xes, fwd, labels, margin=1.5,
                        weight_contrastive=0.3, weight_kl=0.2,
                        weight_rec=0.4)

    # recompute every term with torch from the forward outputs
    t = lambda a: torch.tensor(np.asarray(a))
    recon_h = recon_d = 0.0
    dev_h, dev_d = [], []
    for i in range(2):
        for bank, acc, devs in (("recons_health", "h", dev_h),
                                ("recons_disease", "d", dev_d)):
            mean, lvo = fwd[bank][i]
            dist = torch.distributions.Normal(
                t(mean), t(np.asarray(lvo)).exp().pow(0.5))
            nll = -dist.log_prob(t(xes[i])).sum(dim=1).mean()
            if acc == "h":
                recon_h = recon_h + nll
            else:
                recon_d = recon_d + nll
            devs.append(((t(xes[i]) - t(mean)) ** 2).mean(dim=1))
    deviation_h = torch.stack(dev_h).mean(dim=0)
    deviation_d = torch.stack(dev_d).mean(dim=0)
    tl = t(labels).float()
    contrastive = torch.mean(
        (1 - tl) * torch.relu(1.5 + deviation_h - deviation_d)
        + tl * torch.relu(1.5 + deviation_d - deviation_h))
    mu, lv = t(fwd["mu"]), t(fwd["logvar"])
    kl = -0.5 * torch.sum(1 + lv - mu.pow(2) - lv.exp(), dim=1).mean()
    ce = torch.nn.functional.cross_entropy(t(fwd["logits"]),
                                           t(labels).long())
    total = 0.4 * (recon_h + recon_d) + 0.2 * kl + ce + 0.3 * contrastive

    np.testing.assert_allclose(float(losses["recon_loss_health"]),
                               float(recon_h), rtol=1e-4)
    np.testing.assert_allclose(float(losses["recon_loss_disease"]),
                               float(recon_d), rtol=1e-4)
    np.testing.assert_allclose(float(losses["kl_loss"]), float(kl), rtol=1e-5)
    np.testing.assert_allclose(float(losses["classification_loss"]),
                               float(ce), rtol=1e-5)
    np.testing.assert_allclose(float(losses["contrastive_loss"]),
                               float(contrastive), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses["total_loss"]), float(total),
                               rtol=1e-4)


def test_regression_loss_matches_torch_formulas():
    rng = np.random.default_rng(1)
    model = RegressionCVAE(DIMS, [10, 10], Z, 2, 2, non_linear=True)
    params = model.init_params(jax.random.PRNGKey(0))
    xes = [jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
           for d in DIMS]
    cs = [jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))] * 2
    fi = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))

    fwd = model.forward(params, xes, cs, jax.random.PRNGKey(5), "gpoe")
    losses = model.loss(params, xes, fwd, fi, lambda_reg=2.0)

    t = lambda a: torch.tensor(np.asarray(a))
    mu, lgv = t(fwd["mu_multimodal"]), t(fwd["logvar_multimodal"])
    kl = -0.5 * torch.sum(1 + lgv - mu.pow(2) - lgv.exp(), dim=1).mean()
    ll = 0.0
    for i in range(2):
        mean = t(fwd["recon_means"][i])
        lvo = t(np.asarray(params["dec"][i]["logvar_out"]))
        dist = torch.distributions.Normal(mean, lvo.exp().pow(0.5))
        ll = ll + dist.log_prob(t(xes[i])).sum(dim=1).mean()
    mse = torch.nn.functional.mse_loss(t(fwd["fi_pred"]).squeeze(),
                                       t(fi).squeeze())
    total = 2 * kl - ll + 2.0 * mse

    np.testing.assert_allclose(float(losses["regression"]), float(mse),
                               rtol=1e-5)
    np.testing.assert_allclose(float(losses["total"]), float(total),
                               rtol=1e-4)
