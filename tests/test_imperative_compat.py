"""The repo-root cVAE.py drop-in shim: imperative torch-style facade.

Pins the reference training protocol running verbatim against the facade
(multimodal_kfold_train_cvae_supervised.py:150-214, nmpmcont:296-315,
regression:103-190), one-step numeric equivalence against hand-computed
value_and_grad + optax, the Q1 no-op-LR quirk, torch.save round-trips,
and the module-level op exports.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import cVAE  # noqa: E402  (repo-root shim)

DIMS = [12, 9]
HIDDEN = [16, 16]
LATENT = 6
C_DIM = 4
N = 32


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    xes = [rng.normal(size=(N, d)).astype(np.float32) for d in DIMS]
    cs = [rng.normal(size=(N, C_DIM)).astype(np.float32) for _ in DIMS]
    return xes, cs


def _model(cls=None, **kw):
    cls = cls or cVAE.cVAE_multimodal
    return cls(input_dim_list=DIMS, hidden_dim=HIDDEN, latent_dim=LATENT,
               c_dim=C_DIM, learning_rate=0.0001, modalities=len(DIMS),
               non_linear=True, **kw)


def test_reference_hot_loop_verbatim_with_torch_dataloaders():
    """The exact reference protocol: torch DataLoaders over the utils_vae
    datasets, forward/loss/zero_grad/backward/step, .item() printing."""
    import torch
    from torch.utils.data import DataLoader

    import utils_vae

    xes, cs = _batch()
    loaders = [DataLoader(utils_vae.MyDataset_labels(x, c), batch_size=16,
                          shuffle=False) for x, c in zip(xes, cs)]
    model = _model().to(cVAE.DEVICE)

    epoch_first_batch = []  # same batch each epoch -> comparable losses
    for epoch in range(10):
        for batch_idx, batch in enumerate(zip(*loaders)):
            x_list = [b[0].to(cVAE.DEVICE) for b in batch]
            c_list = [b[1].to(cVAE.DEVICE) for b in batch]
            fwd = model.forward_multimodal(x_list, c_list, "gPoE")
            loss = model.loss_function_multimodal(x_list, fwd)
            model.optimizer1.lr = 0.5  # reference Q1: dead attribute write
            model.optimizer1.zero_grad()
            loss["total"].backward()
            model.optimizer1.step()
            val = round(loss["total"].item(), 3)
            assert np.isfinite(val)
            if batch_idx == 0:
                epoch_first_batch.append(loss["total"].item())
    assert epoch_first_batch[-1] < epoch_first_batch[0]  # training progresses
    # fwd leaves are torch tensors (reference code calls .cpu().numpy())
    assert isinstance(fwd["mu_multimodal"], torch.Tensor)
    assert fwd["recon_means"][0].cpu().numpy().shape == (16, DIMS[0])


def test_one_step_matches_value_and_grad_plus_optax():
    """First facade step == hand-computed jax.value_and_grad + optax.adam
    on the same init, batch and PRNG subkey (bit-for-bit modulo float32)."""
    import jax
    import optax

    from multi_modal_normative_modeling_tpu.cli.common import host_prng_key

    xes, cs = _batch()
    model = _model()
    params0 = jax.tree_util.tree_map(np.array, model._params)

    fwd = model.forward_multimodal(xes, cs, "gPoE")
    loss = model.loss_function_multimodal(xes, fwd)
    model.optimizer1.zero_grad()
    loss["total"].backward()
    model.optimizer1.step()

    # replicate: the facade's forward split the seed-42 cursor once
    sub = jax.random.split(host_prng_key(42))[1]
    core = model._core

    def total(p):
        f = core.forward(p, xes, cs, sub, "gPoE")
        return core.loss(p, xes, f, None)["total"]

    tval, grads = jax.value_and_grad(total)(params0)
    np.testing.assert_allclose(loss["total"].item(), float(tval), rtol=1e-6)
    opt = optax.adam(0.0001, eps=1e-8)
    updates, _ = opt.update(grads, opt.init(params0), params0)
    expected = optax.apply_updates(params0, updates)
    got = jax.device_get(model._params)
    for a, b in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # Q1 quirk: the lr=0.0001 Adam step moved params by ~lr, proving the
    # optimizer1.lr attribute write never reaches the update rule
    model.optimizer1.lr = 999.0
    deltas = [np.max(np.abs(np.asarray(a) - np.asarray(b)))
              for a, b in zip(jax.tree_util.tree_leaves(params0),
                              jax.tree_util.tree_leaves(got))]
    assert max(deltas) < 0.001


def test_component_backward_and_accumulation():
    """backward() works on non-total components (lazy per-component grad
    program) and two backwards accumulate like torch .grad."""
    import jax

    xes, cs = _batch()
    model = _model()
    fwd = model.forward_multimodal(xes, cs, "PoE")
    loss = model.loss_function_multimodal(xes, fwd)
    model.optimizer1.zero_grad()
    loss["kl"].backward()
    g1 = jax.device_get(model._grads)
    loss["kl"].backward()
    g2 = jax.device_get(model._grads)
    leaves1 = jax.tree_util.tree_leaves(g1)
    leaves2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(2 * np.asarray(a), np.asarray(b),
                                   atol=1e-6)


@pytest.mark.parametrize("name", ["mmJSD", "DMVAE", "WeightedDMVAE",
                                  "mvtCAE", "mmVAEPlus"])
def test_registry_variants_train_a_step(name):
    xes, cs = _batch()
    model = _model(getattr(cVAE, name))
    fwd = model.forward_multimodal(xes, cs, "PoE")
    loss = model.loss_function_multimodal(xes, fwd)
    model.optimizer1.zero_grad()
    loss["total"].backward()
    model.optimizer1.step()
    assert np.isfinite(loss["total"].item())


def test_pred_recon_and_deviation_dataframe_inputs():
    """pred_recon takes DataFrames + one covariate matrix (reference
    test-script convention, cVAE.py:1198) and is stochastic (Q2)."""
    import pandas as pd

    xes, cs = _batch()
    model = _model()
    frames = [pd.DataFrame(x) for x in xes]
    r1 = model.pred_recon(frames, cs[0], cVAE.DEVICE, "gPoE")
    r2 = model.pred_recon(frames, cs[0], cVAE.DEVICE, "gPoE")
    assert [r.shape for r in r1] == [(N, d) for d in DIMS]
    assert not np.allclose(r1[0], r2[0])  # fresh reparameterization draw
    dev = model.reconstruction_deviation_multimodal(xes, r1)
    assert len(dev) == len(DIMS) and dev[0].shape == (N,)
    expected = np.sum((xes[0] - r1[0]) ** 2, axis=1) / DIMS[0]
    np.testing.assert_allclose(dev[0], expected, rtol=1e-6)


def test_torch_save_load_roundtrip(tmp_path):
    """torch.save(model, path) / torch.load — the reference's whole-model
    pickle convention (train:211-212) — restores params, optimizer state
    and the PRNG cursor."""
    import jax
    import torch

    xes, cs = _batch()
    model = _model()
    fwd = model.forward_multimodal(xes, cs, "gPoE")
    loss = model.loss_function_multimodal(xes, fwd)
    model.optimizer1.zero_grad()
    loss["total"].backward()
    model.optimizer1.step()

    path = tmp_path / "cVAE_model.pkl"
    torch.save(model, path)
    restored = torch.load(path, weights_only=False)

    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(model._params)),
                    jax.tree_util.tree_leaves(restored._params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(model._key),
                                  np.asarray(restored._key))
    # the restored model keeps training (opt state intact)
    fwd = restored.forward_multimodal(xes, cs, "gPoE")
    loss = restored.loss_function_multimodal(xes, fwd)
    restored.optimizer1.zero_grad()
    loss["total"].backward()
    restored.optimizer1.step()
    assert np.isfinite(loss["total"].item())


def test_endtoend_protocol():
    """nmpmcont protocol: forward/loss_function(labels, margin, w)/
    optimizer/predict with torch.argmax (nmpmcont:296-315, :46)."""
    import torch

    xes, cs = _batch()
    labels = np.array([0, 1] * (N // 2), dtype=np.int64)
    model = cVAE.cVAE_multimodal_endtoend(
        input_dim_list=DIMS, hidden_dim=HIDDEN, latent_dim=LATENT,
        c_dim=C_DIM, modalities=len(DIMS), non_linear=True,
        classifier_layers=[8, 4], dropout_rate=0.5, num_classes=2)
    model.optimizer.lr = 0.5  # nmpmcont:283 — same dead write
    first = last = None
    for _ in range(10):
        fwd = model.forward(xes, cs)
        loss = model.loss_function(xes, fwd, torch.from_numpy(labels),
                                   1.0, 0.1)
        model.optimizer.zero_grad()
        loss["total_loss"].backward()
        model.optimizer.step()
        if first is None:
            first = loss["total_loss"].item()
        last = loss["total_loss"].item()
    assert last < first
    model.eval()
    logits = model.predict(xes, cs)
    preds = torch.argmax(logits, dim=1)
    assert preds.shape == (N,)


def test_regression_protocol():
    """Regression protocol incl. the single-modality encode/reparameterise/
    decode eval path and x_recon_dist.loc (regression script:183-188)."""
    import torch

    xes, cs = _batch()
    fi = np.random.default_rng(1).normal(30, 5, size=(N, 1)).astype(
        np.float32)
    model = cVAE.cVAE_multimodal_regression(
        input_dim_list=DIMS, hidden_dim=HIDDEN, latent_dim=LATENT, c_dim=2,
        modalities=len(DIMS), non_linear=True)
    c2 = [c[:, :2] for c in cs]
    first = last = None
    for _ in range(5):
        fwd = model.forward_multimodal(xes, c2, "gpoe")
        loss = model.loss_function_multimodal(xes, fwd, fi, lambda_reg=1.0)
        model.optimizer1.zero_grad()
        loss["total"].backward()
        model.optimizer1.step()
        if first is None:
            first = loss["total"].item()
        last = loss["total"].item()
    assert last < first
    assert np.isfinite(loss["regression"].item())
    assert fwd["fi_pred"].cpu().numpy().shape == (N, 1)

    x_t = torch.from_numpy(xes[0])
    c_t = torch.from_numpy(c2[0])
    mu, logvar = model.encode(x_t, c_t, 0)
    z = model.reparameterise(mu, logvar)
    dist = model.decode(z, c_t, 0)
    x_recon = dist.loc
    deviation = ((x_t - x_recon) ** 2).cpu().numpy()
    assert deviation.shape == (N, DIMS[0])
    assert np.isfinite(deviation).all()


def test_module_level_ops():
    """Fusion classes + compute_ll exports match ops/ formulas."""
    import torch

    rng = np.random.default_rng(3)
    mus = rng.normal(size=(3, 8, LATENT)).astype(np.float32)
    var = np.exp(rng.normal(size=(3, 8, LATENT))).astype(np.float32)

    pd_mu, pd_var = cVAE.ProductOfExperts()(mus, var)
    T = 1.0 / var
    np.testing.assert_allclose(pd_mu.numpy(),
                               (mus * T).sum(0) / T.sum(0), rtol=1e-5)
    np.testing.assert_allclose(pd_var.numpy(), 1.0 / T.sum(0), rtol=1e-5)

    m_mu, m_var = cVAE.MixtureOfExperts()(mus, var)
    np.testing.assert_allclose(m_mu.numpy(), mus.mean(0), rtol=1e-5)
    np.testing.assert_allclose(m_var.numpy(), var.mean(0), rtol=1e-5)

    mp_mu, mp_var = cVAE.MoPoE()(mus, var)
    assert mp_mu.shape == (8, LATENT) and np.isfinite(mp_var.numpy()).all()

    x = torch.from_numpy(rng.normal(size=(8, 5)).astype(np.float32))
    dist = cVAE.Normal(torch.zeros(8, 5), torch.ones(8, 5))
    ll = cVAE.compute_ll(x, dist)
    expected = torch.distributions.Normal(
        torch.zeros(8, 5), torch.ones(8, 5)).log_prob(x).sum(
            dim=1, keepdim=True).mean(0)
    np.testing.assert_allclose(ll.numpy(), expected.numpy(), rtol=1e-5)


def test_ctor_defaults_match_reference():
    """Reference ctor defaults (cVAE.py:1087-1095): modalities=3,
    non_linear=False — user code relying on them gets identical models."""
    m = cVAE.cVAE_multimodal(input_dim_list=[5, 5, 5], hidden_dim=[8, 8],
                             latent_dim=3, c_dim=2)
    assert m._core.modalities == 3
    assert m._core.non_linear is False


def test_eval_mode_loss_skips_backward_pass_but_backward_still_works():
    """Validation-style loss calls (model.eval()) compile a values-only
    program; .backward() still produces correct grads lazily."""
    import jax

    xes, cs = _batch()
    model = _model()
    model.eval()
    fwd = model.forward_multimodal(xes, cs, "PoE")
    loss = model.loss_function_multimodal(xes, fwd)
    assert "loss_values" in model._programs
    assert "loss_grad" not in model._programs
    loss["total"].backward()
    assert model._grads is not None
    leaves = jax.tree_util.tree_leaves(jax.device_get(model._grads))
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_component_backward_anchors_to_loss_time_params():
    """torch semantics: backward() after optimizer.step() differentiates at
    the params the loss graph was built from, not the post-step params."""
    import jax

    xes, cs = _batch()
    model = _model()
    params_pre = jax.tree_util.tree_map(np.array, model._params)
    fwd = model.forward_multimodal(xes, cs, "PoE")
    loss = model.loss_function_multimodal(xes, fwd)
    model.optimizer1.zero_grad()
    loss["total"].backward()
    model.optimizer1.step()

    model.optimizer1.zero_grad()
    loss["kl"].backward()  # must differentiate at params_pre
    got = jax.device_get(model._grads)

    sub = np.asarray(fwd["__mmnm_pending__"][2])
    core = model._core

    def kl_at(p):
        f = core.forward(p, xes, cs, sub, "PoE")
        return core.loss(p, xes, f, None)["kl"]

    expected = jax.grad(kl_at)(params_pre)
    for a, b in zip(jax.tree_util.tree_leaves(expected),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("name", ["mmcVAE", "cVAE",
                                  "cVAE_multimodal_before_refactor",
                                  "MVTCAE", "ResidualBlock"])
def test_excluded_legacy_symbols_raise_loud_message(name):
    """Dead reference classes are excluded by documented policy (SURVEY Q6,
    PARITY quirk ledger); importing one must explain the exclusion instead
    of raising a bare ImportError/AttributeError."""
    with pytest.raises(ImportError, match="excluded legacy symbol"):
        getattr(cVAE, name)
    # a genuinely-unknown name still gets the plain AttributeError
    with pytest.raises(AttributeError):
        cVAE.no_such_symbol_xyz


def test_logistic_regression_model_surface():
    """classifier_baseline/classifier.py:218's LogisticRegressionModel:
    a single Linear to num_classes logits (never instantiated by the
    reference main, but part of the module surface)."""
    import jax

    from multi_modal_normative_modeling_tpu.models.classifier import (
        LogisticRegressionModel,
    )

    model = LogisticRegressionModel(7, num_classes=2)
    params = model.init_params(jax.random.PRNGKey(0))
    assert len(params) == 1  # exactly one linear layer
    x = np.random.default_rng(0).normal(size=(5, 7)).astype(np.float32)
    logits = np.asarray(model.apply(params, x))
    assert logits.shape == (5, 2)
    # logits are exactly the affine map (no hidden activations)
    w, b = np.asarray(params[0]["w"]), np.asarray(params[0]["b"])
    np.testing.assert_allclose(logits, x @ w + b, atol=1e-6)
