"""Packed split-latent layout (models/grouped_dmvae.py) ≡ DMVAEFamily:
forward/loss per variant (incl. the weighted learnable weights and the
degenerate empty-shared mode), trained trajectories, and the
--packed_xla routing through run_folds / the train CLI."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.models.grouped_dmvae import (
    GroupedDMVAE,
)
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig
from multi_modal_normative_modeling_tpu.train.grouped_dmvae import (
    GroupedDMVAEFoldTrainer,
    GroupedDMVAEMultiFoldTrainer,
)

DIMS = [24, 24, 72]
C = 4          # s_dim = c_dim = 4 < latent
LATENT = 9


def _pair(name, dims=DIMS, latent=LATENT):
    base = build_model(name, dims, [12, 10], latent, C, len(dims))
    grouped = GroupedDMVAE(dims, [12, 10], latent, C, len(dims),
                           variant=base.variant)
    params = base.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    xes = [rng.normal(size=(9, d)).astype(np.float32) for d in dims]
    return base, grouped, params, grouped.pack_params(params), xes


@pytest.mark.parametrize("name", ["DMVAE", "WeightedDMVAE", "mmVAEPlus"])
def test_forward_and_loss_equivalence(name):
    base, grouped, params, gpacked, xes = _pair(name)
    key = jax.random.PRNGKey(3)
    mask = jnp.asarray(np.r_[np.ones(7), np.zeros(2)].astype(np.float32))

    fwd_ref = base.forward(params, xes, None, key)
    loss_ref = base.loss(params, xes, fwd_ref, mask)
    x_groups = grouped.pack_inputs(xes)
    fwd = grouped.forward(gpacked, x_groups, key)
    loss = grouped.loss(gpacked, x_groups, fwd, mask)

    np.testing.assert_allclose(np.asarray(fwd["mu_c"]),
                               np.asarray(fwd_ref["mu_c"]), rtol=1e-5,
                               atol=1e-6)
    for gi, (_, idx) in enumerate(grouped.groups):
        for within, m in enumerate(idx):
            np.testing.assert_allclose(
                np.asarray(fwd["recon_means"][gi][within]),
                np.asarray(fwd_ref["recon_means"][m]), rtol=1e-4,
                atol=1e-5)
    for k in loss_ref:
        np.testing.assert_allclose(float(loss[k]), float(loss_ref[k]),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"loss key {k}")


def test_three_hidden_dims_pack():
    """DMVAEFamily builds a FIXED 2-layer trunk / 3-layer decoder from
    h[0]/h[1] whatever len(hidden_dim) says (dmvae.py init_params);
    pack_params must derive depths from the actual lists, not
    len(hidden_dim) (round-5 review: trunk[2] IndexError on -H with three
    hidden dims)."""
    dims = [24, 24, 72]
    base = build_model("DMVAE", dims, [12, 10, 8], LATENT, C, len(dims))
    grouped = GroupedDMVAE(dims, [12, 10, 8], LATENT, C, len(dims),
                           variant="dmvae")
    params = base.init_params(jax.random.PRNGKey(0))
    gpacked = grouped.pack_params(params)
    restored = grouped.unpack_params(gpacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, params)
    rng = np.random.default_rng(1)
    xes = [rng.normal(size=(6, d)).astype(np.float32) for d in dims]
    key = jax.random.PRNGKey(5)
    fwd_ref = base.forward(params, xes, None, key)
    fwd = grouped.forward(gpacked, grouped.pack_inputs(xes), key)
    np.testing.assert_allclose(np.asarray(fwd["mu_c"]),
                               np.asarray(fwd_ref["mu_c"]), rtol=1e-5,
                               atol=1e-6)


def test_pack_roundtrip_weighted():
    _, grouped, params, gpacked, _ = _pair("WeightedDMVAE")
    restored = grouped.unpack_params(gpacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, params)


def test_degenerate_empty_shared_mode():
    """latent_dim <= c_dim: the shared code is zero-width (reference
    quirk) — the packed layout reproduces the per-modality degenerate
    trajectory exactly."""
    with pytest.warns(UserWarning, match="shared code is empty"):
        base, grouped, params, gpacked, xes = _pair("DMVAE", latent=C)
    key = jax.random.PRNGKey(5)
    fwd_ref = base.forward(params, xes, None, key)
    fwd = grouped.forward(gpacked, grouped.pack_inputs(xes), key)
    assert fwd["mu_c"].shape[1] == 0
    loss_ref = base.loss(params, xes, fwd_ref)
    loss = grouped.loss(gpacked, grouped.pack_inputs(xes), fwd)
    np.testing.assert_allclose(float(loss["total"]),
                               float(loss_ref["total"]), rtol=2e-5)


@pytest.mark.parametrize("name", ["DMVAE", "WeightedDMVAE"])
def test_trainer_matches_per_modality_trajectory(name, tmp_path):
    from multi_modal_normative_modeling_tpu.train.checkpoints import (
        peek_train_meta,
    )

    model = build_model(name, DIMS, [10, 8], LATENT, C, len(DIMS))
    config = TrainConfig(epochs=8, batch_size=8, combine="poe")
    rng = np.random.default_rng(1)
    n = 19  # ragged final batch exercises the row mask
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(n, C)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    p_ref, logs_ref = FoldTrainer(model, config, n).run(
        params, data, [cov] * len(DIMS), key=key)
    gt = GroupedDMVAEFoldTrainer(model, config, n)
    assert gt.loss_meta["loss"] == f"packed_grouped_{model.variant}"
    p_got, logs_got = gt.run(params, data, cov, key=key)

    np.testing.assert_allclose(logs_got["total"], logs_ref["total"],
                               rtol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
        p_got, p_ref)

    p_res, _ = gt.run_resumable(params, data, cov, key, tmp_path,
                                checkpoint_every=3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
        p_res, p_got)
    assert peek_train_meta(tmp_path)["loss"] == \
        f"packed_grouped_{model.variant}"


def test_fold_parallel_matches_sequential():
    model = build_model("mmVAEPlus", DIMS, [10, 8], LATENT, C, len(DIMS))
    config = TrainConfig(epochs=6, batch_size=8, combine="poe")
    rng = np.random.default_rng(2)
    folds = []
    for _ in range(2):
        data = [rng.normal(size=(16, d)).astype(np.float32) for d in DIMS]
        cov = [rng.normal(size=(16, C)).astype(np.float32)] * len(DIMS)
        folds.append((data, cov))
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]

    gt = GroupedDMVAEFoldTrainer(model, config, 16)
    seq = [gt.run(params, f[0], f[1][0], key=k)
           for f, k in zip(folds, keys)]
    mt = GroupedDMVAEMultiFoldTrainer(model, config, 16)
    par_params, par_logs = mt.run([params] * 2, folds, keys)

    for f in range(2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            par_params[f], seq[f][0])
        np.testing.assert_allclose(par_logs[f]["total"],
                                   seq[f][1]["total"], rtol=1e-5)


def test_run_folds_routes_dmvae_packed(capsys, tmp_path):
    """run_folds(packed=True) on a DMVAE cohort rides the split-latent
    grouped layout (announced) and matches the per-modality layout."""
    from multi_modal_normative_modeling_tpu.cli.common import run_folds

    model = build_model("DMVAE", [12, 8], [8, 6], 7, C, 2)
    config = TrainConfig(epochs=4, batch_size=8, combine="poe")
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(16, d)).astype(np.float32) for d in (12, 8)]
    cov = [rng.normal(size=(16, C)).astype(np.float32)] * 2
    params = model.init_params(jax.random.PRNGKey(0))
    keys = [jax.random.PRNGKey(1)]

    plain, _ = run_folds(model, config, [(data, cov)], [params], keys,
                         False)
    packed, _ = run_folds(model, config, [(data, cov)], [params], keys,
                          False, packed=True)
    assert "split-latent grouped" in capsys.readouterr().out
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
        packed[0], plain[0])
