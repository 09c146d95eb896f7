"""Modality-parallel (expert-parallel) step: fusion-as-collectives parity.

The collective fusion (parallel/modality.py) must reproduce the unsharded
packed model (models/stacked.py) exactly — including gradients, which flow
THROUGH the psums (one modality's encoder receives cotangents from every
other modality's decoder loss via the fused z). Multi-step optimizer parity
on the virtual 8-device mesh is the strongest cheap check of both.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from multi_modal_normative_modeling_tpu.models.stacked import (
    StackedMultimodalCVAE,
)
from multi_modal_normative_modeling_tpu.ops import fusion
from multi_modal_normative_modeling_tpu.parallel.modality import (
    build_ep_step,
    fused_stats_collective,
    make_ep_mesh,
)

DIMS, C, Z, B = [12, 16, 9, 16], 5, 7, 8


def _problem(seed=0):
    rng = np.random.default_rng(seed)
    stacked = StackedMultimodalCVAE(DIMS, [14, 10], Z, C, len(DIMS))
    params = stacked.init_params(jax.random.PRNGKey(0))
    xes = [rng.normal(size=(B, d)).astype(np.float32) for d in DIMS]
    x_packed = stacked.pack_inputs(xes)
    c = rng.normal(size=(B, C)).astype(np.float32)
    return stacked, params, x_packed, c


def _unsharded_step(stacked, opt, combine):
    def loss_fn(p, x, c, key, mask):
        fwd = stacked.forward(p, x, c, key, combine)
        return stacked.loss(p, x, fwd, mask)["total"]

    def step(p, s, x, c, key, mask):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, c, key, mask)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    return jax.jit(step)


@pytest.mark.parametrize("combine", ["poe", "gpoe", "moe", "mopoe"])
def test_fused_stats_collective_matches_fusion_ops(combine):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    rng = np.random.default_rng(1)
    m, b, z = 4, 6, 5
    mus = rng.normal(size=(m, b, z)).astype(np.float32)
    variances = rng.uniform(0.2, 2.0, size=(m, b, z)).astype(np.float32)
    alpha = rng.normal(size=(m,)).astype(np.float32)
    mesh = make_ep_mesh(n_modality=4, n_data=1, devices=jax.devices()[:4])

    fn = jax.shard_map(
        lambda mu, var, a: fused_stats_collective(
            mu, var, combine, jax.lax.all_gather(a, "modality", tiled=True),
            m),
        mesh=mesh,
        in_specs=(P("modality", None, None), P("modality", None, None),
                  P("modality")),
        out_specs=(P(), P()),
    )
    got_mu, got_var = fn(mus, variances, alpha)
    want_mu, want_var = fusion.combine_latent(
        jnp.asarray(mus), jnp.asarray(variances), combine, jnp.asarray(alpha))
    np.testing.assert_allclose(np.asarray(got_mu), np.asarray(want_mu),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_var), np.asarray(want_var),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("combine", ["poe", "gpoe", "moe", "mopoe"])
@pytest.mark.parametrize("n_modality", [2, 4])
def test_ep_step_matches_unsharded(combine, n_modality):
    """Multi-step trajectory parity on a ('modality', 1) mesh: with n_data=1
    the z draw is identical, so params/loss must match the unsharded packed
    step to float tolerance — gradients through every collective included."""
    if len(jax.devices()) < n_modality:
        pytest.skip("needs more virtual devices")
    stacked, params, x_packed, c = _problem()
    opt = optax.adam(1e-3)
    mesh = make_ep_mesh(n_modality=n_modality, n_data=1,
                        devices=jax.devices()[:n_modality])
    ep_step = build_ep_step(stacked, opt, combine, mesh)
    ref_step = _unsharded_step(stacked, opt, combine)

    mask = jnp.ones((B,), jnp.float32)
    p_ep, s_ep = params, opt.init(params)
    p_ref, s_ref = params, opt.init(params)
    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        p_ep, s_ep, loss_ep = ep_step(p_ep, s_ep, x_packed, c, key, mask)
        p_ref, s_ref, loss_ref = ref_step(p_ref, s_ref, x_packed, c, key,
                                          mask)
        np.testing.assert_allclose(float(loss_ep), float(loss_ref),
                                   rtol=5e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6),
        p_ep, p_ref)


def test_ep_step_modality_x_data_mesh(monkeypatch):
    """Full 2-D ('modality', 'data') mesh parity: stitch the per-data-shard
    noise draws into an oracle eps and monkeypatch the unsharded model's
    reparameterize to consume it — then the (2, 4) meshed step must match
    the unsharded step exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    stacked, params, x_packed, c = _problem()
    n_data = 4
    opt = optax.adam(1e-3)
    mesh = make_ep_mesh(n_modality=2, n_data=n_data,
                        devices=jax.devices()[:8])
    ep_step = build_ep_step(stacked, opt, "gpoe", mesh)

    key = jax.random.PRNGKey(11)
    mask = np.ones((B,), np.float32)
    mask[-2:] = 0.0  # exercise the masked-mean collectives too
    p_ep, s_ep, loss_ep = ep_step(params, opt.init(params), x_packed, c,
                                  key, jnp.asarray(mask))

    b_loc = B // n_data
    eps_full = np.concatenate([
        np.asarray(jax.random.normal(
            jax.random.fold_in(key, i), (b_loc, Z), jnp.float32))
        for i in range(n_data)
    ])

    import multi_modal_normative_modeling_tpu.models.stacked as stacked_mod

    monkeypatch.setattr(
        stacked_mod, "reparameterize",
        lambda k, mu, logvar: mu + jnp.asarray(eps_full)
        * jnp.exp(0.5 * logvar))
    ref_step = _unsharded_step(stacked, opt, "gpoe")
    p_ref, _, loss_ref = ref_step(params, opt.init(params), x_packed, c,
                                  key, jnp.asarray(mask))
    np.testing.assert_allclose(float(loss_ep), float(loss_ref), rtol=5e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6),
        p_ep, p_ref)


def _trainer_problem():
    rng = np.random.default_rng(3)
    from multi_modal_normative_modeling_tpu.models import build_model

    model = build_model("cVAE_multimodal", DIMS, [14, 10], Z, C, len(DIMS))
    params = model.init_params(jax.random.PRNGKey(0))
    n = 20  # 3 batches of 8 with padding: exercises mask + valid skipping
    data_list = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(n, C)).astype(np.float32)
    return model, params, data_list, cov, n


def test_ep_trainer_matches_packed_trainer():
    """Whole-fold EP training (scan inside the shard body) must reproduce
    the packed trainer's trajectory to float tolerance at n_data == 1 —
    same key splits, same masked/valid-batch semantics, gradients through
    psums (the psums reorder the modality-axis sums, so parity is
    ulp-level, not bit-identical)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        EPFoldTrainer,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedFoldTrainer,
    )

    model, params, data_list, cov, n = _trainer_problem()
    config = TrainConfig(epochs=3, batch_size=8, combine="gpoe",
                         shuffle=False)
    pt_params, pt_logs = PackedFoldTrainer(model, config, n).run(
        params, data_list, cov)
    mesh = make_ep_mesh(n_modality=4, n_data=1, devices=jax.devices()[:4])
    ep_params, ep_logs = EPFoldTrainer(model, config, n, mesh).run(
        params, data_list, cov)

    np.testing.assert_allclose(ep_logs["total"], pt_logs["total"], rtol=5e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6),
        ep_params, pt_params)


def test_ep_trainer_data_axis_and_resume(tmp_path):
    """2-D (modality, data) EP training runs, and kill-and-resume through
    --checkpoint_every-style chunks is bit-identical to the one-shot run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        EPFoldTrainer,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig

    model, params, data_list, cov, n = _trainer_problem()
    config = TrainConfig(epochs=4, batch_size=8, combine="moe",
                         shuffle=False)
    mesh = make_ep_mesh(n_modality=2, n_data=4, devices=jax.devices()[:8])
    trainer = EPFoldTrainer(model, config, n, mesh)
    one_shot, logs = trainer.run(params, data_list, cov)
    assert np.isfinite(np.asarray(logs["total"])).all()

    key = jax.random.PRNGKey(config.seed)
    partial_dir = tmp_path / "state"
    resumed, _ = trainer.run_resumable(params, data_list, cov, key,
                                       state_dir=partial_dir,
                                       checkpoint_every=2, resume=True)
    # simulate the kill: a fresh trainer resumes from the on-disk state
    trainer2 = EPFoldTrainer(model, config, n, mesh)
    resumed2, _ = trainer2.run_resumable(params, data_list, cov, key,
                                         state_dir=partial_dir,
                                         checkpoint_every=2, resume=True)
    for got in (resumed, resumed2):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            got, one_shot)


def test_packed_fold_parallel_gspmd_ep_mesh_matches_unmeshed():
    """PackedMultiFoldTrainer over a ('fold','modality','data') mesh (GSPMD
    places the fusion all-reduces) must match the unmeshed fold-parallel
    packed run — identical draws, so only partial-sum order differs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        make_ep_mesh3,
        packed_fold_shardings,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedMultiFoldTrainer,
    )

    rng = np.random.default_rng(5)
    model = build_model("cVAE_multimodal", DIMS, [14, 10], Z, C, len(DIMS))
    config = TrainConfig(epochs=3, batch_size=8, combine="mopoe",
                         shuffle=False)
    folds = []
    for s in (1, 2):
        n = 17 + s
        data = [rng.normal(size=(n, d)).astype(np.float32) for d in DIMS]
        cov = rng.normal(size=(n, C)).astype(np.float32)
        folds.append((data, [cov] * len(DIMS)))
    params_list = [model.init_params(jax.random.PRNGKey(f)) for f in range(2)]
    keys = [jax.random.PRNGKey(42) for _ in range(2)]

    plain = PackedMultiFoldTrainer(model, config, 19)
    ref_params, ref_logs = plain.run(params_list, folds, keys)

    mesh = make_ep_mesh3(n_fold=2, n_modality=2, n_data=2,
                         devices=jax.devices()[:8])
    meshed = PackedMultiFoldTrainer(model, config, 19, mesh=mesh,
                                    shardings_fn=packed_fold_shardings)
    got_params, got_logs = meshed.run(params_list, folds, keys)

    for f in range(2):
        np.testing.assert_allclose(got_logs[f]["total"],
                                   ref_logs[f]["total"], rtol=5e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6),
            got_params[f], ref_params[f])


def test_ep_mesh_divisibility_errors():
    stacked, params, x_packed, c = _problem()
    with pytest.raises(ValueError, match="not divisible"):
        make_ep_mesh(n_modality=3, devices=jax.devices()[:8])
    mesh = make_ep_mesh(n_modality=3, n_data=1, devices=jax.devices()[:3])
    with pytest.raises(ValueError, match="modalities not divisible"):
        build_ep_step(stacked, optax.adam(1e-3), "poe", mesh)
