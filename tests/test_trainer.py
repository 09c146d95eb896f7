"""Trainer numerics: cyclic LR formula, Adam parity with torch, masked batch
semantics, checkpoint round-trip."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import (
    FoldTrainer,
    TrainConfig,
    load_checkpoint,
    make_batches,
    save_checkpoint,
)
from multi_modal_normative_modeling_tpu.train.schedules import cyclic_triangular


def test_cyclic_schedule_matches_reference_formula():
    base_lr, max_lr, gamma = 1e-6, 5e-5, 0.98
    n_samples, batch_size = 300, 256
    step_size = 2 * np.ceil(n_samples / batch_size)
    schedule = cyclic_triangular(base_lr, max_lr, step_size, gamma)

    global_step = 0
    for count in range(20):
        global_step += 1  # reference increments before computing (train:179)
        cycle = np.floor(1 + global_step / (2 * step_size))
        x = np.abs(global_step / step_size - 2 * cycle + 1)
        clr = base_lr + (max_lr - base_lr) * max(0, 1 - x) * gamma ** cycle
        ours = float(schedule(jnp.asarray(count)))
        np.testing.assert_allclose(ours, clr, rtol=1e-6)


def test_adam_step_matches_torch():
    """One optax.adam step == one torch.optim.Adam step on identical params."""
    import optax

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3)).astype(np.float32)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.normal(size=(8, 3)).astype(np.float32)

    # jax side
    params = {"w": jnp.asarray(w)}
    opt = optax.adam(1e-3, eps=1e-8)
    state = opt.init(params)
    for _ in range(5):
        grads = jax.grad(
            lambda p: jnp.mean((x @ p["w"] - y) ** 2))(params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    # torch side
    tw = torch.tensor(w, requires_grad=True)
    topt = torch.optim.Adam([tw], lr=1e-3)
    tx, ty = torch.tensor(x), torch.tensor(y)
    for _ in range(5):
        topt.zero_grad()
        ((tx @ tw - ty) ** 2).mean().backward()
        topt.step()

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_make_batches_padding_and_masks():
    data = [np.ones((10, 4), np.float32)]
    cov = [np.ones((10, 2), np.float32)]
    batches = make_batches(data, cov, batch_size=4)
    assert batches["x"][0].shape == (3, 4, 4)
    assert batches["mask"].sum() == 10
    assert list(batches["valid"]) == [True, True, True]
    # final batch mask covers only the 2 real rows
    assert batches["mask"][2].sum() == 2


def test_padded_training_matches_exact_batches():
    """A fold whose size is an exact batch multiple must produce identical
    params whether or not an extra all-padding batch is appended."""
    model = build_model("cVAE_multimodal", [12], [8, 8], 4, 3, 1)
    rng = np.random.default_rng(0)
    data = [rng.normal(size=(16, 12)).astype(np.float32)]
    cov = [rng.normal(size=(16, 3)).astype(np.float32)]
    config = TrainConfig(epochs=3, batch_size=8, combine="poe")

    trainer = FoldTrainer(model, config, 16)
    params0 = model.init_params(jax.random.PRNGKey(0))
    ref_params, _ = trainer.run(params0, data, cov, key=jax.random.PRNGKey(1))

    batches = make_batches(data, cov, 8)
    padded = jax.tree_util.tree_map(
        lambda a: np.concatenate([a, np.zeros_like(a[:1])]), batches)
    padded["valid"] = padded["mask"].sum(axis=1) > 0
    got_params, _ = trainer.run_batches(params0, jax.device_put(padded),
                                        jax.random.PRNGKey(1))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6),
        ref_params, got_params)


def test_checkpoint_roundtrip(tmp_path):
    model = build_model("cVAE_multimodal", [12, 9], [8, 8], 4, 3, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path, params, {"model": "cVAE_multimodal"})
    template = model.init_params(jax.random.PRNGKey(7))
    restored, config = load_checkpoint(tmp_path, template_params=template)
    assert config["model"] == "cVAE_multimodal"
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_orbax_checkpoint_roundtrip(tmp_path):
    model = build_model("cVAE_multimodal", [12, 9], [8, 8], 4, 3, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    save_checkpoint(tmp_path, params, {"model": "cVAE_multimodal"},
                    backend="orbax")
    from multi_modal_normative_modeling_tpu.train import checkpoint_exists

    assert checkpoint_exists(tmp_path)
    template = model.init_params(jax.random.PRNGKey(7))
    restored, config = load_checkpoint(tmp_path, template_params=template)
    assert config["model"] == "cVAE_multimodal"
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, restored)


def test_remat_training_matches_plain():
    """TrainConfig(remat=True) rematerializes the forward in the backward —
    same op sequence re-executed deterministically, so trained params are
    bit-identical to the plain run."""
    from multi_modal_normative_modeling_tpu.train import (
        TrainConfig,
        train_single_fold,
    )

    rng = np.random.default_rng(3)
    data = [rng.normal(size=(50, 12)).astype(np.float32),
            rng.normal(size=(50, 9)).astype(np.float32)]
    cov = [rng.normal(size=(50, 3)).astype(np.float32)] * 2
    model = build_model("cVAE_multimodal", [12, 9], [8, 8], 4, 3, 2)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)

    plain_cfg = TrainConfig(epochs=5, batch_size=16, combine="gpoe")
    remat_cfg = TrainConfig(epochs=5, batch_size=16, combine="gpoe",
                            remat=True)
    plain_params, plain_logs = train_single_fold(model, params, data, cov,
                                                 plain_cfg, key=key)
    remat_params, remat_logs = train_single_fold(model, params, data, cov,
                                                 remat_cfg, key=key)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        plain_params, remat_params)
    np.testing.assert_allclose(remat_logs["total"], plain_logs["total"],
                               rtol=1e-6)
