"""Sweep engine: (config x fold) grid in one program == sequential runs."""
import jax
import jax.numpy as jnp
import numpy as np

from multi_modal_normative_modeling_tpu.models.endtoend import EndToEndCVAE
from multi_modal_normative_modeling_tpu.parallel.folds import (
    stack_fold_batches,
)
from multi_modal_normative_modeling_tpu.parallel.sweep import SweepTrainer
from multi_modal_normative_modeling_tpu.train import FoldTrainer, TrainConfig

DIMS, C, Z, N = [18, 24], 5, 6, 40


def _problem():
    rng = np.random.default_rng(0)
    model = EndToEndCVAE(DIMS, [12, 12], Z, C, len(DIMS), non_linear=True,
                         classifier_layers=[8], dropout_rate=0.0)
    folds = []
    for f in range(2):
        data = [rng.normal(size=(N, d)).astype(np.float32) for d in DIMS]
        cov = [rng.normal(size=(N, C)).astype(np.float32)] * len(DIMS)
        labels = rng.integers(0, 2, size=N).astype(np.float32)
        folds.append((data, cov, labels))
    params_list = [model.init_params(jax.random.PRNGKey(7 + f))
                   for f in range(2)]
    keys = [jax.random.PRNGKey(100 + f) for f in range(2)]
    return model, folds, params_list, keys


def _loss_fn(model):
    def loss_fn(p, batch, k, hyper):
        labels = batch["extras"]["labels"][:, 0].astype(jnp.int32)
        fwd = model.forward(p, list(batch["x"]), list(batch["c"]), k,
                            train=True, mask=batch["mask"])
        losses = model.loss(p, list(batch["x"]), fwd, labels,
                            margin=hyper["margin"],
                            weight_contrastive=hyper["wcon"],
                            mask=batch["mask"])
        losses["__bn_state__"] = fwd["bn_state"]
        return losses["total_loss"], losses
    return loss_fn


def test_sweep_matches_sequential():
    model, folds, params_list, keys = _problem()
    config = TrainConfig(epochs=4, batch_size=16, combine="poe")
    configs = [{"margin": 0.5, "wcon": 0.1}, {"margin": 2.0, "wcon": 1.0},
               {"margin": 1.0, "wcon": 0.5}]

    state_update = lambda p, aux: {**p, "bn_state": aux["__bn_state__"]}
    loss_fn = _loss_fn(model)

    batches = stack_fold_batches(
        [f[0] for f in folds], [f[1] for f in folds], 16,
        extras=[{"labels": f[2][:, None]} for f in folds])
    sweep_keys = jnp.stack([jnp.stack(keys) for _ in configs])

    sweep = SweepTrainer(model, config, N, loss_fn, state_update)
    params_grid, logs_grid = sweep.run(params_list, batches, sweep_keys,
                                       configs)

    # sequential reference: one FoldTrainer run per (config, fold)
    for s, hyper in enumerate(configs):
        seq_loss = (lambda h: (lambda p, b, k: loss_fn(p, b, k, {
            "margin": jnp.float32(h["margin"]),
            "wcon": jnp.float32(h["wcon"])})))(hyper)
        trainer = FoldTrainer(model, config, N, loss_fn=seq_loss,
                              state_update=state_update)
        for f in range(2):
            ref_params, ref_logs = trainer.run(
                params_list[f], folds[f][0], folds[f][1], key=keys[f],
                extras={"labels": folds[f][2][:, None]})
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
                ref_params, params_grid[s][f])
            np.testing.assert_allclose(
                logs_grid[s][f]["total_loss"],
                np.asarray(ref_logs["total_loss"]), rtol=2e-3)


def test_sweep_mesh_matches_unsharded():
    """The ('config','fold') sweep mesh is pure scale-out: sharded grid
    results match the single-device vmap (same math; GSPMD partitioning
    reorders fusions and the tiny fp differences compound through Adam, so
    tolerances mirror test_sweep_matches_sequential's)."""
    from multi_modal_normative_modeling_tpu.parallel.mesh import (
        make_sweep_mesh,
    )

    model, folds, params_list, keys = _problem()
    config = TrainConfig(epochs=3, batch_size=16, combine="poe")
    configs = [{"margin": m, "wcon": w}
               for m in (0.5, 1.5) for w in (0.1, 1.0)]  # 4 configs

    state_update = lambda p, aux: {**p, "bn_state": aux["__bn_state__"]}
    loss_fn = _loss_fn(model)
    batches = stack_fold_batches(
        [f[0] for f in folds], [f[1] for f in folds], 16,
        extras=[{"labels": f[2][:, None]} for f in folds])
    sweep_keys = jnp.stack([jnp.stack(keys) for _ in configs])

    plain = SweepTrainer(model, config, N, loss_fn, state_update)
    ref_grid, ref_logs = plain.run(params_list, batches, sweep_keys, configs)

    mesh = make_sweep_mesh(n_config=4, n_fold=2)  # 8 virtual devices
    sharded = SweepTrainer(model, config, N, loss_fn, state_update,
                           mesh=mesh)
    # committed single-device inputs must be resharded, not refused
    got_grid, got_logs = sharded.run(params_list, jax.device_put(batches),
                                     sweep_keys, configs)
    for s in range(len(configs)):
        for f in range(2):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4),
                ref_grid[s][f], got_grid[s][f])
            np.testing.assert_allclose(got_logs[s][f]["total_loss"],
                                       ref_logs[s][f]["total_loss"],
                                       rtol=5e-3)


def test_sweep_mesh_divisibility_validated():
    import pytest

    from multi_modal_normative_modeling_tpu.parallel.mesh import (
        make_sweep_mesh,
    )

    model, folds, params_list, keys = _problem()
    config = TrainConfig(epochs=1, batch_size=16, combine="poe")
    configs = [{"margin": 0.5, "wcon": 0.1}, {"margin": 1.0, "wcon": 0.2},
               {"margin": 2.0, "wcon": 0.3}]  # 3 configs on a 4-wide axis
    batches = stack_fold_batches(
        [f[0] for f in folds], [f[1] for f in folds], 16,
        extras=[{"labels": f[2][:, None]} for f in folds])
    sweep_keys = jnp.stack([jnp.stack(keys) for _ in configs])
    sweep = SweepTrainer(model, config, N, _loss_fn(model),
                         lambda p, aux: {**p, "bn_state": aux["__bn_state__"]},
                         mesh=make_sweep_mesh(n_config=4, n_fold=2))
    with pytest.raises(ValueError, match="not divisible"):
        sweep.run(params_list, batches, sweep_keys, configs)


def test_classifier_grid_matches_sequential():
    """sweep_classifiers: each grid point == its train_classifier run."""
    from multi_modal_normative_modeling_tpu.models.classifier import (
        MLPClassifier,
        sweep_classifiers,
        train_classifier,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(60, 10)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int32)
    xt, yt, xv, yv = x[:40], y[:40], x[40:], y[40:]

    model = MLPClassifier(10, [8], dropout=0.0)
    params = model.init_params(jax.random.PRNGKey(0))
    configs = [
        {"initial_lr": 1e-2, "factor": 0.5, "patience": 3, "min_lr": 1e-6,
         "dropout": 0.0},
        {"initial_lr": 1e-3, "factor": 0.9, "patience": 1, "min_lr": 1e-5,
         "dropout": 0.0},
    ]
    best_grid, hist_grid = sweep_classifiers(model, params, xt, yt, xv, yv,
                                             num_epochs=30, configs=configs)
    for s, cfg in enumerate(configs):
        ref_best, ref_hist = train_classifier(
            model, params, xt, yt, xv, yv, num_epochs=30,
            initial_lr=cfg["initial_lr"], factor=cfg["factor"],
            patience=cfg["patience"], min_lr=cfg["min_lr"])
        np.testing.assert_allclose(hist_grid[s]["val_loss"],
                                   np.asarray(ref_hist["val_loss"]),
                                   rtol=2e-3)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5),
            best_grid[s], ref_best)


def test_classifier_grid_mesh_matches_unsharded():
    """sweep_classifiers over a 'config' mesh == the single-device grid."""
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU platform")
    from multi_modal_normative_modeling_tpu.models.classifier import (
        MLPClassifier,
        sweep_classifiers,
    )
    from multi_modal_normative_modeling_tpu.parallel.mesh import (
        make_sweep_mesh,
    )

    rng = np.random.default_rng(1)
    x = rng.normal(size=(60, 10)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int32)
    xt, yt, xv, yv = x[:40], y[:40], x[40:], y[40:]

    model = MLPClassifier(10, [8], dropout=0.0)
    params = model.init_params(jax.random.PRNGKey(0))
    configs = [
        {"initial_lr": 10 ** -(2 + 0.2 * s), "factor": 0.5, "patience": 3,
         "min_lr": 1e-6, "dropout": 0.0} for s in range(8)
    ]
    plain_best, plain_hist = sweep_classifiers(
        model, params, xt, yt, xv, yv, num_epochs=20, configs=configs)
    mesh = make_sweep_mesh(n_config=8, n_fold=1)
    mesh_best, mesh_hist = sweep_classifiers(
        model, params, xt, yt, xv, yv, num_epochs=20, configs=configs,
        mesh=mesh)
    for s in range(8):
        np.testing.assert_allclose(mesh_hist[s]["val_loss"],
                                   plain_hist[s]["val_loss"],
                                   rtol=1e-5, atol=1e-7)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=1e-6),
            mesh_best[s], plain_best[s])

    with pytest.raises(ValueError, match="not divisible"):
        sweep_classifiers(model, params, xt, yt, xv, yv, num_epochs=5,
                          configs=configs[:6], mesh=mesh)
