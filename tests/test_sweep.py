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
