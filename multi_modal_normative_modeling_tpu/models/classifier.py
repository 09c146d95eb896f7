"""Standalone MLP diagnosis baseline (classifier_baseline/classifier.py).

Re-design of the reference's full-batch torch training loop (classifier.py:
247-329) as one jitted lax.scan over epochs, with the ReduceLROnPlateau
schedule (mode=min, rel threshold 1e-4 — torch defaults), best-validation
parameter checkpointing and early stopping folded into the scan carry, so the
entire 1000-epoch run is a single device program (no per-epoch host round
trips — on a remote TPU that is the difference between ~1s and ~25s).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.linear import apply_linear, init_mlp
from ..ops.losses import cross_entropy_logits


class MLPClassifier:
    """Linear->ReLU->Dropout blocks + final Linear to 2 classes
    (classifier.py:25-53)."""

    def __init__(self, input_size: int, hidden_layers: Sequence[int],
                 dropout: float = 0.2, num_classes: int = 2,
                 dtype=jnp.float32):
        self.sizes = [input_size] + list(hidden_layers) + [num_classes]
        self.dropout = dropout
        self.dtype = dtype

    def init_params(self, key):
        return init_mlp(key, self.sizes, self.dtype)

    def apply(self, params, x, key=None, train: bool = False, dropout=None):
        """``dropout`` may be a traced scalar (overrides the static rate;
        used by the grid-sweep path)."""
        rate = self.dropout if dropout is None else dropout
        static_zero = dropout is None and self.dropout <= 0.0
        h = x
        for layer in params[:-1]:
            h = jax.nn.relu(apply_linear(layer, h))
            if train and not static_zero:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1.0 - rate, h.shape)
                h = jnp.where(keep, h / (1.0 - rate), 0.0)
        return apply_linear(params[-1], h)


class LogisticRegressionModel(MLPClassifier):
    """Single-linear-layer binary classifier (classifier_baseline/
    classifier.py:218-245). The reference never instantiates it (its main
    and the notebook both build the MLP), but it is part of the module's
    public surface — here it is exactly MLPClassifier with no hidden
    blocks: apply() skips the (empty) hidden loop and runs the one Linear
    to ``num_classes`` logits."""

    def __init__(self, input_size: int, num_classes: int = 2,
                 dtype=jnp.float32):
        super().__init__(input_size, [], dropout=0.0,
                         num_classes=num_classes, dtype=dtype)


def _build_classifier_train(model: MLPClassifier, x_train, y_train, x_val,
                            y_val, num_epochs: int,
                            early_stopping_patience: int = 10000):
    """train(params, hyper, key) -> (best_params, history) with hyper =
    {initial_lr, factor, patience, min_lr, dropout} as (traceable) scalars —
    usable directly or vmapped over a hyperparameter grid."""
    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-4)

    def train(params, hyper, key):
        opt_state = optimizer.init(params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(
            hyper["initial_lr"], jnp.float32)

        def loss_of(p, x, y, key, train_mode):
            logits = model.apply(p, x, key, train_mode,
                                 dropout=hyper["dropout"])
            return cross_entropy_logits(logits, y)

        grad_fn = jax.value_and_grad(
            lambda p, key: loss_of(p, x_train, y_train, key, True)
        )
        factor = hyper["factor"]
        patience = hyper["patience"]
        min_lr = hyper["min_lr"]

        return _scan_epochs(optimizer, params, opt_state, key, grad_fn,
                            loss_of, x_val, y_val, factor, patience, min_lr,
                            num_epochs, early_stopping_patience)

    return train


def train_classifier(model: MLPClassifier, params, x_train, y_train, x_val,
                     y_val, num_epochs: int, initial_lr: float,
                     factor: float, patience: int, min_lr: float,
                     early_stopping_patience: int = 10000,
                     seed: int = 42) -> Tuple[dict, dict]:
    """Full-batch Adam + ReduceLROnPlateau + best-val checkpoint + early stop.

    Returns (best_params, history) where history has per-epoch train/val loss
    and lr arrays.
    """
    train = _build_classifier_train(model, x_train, y_train, x_val, y_val,
                                    num_epochs, early_stopping_patience)
    hyper = {"initial_lr": float(initial_lr), "factor": float(factor),
             "patience": int(patience), "min_lr": float(min_lr),
             "dropout": float(model.dropout)}
    from ..cli.common import host_prng_key

    return jax.jit(train)(params, hyper, host_prng_key(seed))


def sweep_classifiers(model: MLPClassifier, params, x_train, y_train, x_val,
                      y_val, num_epochs: int, configs, seed: int = 42,
                      mesh=None):
    """Train the whole (lr, factor, patience, min_lr, dropout) grid as one
    vmapped program (classifier_baseline/tune_parameter.sh, minus the axes
    that change shapes). Returns (best_params[S], history[S]).

    With ``mesh`` (any mesh carrying a 'config' axis, e.g.
    parallel.mesh.make_sweep_mesh) the grid shards across devices — points
    are independent, so the only collective is the output gather."""
    train = _build_classifier_train(model, x_train, y_train, x_val, y_val,
                                    num_epochs)
    hyper = {
        "initial_lr": jnp.asarray([c["initial_lr"] for c in configs],
                                  jnp.float32),
        "factor": jnp.asarray([c["factor"] for c in configs], jnp.float32),
        "patience": jnp.asarray([c.get("patience", 10) for c in configs],
                                jnp.int32),
        "min_lr": jnp.asarray([c["min_lr"] for c in configs], jnp.float32),
        "dropout": jnp.asarray(
            [c.get("dropout", model.dropout) for c in configs],
            jnp.float32),
    }
    n = len(configs)
    stacked = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n,) + a.shape), params)
    import numpy as np

    from ..cli.common import host_prng_key

    keys = np.stack([host_prng_key(seed)] * n)
    vtrain = jax.vmap(train)
    if mesh is None:
        jitted = jax.jit(vtrain)
    else:
        if n % mesh.shape["config"]:
            raise ValueError(
                f"classifier sweep mesh: {n} grid configs not divisible by "
                f"the 'config' mesh axis ({mesh.shape['config']})")
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = NamedSharding(mesh, P("config"))  # pytree-prefix: leading
        jitted = jax.jit(vtrain, in_shardings=(spec, spec, spec))
    best, hist = jitted(stacked, hyper, keys)
    best = jax.tree_util.tree_map(np.asarray, jax.device_get(best))
    hist = jax.tree_util.tree_map(np.asarray, jax.device_get(hist))
    return ([jax.tree_util.tree_map(lambda a: a[s], best) for s in range(n)],
            [{k: v[s] for k, v in hist.items()} for s in range(n)])


def _scan_epochs(optimizer, params, opt_state, key, grad_fn, loss_of, x_val,
                 y_val, factor, patience, min_lr, num_epochs,
                 early_stopping_patience):
    def epoch(carry, _):
        (params, opt_state, key, best_val, sched_best, plateau,
         stopped_ctr, best_params, stopped) = carry
        key, drop_key = jax.random.split(key)
        train_loss, grads = grad_fn(params, drop_key)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # freeze everything once early-stopped
        params = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, a, b), params, new_params)
        opt_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(stopped, a, b), opt_state, new_opt_state)

        val_loss = loss_of(params, x_val, y_val, key, False)

        # ReduceLROnPlateau(mode=min, rel threshold 1e-4): the scheduler
        # keeps its OWN best, updated only when the threshold test passes
        # (torch semantics — a strict running min would let sub-threshold
        # creep suppress num_bad_epochs resets and cut the LR spuriously)
        improved_sched = val_loss < sched_best * (1.0 - 1e-4)
        sched_best = jnp.where(improved_sched, val_loss, sched_best)
        plateau = jnp.where(improved_sched, 0, plateau + 1)
        lr = opt_state.hyperparams["learning_rate"]
        reduce_now = plateau > patience
        new_lr = jnp.where(reduce_now, jnp.maximum(lr * factor, min_lr), lr)
        plateau = jnp.where(reduce_now, 0, plateau)
        opt_state.hyperparams["learning_rate"] = jnp.where(stopped, lr, new_lr)

        # best-val checkpoint (strict improvement, classifier.py:303-310)
        improved_ckpt = jnp.logical_and(val_loss < best_val,
                                        jnp.logical_not(stopped))
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(improved_ckpt, p, b), best_params, params)
        stopped_ctr = jnp.where(improved_ckpt, 0, stopped_ctr + 1)
        best_val = jnp.minimum(best_val, val_loss)
        stopped = jnp.logical_or(stopped,
                                 stopped_ctr >= early_stopping_patience)

        carry = (params, opt_state, key, best_val, sched_best, plateau,
                 stopped_ctr, best_params, stopped)
        return carry, {"train_loss": train_loss, "val_loss": val_loss,
                       "lr": opt_state.hyperparams["learning_rate"]}

    init = (params, opt_state, key,
            jnp.asarray(jnp.inf, jnp.float32),
            jnp.asarray(jnp.inf, jnp.float32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), params, jnp.asarray(False))
    final_carry, history = jax.lax.scan(epoch, init, None, length=num_epochs)
    best_params = final_carry[7]
    return best_params, history


def evaluate_classifier(model: MLPClassifier, params, x_test, y_test) -> dict:
    """Argmax + softmax-prob AUROC metrics (classifier.py:332-387)."""
    import numpy as np
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        f1_score,
        recall_score,
        roc_auc_score,
    )

    # one jitted program (cached on the model instance): eagerly the MLP
    # would issue ~2 remote ops per layer plus the softmax through the
    # TPU tunnel, per evaluation
    forward = getattr(model, "_eval_forward_jit", None)
    if forward is None:
        def _fwd(p, x):
            lg = model.apply(p, x, train=False)
            return lg, jax.nn.softmax(lg, axis=1)

        forward = model._eval_forward_jit = jax.jit(_fwd)
    logits, prob_mat = forward(params, np.asarray(x_test, np.float32))
    logits = np.asarray(logits)
    y_pred = np.argmax(logits, axis=1)
    y_true = np.asarray(y_test)
    probs = np.asarray(prob_mat)[:, 1]

    # labels pinned so a single-class fold still yields a 2x2 matrix, and
    # AUROC degrades to NaN instead of raising on one-class y_true
    tn, fp, fn, tp = confusion_matrix(y_true, y_pred, labels=[0, 1]).ravel()
    try:
        auroc = roc_auc_score(y_true, probs)
    except ValueError:
        auroc = float("nan")
    return {
        "Accuracy": accuracy_score(y_true, y_pred),
        "Sensitivity (Recall for class 1)": recall_score(
            y_true, y_pred, pos_label=1, zero_division=0),
        "Specificity (Recall for class 0)": tn / (tn + fp) if (tn + fp) else 0,
        "F1-Score": f1_score(y_true, y_pred, zero_division=0),
        "AUROC": auroc,
    }
