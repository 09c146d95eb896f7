#!/usr/bin/env python3
"""Round-5 packing A/B: the pad-free layouts across the rest of the zoo.

VERDICT r4 next #1-3: the width-grouped win (+72% fold-parallel cvae)
previously skipped mmJSD/mvtCAE/nmmlp (padded-to-widest, ~3x layer-0/head
FLOP waste at flagship shapes), the endtoend dual-decoder model (the
longest serialized matmul chain in the zoo) and the regression/DMVAE
families (no packed layout at all). Round 5 built all of them; this
script measures every pair back-to-back in ONE window (RESULTS.md:
device-side throughput varies ~2x across windows — only within-window
comparisons are meaningful). Each timed program runs >= 400 optimizer
steps (tunnel invocation overhead, CLAUDE.md); host sync via np.asarray.

Usage: python scripts/bench_round5_packing.py [epochs=200] [reps=4]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_modal_normative_modeling_tpu.cli.common import (  # noqa: E402
    host_init_params,
    host_prng_key,
)
from multi_modal_normative_modeling_tpu.models import build_model  # noqa: E402
from multi_modal_normative_modeling_tpu.models.endtoend import (  # noqa: E402
    EndToEndCVAE,
)
from multi_modal_normative_modeling_tpu.models.regression import (  # noqa: E402
    RegressionCVAE,
)
from multi_modal_normative_modeling_tpu.train import (  # noqa: E402
    FoldTrainer,
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.train.grouped import (  # noqa: E402
    GroupedFoldTrainer,
    GroupedMultiFoldTrainer,
)
from multi_modal_normative_modeling_tpu.train.grouped_dmvae import (  # noqa: E402
    GroupedDMVAEFoldTrainer,
    GroupedDMVAEMultiFoldTrainer,
)
from multi_modal_normative_modeling_tpu.train.packed import (  # noqa: E402
    PackedFoldTrainer,
    PackedMultiFoldTrainer,
)
from multi_modal_normative_modeling_tpu.train.packed_endtoend import (  # noqa: E402
    GroupedEndToEndMultiTrainer,
    GroupedEndToEndTrainer,
)
from multi_modal_normative_modeling_tpu.train.packed_regression import (  # noqa: E402
    GroupedRegressionTrainer,
)
from multi_modal_normative_modeling_tpu.train.trainer import (  # noqa: E402
    make_batches,
)
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
    warm_device_session,
)

DIMS = [90, 90, 90, 270]
C_DIM = 29
HIDDEN = [110, 110]
LATENT = 10
N = 512
BATCH = 256
FOLDS = 5


def _time(fn, *args, repeats=4):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, jax.device_get(out))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    configure_jax_cache()
    warm_device_session()
    print("devices:", jax.devices())
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nb = -(-N // BATCH)
    steps_1f = epochs * nb

    rng = np.random.default_rng(0)
    data = [rng.normal(size=(N, d)).astype(np.float32) for d in DIMS]
    cov = rng.normal(size=(N, C_DIM)).astype(np.float32)
    cov_list = [cov] * len(DIMS)
    folds = []
    for _ in range(FOLDS):
        fd = [rng.normal(size=(N, d)).astype(np.float32) for d in DIMS]
        folds.append((fd, [cov] * len(DIMS)))
    results = {}

    def report(tag, seconds, steps=steps_1f):
        us = seconds / steps * 1e6
        results[tag] = round(us, 1)
        print(f"  {tag:34s} {seconds * 1e3:9.1f} ms  {us:8.1f} us/step",
              flush=True)

    # ---- cvae-skeleton variants: per-modality vs padded vs grouped --------
    for name in ("mmJSD", "mvtCAE"):
        print(f"\n=== {name} single fold ({steps_1f}-step programs, "
              f"min of {reps}) ===")
        model = build_model(name, DIMS, HIDDEN, LATENT, C_DIM, len(DIMS))
        config = TrainConfig(epochs=epochs, batch_size=BATCH,
                             combine="gpoe")
        params = host_init_params(model)
        key = host_prng_key(42)
        tr = FoldTrainer(model, config, N)
        b0 = jax.device_put(make_batches(data, cov_list, BATCH))
        report(f"{name}.per_modality",
               _time(tr.run_batches, params, b0, key, repeats=reps))
        pt = PackedFoldTrainer(model, config, N)
        report(f"{name}.packed_padded",
               _time(pt._train, jax.device_put(pt._packed(params)),
                     pt._batches(data, cov), key, repeats=reps))
        gt = GroupedFoldTrainer(model, config, N)
        report(f"{name}.grouped",
               _time(gt._train, jax.device_put(gt._packed(params)),
                     gt._batches(data, cov), key, repeats=reps))

    # mmJSD 5-fold vmap: the flagship regime where padding inverted the win
    print(f"\n=== mmJSD 5-fold vmap ===")
    model = build_model("mmJSD", DIMS, HIDDEN, LATENT, C_DIM, len(DIMS))
    config = TrainConfig(epochs=epochs, batch_size=BATCH, combine="gpoe")
    params_list = [host_init_params(model, seed=f) for f in range(FOLDS)]
    keys = [host_prng_key(100 + f) for f in range(FOLDS)]
    for tag, cls in (("packed_padded", PackedMultiFoldTrainer),
                     ("grouped", GroupedMultiFoldTrainer)):
        mt = cls(model, config, N)
        sp = jax.device_put(mt._stack_packed(params_list))
        bt = jax.device_put(mt.pack_folds(folds))
        ks = jnp.stack(keys)
        fn = mt._jit_train(sp, bt, ks)
        report(f"mmJSD.5fold_{tag}", _time(fn, sp, bt, ks, repeats=reps))

    # ---- endtoend: per-modality vs packed dual-bank -----------------------
    print(f"\n=== endtoend (dual decoder banks) ===")
    e2e = EndToEndCVAE(DIMS, HIDDEN, LATENT, C_DIM, len(DIMS),
                       classifier_layers=[128, 64], dropout_rate=0.5)
    config = TrainConfig(epochs=epochs, batch_size=BATCH, combine="poe")
    labels = (rng.random(N) > 0.5).astype(np.float32)
    e2e_params = host_init_params(e2e)
    key = host_prng_key(42)

    def loss_fn(p, batch, k):
        lab = batch["extras"]["labels"][:, 0].astype(jnp.int32)
        fwd = e2e.forward(p, list(batch["x"]), list(batch["c"]), k,
                          train=True, mask=batch["mask"])
        losses = e2e.loss(p, list(batch["x"]), fwd, lab, margin=1.0,
                          weight_contrastive=1.0, mask=batch["mask"])
        losses["__bn_state__"] = fwd["bn_state"]
        return losses["total_loss"], losses

    tr = FoldTrainer(e2e, config, N, loss_fn=loss_fn,
                     state_update=lambda p, aux: {
                         **p, "bn_state": aux["__bn_state__"]})
    b0 = jax.device_put(make_batches(
        data, cov_list, BATCH,
        extras={"labels": labels[:, None]}))
    report("endtoend.per_modality",
           _time(tr.run_batches, e2e_params, b0, key, repeats=reps))
    gt = GroupedEndToEndTrainer(e2e, config, N, 1.0, 1.0)
    report("endtoend.packed_dual_bank",
           _time(gt._train, jax.device_put(gt._packed(e2e_params)),
                 gt._batches(data, cov, labels), key, repeats=reps))

    # endtoend 5-fold vmap (per-modality fold-parallel has no packed
    # reference row pre-round-5; measure the packed multi form on its own)
    mt = GroupedEndToEndMultiTrainer(e2e, config, N, 1.0, 1.0)
    sp = jax.device_put(mt._stack_packed([e2e_params] * FOLDS))
    bt = jax.device_put(mt.pack_folds(
        [(fd, cov, labels) for fd, _ in folds]))
    ks = jnp.stack([host_prng_key(100 + f) for f in range(FOLDS)])
    fn = mt._vtrain
    report("endtoend.5fold_packed_dual_bank",
           _time(fn, sp, bt, ks, repeats=reps))

    # ---- DMVAE: per-modality vs split-latent grouped ----------------------
    print(f"\n=== DMVAE (split-latent) ===")
    dm = build_model("DMVAE", DIMS, HIDDEN, 40, C_DIM, len(DIMS))
    config = TrainConfig(epochs=epochs, batch_size=BATCH, combine="poe")
    dm_params = host_init_params(dm)
    tr = FoldTrainer(dm, config, N)
    b0 = jax.device_put(make_batches(data, cov_list, BATCH))
    report("dmvae.per_modality",
           _time(tr.run_batches, dm_params, b0, key, repeats=reps))
    gt = GroupedDMVAEFoldTrainer(dm, config, N)
    report("dmvae.grouped",
           _time(gt._train, jax.device_put(gt._packed(dm_params)),
                 gt._batches(data, cov), key, repeats=reps))
    mt = GroupedDMVAEMultiFoldTrainer(dm, config, N)
    sp = jax.device_put(mt._stack_packed([dm_params] * FOLDS))
    bt = jax.device_put(mt.pack_folds(folds))
    fn = mt._jit_train(sp, bt, ks)
    report("dmvae.5fold_grouped", _time(fn, sp, bt, ks, repeats=reps))

    # ---- regression: per-modality (shuffled) vs grouped (shuffled) --------
    print(f"\n=== regression (residual-concat head, shuffle=True) ===")
    reg = RegressionCVAE(DIMS, HIDDEN, LATENT, 2, len(DIMS))
    config = TrainConfig(epochs=epochs, batch_size=BATCH, combine="gpoe",
                         shuffle=True)
    cov2 = cov[:, :2]
    fi = rng.normal(size=(N,)).astype(np.float32)
    reg_params = host_init_params(reg)

    def reg_loss(p, batch, k):
        fwd = reg.forward(p, list(batch["x"]), list(batch["c"]), k, "gpoe")
        losses = reg.loss(p, list(batch["x"]), fwd,
                          batch["extras"]["fi"][:, 0], lambda_reg=1.0,
                          mask=batch["mask"])
        return losses["total"], losses

    tr = FoldTrainer(reg, config, N, loss_fn=reg_loss)
    b0 = jax.device_put(make_batches(data, [cov2] * len(DIMS), BATCH,
                                     extras={"fi": fi[:, None]}))
    report("regression.per_modality",
           _time(tr.run_batches, reg_params, b0, key, repeats=reps))
    gt = GroupedRegressionTrainer(reg, config, N)
    report("regression.grouped",
           _time(gt._train, jax.device_put(gt._packed(reg_params)),
                 gt._batches(data, cov2, fi), key, repeats=reps))

    print("\n" + json.dumps({"us_per_step": results, "epochs": epochs,
                             "platform": jax.default_backend()}))


if __name__ == "__main__":
    main()
