#!/usr/bin/env python3
"""Pad-free width-grouped packed layout vs padded packing vs per-modality —
the round-4 experiment VERDICT r3 prescribed (weak #6 / next #6): packing's
+22% single-fold win inverted to −21% under the 5-fold vmap because inputs
pad to the widest modality (90→270, 3× layer-0/decoder-head FLOP waste).
models/grouped.py groups the width-dependent ops by exact width instead.

Measures the flagship workload (4 modalities [90,90,90,270], batch 256,
512 subjects/fold) single-fold AND 5-fold-vmapped, all arms back-to-back in
ONE window (RESULTS.md round-3: device-side throughput varies ~2× across
windows — only within-window comparisons are meaningful). Each timed
program runs >= 400 optimizer steps (tunnel invocation overhead must be
amortized, CLAUDE.md); host sync via np.asarray.

Usage: python scripts/bench_grouped.py [epochs=200] [reps=4]
"""
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
from multi_modal_normative_modeling_tpu.parallel import (  # noqa: E402
    MultiFoldTrainer,
    stack_fold_batches,
    stack_params,
)
from multi_modal_normative_modeling_tpu.train import (  # noqa: E402
    FoldTrainer,
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.train.grouped import (  # noqa: E402
    GroupedFoldTrainer,
    GroupedMultiFoldTrainer,
)
from multi_modal_normative_modeling_tpu.train.packed import (  # noqa: E402
    PackedFoldTrainer,
    PackedMultiFoldTrainer,
)
from multi_modal_normative_modeling_tpu.train.trainer import (  # noqa: E402
    make_batches,
)
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
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
    print("devices:", jax.devices())
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nb = -(-N // BATCH)
    steps_1f = epochs * nb

    model = build_model("cVAE_multimodal", DIMS, HIDDEN, LATENT, C_DIM,
                        len(DIMS))
    config = TrainConfig(epochs=epochs, batch_size=BATCH, combine="gpoe")
    rng = np.random.default_rng(0)
    folds = []
    for _ in range(FOLDS):
        data = [rng.normal(size=(N, d)).astype(np.float32) for d in DIMS]
        cov = [rng.normal(size=(N, C_DIM)).astype(np.float32)] * len(DIMS)
        folds.append((data, cov))
    params = host_init_params(model)
    keys = [host_prng_key(100 + f) for f in range(FOLDS)]

    results = {}

    def report(tag, seconds, steps):
        us = seconds / steps * 1e6
        results[tag] = us
        print(f"  {tag:22s} {seconds * 1e3:9.1f} ms total  {us:8.1f} us/step",
              flush=True)

    print(f"\n=== single fold ({steps_1f} steps/program, min of {reps}) ===")
    data0, cov0 = folds[0]
    tr = FoldTrainer(model, config, N)
    b0 = jax.device_put(make_batches(data0, cov0, BATCH))
    report("per_modality", _time(tr.run_batches, params, b0, keys[0],
                                 repeats=reps), steps_1f)

    pt = PackedFoldTrainer(model, config, N)
    pb = pt._batches(data0, cov0[0])
    ppk = pt._packed(params)
    report("packed_padded", _time(pt._train, jax.device_put(ppk), pb,
                                  keys[0], repeats=reps), steps_1f)

    gt = GroupedFoldTrainer(model, config, N)
    gb = gt._batches(data0, cov0[0])
    gpk = gt._packed(params)
    report("packed_grouped", _time(gt._train, jax.device_put(gpk), gb,
                                   keys[0], repeats=reps), steps_1f)

    print(f"\n=== 5-fold vmap ({steps_1f} steps/program/fold) ===")
    mft = MultiFoldTrainer(model, config, N)
    stacked = stack_params([params] * FOLDS)
    batches = jax.device_put(stack_fold_batches(
        [f[0] for f in folds], [f[1] for f in folds], BATCH))
    kstack = jnp.stack(keys)
    report("per_modality_5f", _time(mft.run, stacked, batches, kstack,
                                    repeats=reps), steps_1f)

    pmft = PackedMultiFoldTrainer(model, config, N)
    psp = pmft._stack_packed([params] * FOLDS)
    pbt = jax.device_put(pmft.pack_folds(folds))
    pfn = pmft._jit_train(psp, pbt, kstack)
    report("packed_padded_5f", _time(pfn, jax.device_put(psp), pbt, kstack,
                                     repeats=reps), steps_1f)

    gmft = GroupedMultiFoldTrainer(model, config, N)
    gsp = gmft._stack_packed([params] * FOLDS)
    gbt = jax.device_put(gmft.pack_folds(folds))
    gfn = gmft._jit_train(gsp, gbt, kstack)
    report("packed_grouped_5f", _time(gfn, jax.device_put(gsp),
                                      gbt, kstack, repeats=reps), steps_1f)

    # bf16 arms (round 4): fp32 master params, bfloat16 matmuls
    cfg16 = TrainConfig(epochs=epochs, batch_size=BATCH, combine="gpoe",
                        precision="bf16")
    tr16 = FoldTrainer(model, cfg16, N)
    b16 = jax.device_put(make_batches(data0, cov0, BATCH))
    report("per_modality_bf16", _time(tr16.run_batches, params, b16,
                                      keys[0], repeats=reps), steps_1f)
    g16 = GroupedFoldTrainer(model, cfg16, N)
    gb16 = g16._batches(data0, cov0[0])
    report("packed_grouped_bf16", _time(g16._train,
                                        jax.device_put(g16._packed(params)),
                                        gb16, keys[0], repeats=reps),
           steps_1f)
    gm16 = GroupedMultiFoldTrainer(model, cfg16, N)
    g16sp = jax.device_put(gm16._stack_packed([params] * FOLDS))
    g16bt = jax.device_put(gm16.pack_folds(folds))
    g16fn = gm16._jit_train(g16sp, g16bt, kstack)
    report("packed_grouped_bf16_5f", _time(g16fn, g16sp, g16bt, kstack,
                                           repeats=reps), steps_1f)

    print("\nsummary (us/step):")
    for tag, us in results.items():
        print(f"  {tag:22s} {us:8.1f}")
    base1, base5 = results["per_modality"], results["per_modality_5f"]
    for tag in ("packed_padded", "packed_grouped"):
        print(f"  {tag} vs per-modality: "
              f"{(base1 / results[tag] - 1) * 100:+.1f}% single, "
              f"{(base5 / results[tag + '_5f'] - 1) * 100:+.1f}% 5-fold")


if __name__ == "__main__":
    main()
