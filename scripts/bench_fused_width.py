#!/usr/bin/env python3
"""Fused-vs-XLA per-step cost at PPMI width (3x3485 features) and flagship
width (90/90/90/270) — the VERDICT r1 experiment: prove or kill the fused
train-step kernel in the HBM-bound wide-feature regime.

Each measurement runs E epochs x NB batches inside ONE jitted program
(tunnel RTT amortized; host sync via np.asarray). Variants:
  xla        FoldTrainer (optax adam)           — the production XLA path
  xla_bf16   same, bf16 matmuls                 — halves matmul/activation bits
  xla_sgd    same step with plain SGD           — isolates Adam state traffic
  fwd_only   forward+loss per batch, no grads   — isolates backward+optimizer
  fused      FusedFoldTrainer (Pallas fwd+bwd)  — single-kernel step
  remat      jax.checkpoint(loss) — save nothing, recompute the forward in
             the backward (trades FLOPs for activation HBM traffic)
  remat_dots same with the dots_saveable policy (matmul outputs saved,
             elementwise chains recomputed)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from multi_modal_normative_modeling_tpu.models import build_model  # noqa: E402
from multi_modal_normative_modeling_tpu.train import (  # noqa: E402
    FoldTrainer,
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.train.fused import (  # noqa: E402
    FusedFoldTrainer,
)
from multi_modal_normative_modeling_tpu.train.trainer import (  # noqa: E402
    build_train_fn,
    default_loss_fn,
    make_batches,
)
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
)


def _time(fn, *args, repeats=3):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, jax.device_get(out))  # warm + sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(np.asarray, jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_width(name, dims, n, batch, epochs, hidden=(110, 110), latent=10,
                c_dim=29, combine="gpoe"):
    print(f"\n=== {name}: dims={dims} n={n} batch={batch} epochs={epochs} ===")
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", list(dims), list(hidden), latent,
                        c_dim, len(dims))
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(n, c_dim)).astype(np.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    nb = -(-n // batch)
    steps = epochs * nb
    results = {}

    def report(tag, seconds):
        us = seconds / steps * 1e6
        results[tag] = us
        print(f"  {tag:9s} {seconds * 1e3:8.1f} ms total  {us:9.1f} us/step")

    # --- XLA adam ---
    config = TrainConfig(epochs=epochs, batch_size=batch, combine=combine)
    tr = FoldTrainer(model, config, n)
    batches = jax.device_put(make_batches(data, [cov] * len(dims), batch))
    report("xla", _time(tr.run_batches, params, batches, key))

    # --- XLA bf16 ---
    cfg16 = TrainConfig(epochs=epochs, batch_size=batch, combine=combine,
                        precision="bf16")
    tr16 = FoldTrainer(model, cfg16, n)
    report("xla_bf16", _time(tr16.run_batches, params, batches, key))

    # --- XLA sgd (no Adam moment traffic) ---
    loss_fn = default_loss_fn(model, config)
    sgd_train = jax.jit(build_train_fn(loss_fn, optax.sgd(1e-4), epochs))
    report("xla_sgd", _time(sgd_train, params, batches, key))

    # --- forward only ---
    def fwd_epochs(params, batches, key):
        def step(k, batch):
            k, sub = jax.random.split(k)
            return k, loss_fn(params, batch, sub)[0]

        def epoch(k, _):
            k, _ = jax.random.split(k)
            k, tot = jax.lax.scan(step, k, batches)
            return k, tot[0]

        _, tots = jax.lax.scan(epoch, key, None, length=epochs)
        return tots

    fwd_jit = jax.jit(fwd_epochs)
    report("fwd_only", _time(fwd_jit, params, batches, key))

    # --- rematerialized backward (activation-traffic hypothesis) ---
    remat_train = jax.jit(build_train_fn(
        jax.checkpoint(loss_fn), optax.adam(1e-4, eps=1e-8), epochs))
    report("remat", _time(remat_train, params, batches, key))
    dots_train = jax.jit(build_train_fn(
        jax.checkpoint(loss_fn,
                       policy=jax.checkpoint_policies.dots_saveable),
        optax.adam(1e-4, eps=1e-8), epochs))
    report("remat_dots", _time(dots_train, params, batches, key))

    # --- fused kernel ---
    try:
        fused = FusedFoldTrainer(model, config, n, interpret=False)
        padded = fused.step.pad_params(fused.stacked.pack_params(params))
        from multi_modal_normative_modeling_tpu.train.fused import (
            make_packed_batches,
        )

        pbatches = jax.device_put(
            make_packed_batches(fused.step, data, cov, batch))
        report("fused", _time(fused._train, padded, pbatches, key))
        est = fused.step.vmem_bytes(batch) / 2**20
        print(f"  (fused VMEM estimate: {est:.0f} MiB)")
    except Exception as exc:
        print(f"  fused     FAILED: {type(exc).__name__}: "
              f"{str(exc).splitlines()[0][:160]}")
        results["fused"] = None
    return results


def main():
    configure_jax_cache()
    print("devices:", jax.devices())
    flag = bench_width("flagship", [90, 90, 90, 270], 512, 256, 50)
    ppmi = bench_width("ppmi", [3485, 3485, 3485], 2560, 256, 20)
    print("\nsummary (us/step):")
    for tag in ("xla", "xla_bf16", "xla_sgd", "fwd_only", "remat",
                "remat_dots", "fused"):
        f = f"{flag[tag]:9.1f}" if flag.get(tag) else "     n/a"
        p = f"{ppmi[tag]:9.1f}" if ppmi.get(tag) else "     n/a"
        print(f"  {tag:9s} flagship {f}   ppmi {p}")


if __name__ == "__main__":
    main()
