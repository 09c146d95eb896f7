#!/usr/bin/env python3
"""Tiled fused train-step kernel vs XLA at PPMI width — the round-3
experiment VERDICT r2 prescribed: the single-block kernel was falsified at
3x3485 (cannot compile batch 256; serializes), but the TILED architecture
(grid over batch tiles, weights + grad accumulators VMEM-resident,
double-buffered tile DMA, kernels/train_step_tiled.py) was never tried.

Variants per width:
  xla          FoldTrainer fp32 (production path)
  xla_bf16     FoldTrainer precision='bf16' (per-step cast, round-2 impl)
  tiled        TiledFusedTrainStep fp32 (tile auto-chosen)
  tiled_bf16   TiledFusedTrainStep bf16-resident weights/tiles, fp32 accum
  single       round-2 single-block kernel (where it compiles)

Each timed program runs epochs x batches optimizer steps inside one jit
(>=400 steps; the tunnel's 30-100ms invocation overhead must be amortized,
CLAUDE.md). Host sync via np.asarray.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_modal_normative_modeling_tpu.models import build_model  # noqa: E402
from multi_modal_normative_modeling_tpu.train import (  # noqa: E402
    FoldTrainer,
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.train.fused import (  # noqa: E402
    FusedFoldTrainer,
    make_packed_batches,
)
from multi_modal_normative_modeling_tpu.train.trainer import (  # noqa: E402
    make_batches,
)
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
)


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


def bench_width(name, dims, n, batch, epochs, hidden=(110, 110), latent=10,
                c_dim=29, combine="gpoe", variants=()):
    print(f"\n=== {name}: dims={dims} n={n} batch={batch} epochs={epochs} ===",
          flush=True)
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
        print(f"  {tag:11s} {seconds * 1e3:8.1f} ms total  {us:9.1f} us/step"
              f"  {us / batch:6.3f} us/subject", flush=True)

    if "xla" in variants:
        config = TrainConfig(epochs=epochs, batch_size=batch, combine=combine)
        tr = FoldTrainer(model, config, n)
        batches = jax.device_put(make_batches(data, [cov] * len(dims), batch))
        report("xla", _time(tr.run_batches, params, batches, key))
    if "xla_bf16" in variants:
        cfg16 = TrainConfig(epochs=epochs, batch_size=batch, combine=combine,
                            precision="bf16")
        tr16 = FoldTrainer(model, cfg16, n)
        batches = jax.device_put(make_batches(data, [cov] * len(dims), batch))
        report("xla_bf16", _time(tr16.run_batches, params, batches, key))
    if "fused_dec" in variants:
        from multi_modal_normative_modeling_tpu.kernels.decoder_nll import (
            fused_decoder_loss_fn,
        )

        cfg = TrainConfig(epochs=epochs, batch_size=batch, combine=combine)
        try:
            trd = FoldTrainer(model, cfg, n,
                              loss_fn=fused_decoder_loss_fn(model, cfg))
            batches = jax.device_put(make_batches(data, [cov] * len(dims),
                                                  batch))
            report("fused_dec", _time(trd.run_batches, params, batches, key))
        except Exception as exc:
            print(f"  fused_dec   FAILED: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)
            results["fused_dec"] = None

    for tag, kernel, precision in (("tiled", "tiled", "fp32"),
                                   ("tiled_bf16", "tiled", "bf16"),
                                   ("single", "single", "fp32")):
        if tag not in variants:
            continue
        try:
            cfg = TrainConfig(epochs=epochs, batch_size=batch,
                              combine=combine, precision=precision)
            ft = FusedFoldTrainer(model, cfg, n, interpret=False,
                                  kernel=kernel)
            padded = ft.step.pad_params(ft.stacked.pack_params(params))
            if precision == "bf16":
                padded = jax.device_put(padded)  # fp32 master; cast in step
            pb = jax.device_put(ft.step.cast_batch(
                make_packed_batches(ft.step, data, cov, batch)))
            report(tag, _time(ft._train, padded, pb, key))
            if kernel == "tiled":
                est = ft.step.vmem_bytes_tiled(ft.step.tile_b) / 2**20
                print(f"  ({tag}: tile_b={ft.step.tile_b}, "
                      f"VMEM est {est:.0f} MiB)", flush=True)
        except Exception as exc:
            print(f"  {tag:11s} FAILED: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:160]}", flush=True)
            results[tag] = None
    return results


def main():
    configure_jax_cache()
    print("devices:", jax.devices())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = (tuple(sys.argv[2].split(",")) if len(sys.argv) > 2
                else ("xla", "xla_bf16", "tiled", "tiled_bf16", "single"))
    out = {}
    ppmi_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    if which in ("all", "ppmi"):
        out["ppmi"] = bench_width("ppmi", [3485, 3485, 3485], 2560, 256,
                                  ppmi_epochs, variants=variants)
    if which in ("all", "flagship"):
        out["flagship"] = bench_width("flagship", [90, 90, 90, 270], 512,
                                      256, 50, variants=variants)
    if which == "mid":
        # the select_kernel routing window: single-block does not fit
        # batch 256 but the tiled kernel does (tile_b 32-128) — does the
        # tiled kernel actually beat XLA where the router prefers it?
        for w in (768, 1024, 1536):
            out[f"mid{w}"] = bench_width(f"mid{w}", [w, w, w], 2560, 256,
                                         ppmi_epochs, variants=variants)
    print("\nsummary (us/step):")
    for w, res in out.items():
        for tag, us in res.items():
            print(f"  {w:9s} {tag:11s} "
                  f"{us:9.1f}" if us else f"  {w:9s} {tag:11s}       n/a")


if __name__ == "__main__":
    main()
