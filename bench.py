#!/usr/bin/env python3
"""Benchmark: 5-fold concurrent multimodal cVAE training on one TPU chip vs
the reference's sequential single-device training loop (torch, CPU — the
reference has no published wall-clock numbers, so the baseline is measured
in-process with a faithful re-creation of its hot loop:
multimodal_kfold_train_cvae_supervised.py:177-199 — per-batch Python loop,
eager PyTorch MLP cVAE, Adam(1e-4)).

Workload (BASELINE.json north star): UCA-gPoE-like ADNI shape — 4 modalities
(90+90+90 ROI vectors plus their 270-dim early fusion), ~512 train subjects
per fold, batch 256, 200 epochs (the reference CLI's default -E), hz=
[110,110,10], gPoE fusion. Ours trains ALL 5 folds concurrently via vmap +
one jitted scan; the reference equivalent trains ONE fold. vs_baseline =
(5 x torch single-fold) / our 5-fold wall-clock = end-to-end speedup for the
full CV job. 200 epochs rather than a shorter probe because the tunnel's
per-invocation overhead (~30 ms healthy, ~120 ms degraded; RESULTS.md) does
not pipeline across chained dispatches — a longer in-program scan is the only
way to keep the measurement about the device, not the tunnel.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import time

import numpy as np

DIMS = [90, 90, 90, 270]
C_DIM = 29
HIDDEN = [110, 110]
LATENT = 10
N_SUBJECTS = 512
BATCH = 256
EPOCHS = 200
FOLDS = 5
SEED = 0

# wide-regime (PPMI-class) floor row: 3 x 3485 features, 1 fold,
# 2000 in-program steps. Round 3 measured that 400-step programs (~120 ms
# of device work) are still inflatable ~2x by the tunnel's 30-150 ms
# variable invocation overhead — the round-2 "558 us/step" PPMI figure was
# exactly that artifact; at 2000 steps the same step measures 293 us
# (RESULTS.md round-3 section).
PPMI_DIMS = [3485, 3485, 3485]
PPMI_N = 2560
PPMI_EPOCHS = 200

# smoke/debug only (defaults unchanged): shrink the workloads so the full
# multi-window subprocess protocol can be exercised off-TPU in minutes
import os as _os  # noqa: E402

EPOCHS = int(_os.environ.get("MMNM_BENCH_EPOCHS", EPOCHS))
PPMI_EPOCHS = int(_os.environ.get("MMNM_BENCH_PPMI_EPOCHS", PPMI_EPOCHS))

# MXU peak for the MFU estimate (v5e; fp32 runs the MXU at 1/4 its bf16
# rate). The estimate is coarse — it exists so round-over-round regressions
# are distinguishable from tunnel weather, not as a marketing number.
PEAK_TFLOPS_FP32 = 49.2
# the chip's NATIVE bf16 peak (= 4x the assumed-fp32 rate): the honest
# denominator for "how much of this chip is used" — emitted alongside the
# assumed-fp32 figure since round 5 (the fp32 step is latency-bound, so
# against native peak the flagship is ~11%, not ~44%)
PEAK_TFLOPS_BF16 = 4 * PEAK_TFLOPS_FP32


def _matmul_flops_per_step(dims, hidden, latent, c_dim, batch) -> float:
    """Analytic fwd+bwd matmul FLOPs per optimizer step (bwd ~= 2x fwd)."""
    fwd = 0.0
    h = list(hidden)
    for d in dims:
        widths = [d + c_dim] + h          # encoder chain
        fwd += sum(2 * batch * a * b for a, b in zip(widths[:-1], widths[1:]))
        fwd += 2 * 2 * batch * h[-1] * latent            # mu / logvar heads
        dwidths = [latent + c_dim] + h[::-1] + [d]       # decoder chain
        fwd += sum(2 * batch * a * b
                   for a, b in zip(dwidths[:-1], dwidths[1:]))
    return 3.0 * fwd


def _make_data(rng):
    data = [rng.normal(size=(N_SUBJECTS, d)).astype(np.float32) for d in DIMS]
    cov = [rng.normal(size=(N_SUBJECTS, C_DIM)).astype(np.float32)
           for _ in DIMS]
    return data, cov


def bench_jax() -> "tuple[float, float]":
    """(grouped_seconds, per_modality_seconds) wall-clock for the 5-fold
    concurrent jitted run (post-compile). The HEADLINE rides the pad-free
    width-grouped packed layout (models/grouped.py, the fastest measured
    layout for this workload: +72% over per-modality in the round-4
    one-window table — RESULTS.md); the per-modality figure is kept for
    comparability with BENCH_r01-r03, whose flagship rows used it."""
    import jax

    from multi_modal_normative_modeling_tpu.utils.jaxconfig import (
        configure_jax_cache,
    )

    configure_jax_cache()

    from multi_modal_normative_modeling_tpu.utils.jaxconfig import (
        warm_device_session,
    )

    # attach the remote device session while data gen + tracing run
    warm_device_session()

    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.parallel import (
        MultiFoldTrainer,
        stack_fold_batches,
        stack_params,
    )
    from multi_modal_normative_modeling_tpu.train import TrainConfig

    rng = np.random.default_rng(SEED)
    model = build_model("cVAE_multimodal", DIMS, HIDDEN, LATENT, C_DIM,
                        len(DIMS))
    config = TrainConfig(epochs=EPOCHS, batch_size=BATCH, combine="gpoe")

    # init params/keys on the local CPU backend (threefry is bit-identical
    # across backends; eager ops through the remote tunnel cost a compile +
    # round trip each, and these helpers skip the persistent cache)
    from multi_modal_normative_modeling_tpu.cli.common import (
        host_init_params,
        host_prng_key,
    )

    per_fold_data, per_fold_cov, params_list = [], [], []
    for f in range(FOLDS):
        d, c = _make_data(rng)
        per_fold_data.append(d)
        per_fold_cov.append(c)
        params_list.append(host_init_params(model, seed=f))
    keys = np.stack([host_prng_key(100 + f) for f in range(FOLDS)])

    stacked = stack_params(params_list)
    batches = jax.device_put(
        stack_fold_batches(per_fold_data, per_fold_cov, BATCH)
    )

    trainer = MultiFoldTrainer(model, config, N_SUBJECTS)
    # compile + warm-up (np.asarray forces a host transfer: on the remote
    # TPU tunnel block_until_ready alone under-synchronizes)
    out, logs = trainer.run(stacked, batches, keys)
    np.asarray(logs["total"])
    # each timed rep runs the job CHAIN times back-to-back (async dispatches
    # pipeline) and divides: the ~100-step program is otherwise dominated by
    # the tunnel's 30-100 ms variable invocation overhead (CLAUDE.md:
    # amortize >=400 steps per timed program)
    CHAIN = 4

    def timed(run_once):
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                _, lg = run_once()
            total = np.asarray(lg["total"])
            times.append((time.perf_counter() - t0) / CHAIN)
            # per-rep finiteness (the host transfer already happened): a NaN
            # trajectory in an early rep must fail even if a later rep's
            # numbers recover
            assert np.isfinite(total).all()
        # min over repeats: tunnel latency spikes are one-sided noise
        return float(np.min(times))

    per_modality = timed(lambda: trainer.run(stacked, batches, keys))

    # headline layout: pad-free width-grouped packing (same folds, same
    # PRNG streams; trajectories match to float-reorder tolerance)
    from multi_modal_normative_modeling_tpu.train.grouped import (
        GroupedMultiFoldTrainer,
    )

    gmft = GroupedMultiFoldTrainer(model, config, N_SUBJECTS)
    folds = [(d, c) for d, c in zip(per_fold_data, per_fold_cov)]
    gsp = jax.device_put(gmft._stack_packed(params_list))
    gbt = jax.device_put(gmft.pack_folds(folds))
    import jax.numpy as jnp

    gkeys = jnp.stack(list(keys))
    gfn = gmft._jit_train(gsp, gbt, gkeys)
    gout, glogs = gfn(gsp, gbt, gkeys)
    np.asarray(glogs["total"])  # compile + warm-up
    grouped = timed(lambda: gfn(gsp, gbt, gkeys))

    # ---- round-5 headroom arms (all on the grouped layout) -----------------
    extra = {}

    # (a) full-batch 512 x {fp32, bf16}: the only flagship regime where the
    # MXU 4x could show (chain-spare-width model — RESULTS.md); 512 is the
    # whole fold, so this is the largest per-step batch the workload has
    for precision in ("fp32", "bf16"):
        try:
            cfgb = TrainConfig(epochs=EPOCHS, batch_size=512,
                               combine="gpoe", precision=precision)
            gb = GroupedMultiFoldTrainer(model, cfgb, N_SUBJECTS)
            spb = jax.device_put(gb._stack_packed(params_list))
            btb = jax.device_put(gb.pack_folds(folds))
            fnb = gb._jit_train(spb, btb, gkeys)
            _, lb = fnb(spb, btb, gkeys)
            np.asarray(lb["total"])
            secb = timed(lambda: fnb(spb, btb, gkeys))
            tag = ("flagship_b512" if precision == "fp32"
                   else "flagship_b512_bf16")
            extra[f"{tag}_us_per_step"] = round(secb / EPOCHS * 1e6, 1)
            extra[f"{tag}_subject_epochs_per_sec"] = round(
                FOLDS * EPOCHS * N_SUBJECTS / secb, 1)
        except Exception as exc:
            extra[f"flagship_b512_{precision}_error"] = \
                f"{type(exc).__name__}: {exc}"[:120]

    # (b) K=10 flagship arm — the reference CLI's DEFAULT -K 10
    # (multimodal_kfold_train_cvae_supervised.py:216-286); fold-vmapping is
    # nearly free, so per-chip throughput should RISE with K
    try:
        while len(per_fold_data) < 10:
            d, c = _make_data(rng)
            per_fold_data.append(d)
            per_fold_cov.append(c)
            params_list.append(host_init_params(model,
                                                seed=len(params_list)))
        folds10 = [(d, c) for d, c in zip(per_fold_data, per_fold_cov)]
        keys10 = jnp.stack([host_prng_key(100 + f) for f in range(10)])
        g10 = GroupedMultiFoldTrainer(model, config, N_SUBJECTS)
        sp10 = jax.device_put(g10._stack_packed(params_list))
        bt10 = jax.device_put(g10.pack_folds(folds10))
        fn10 = g10._jit_train(sp10, bt10, keys10)
        _, l10 = fn10(sp10, bt10, keys10)
        np.asarray(l10["total"])
        sec10 = timed(lambda: fn10(sp10, bt10, keys10))
        steps = EPOCHS * -(-N_SUBJECTS // BATCH)
        extra["flagship_10fold_us_per_step"] = round(sec10 / steps * 1e6, 1)
        extra["flagship_10fold_subject_epochs_per_sec"] = round(
            10 * EPOCHS * N_SUBJECTS / sec10, 1)
    except Exception as exc:
        extra["flagship_10fold_error"] = f"{type(exc).__name__}: {exc}"[:120]

    return grouped, per_modality, extra


def bench_ppmi_floor() -> dict:
    """Per-step device floor at PPMI width (3x3485, 1 fold, 2000 in-program
    steps). This is the stable cross-round signal: a degraded tunnel window
    moves wall-clock rows but not this floor (min over reps of a long
    program), so round-over-round regressions are distinguishable from
    weather."""
    import jax

    from multi_modal_normative_modeling_tpu.cli.common import (
        host_init_params,
        host_prng_key,
    )
    from multi_modal_normative_modeling_tpu.models import build_model
    from multi_modal_normative_modeling_tpu.train import (
        FoldTrainer,
        TrainConfig,
    )
    from multi_modal_normative_modeling_tpu.train.trainer import make_batches

    rng = np.random.default_rng(SEED)
    model = build_model("cVAE_multimodal", PPMI_DIMS, HIDDEN, LATENT,
                        C_DIM, len(PPMI_DIMS))
    data = [rng.normal(size=(PPMI_N, d)).astype(np.float32)
            for d in PPMI_DIMS]
    cov = rng.normal(size=(PPMI_N, C_DIM)).astype(np.float32)
    params = host_init_params(model)
    key = host_prng_key(42)

    def floor_at(batch, precision="fp32"):
        """(us_per_step, us_per_REAL_subject). Per-subject divides by the
        cohort's actual rows, NOT batch slots: 2560 rows at batch 1024 run
        3 padded batches (512 mask-padded slots), so slot-division would
        overstate throughput by ~20%."""
        config = TrainConfig(epochs=PPMI_EPOCHS, batch_size=batch,
                             combine="gpoe", precision=precision)
        trainer = FoldTrainer(model, config, PPMI_N)
        batches = jax.device_put(make_batches(data,
                                              [cov] * len(PPMI_DIMS),
                                              batch))
        steps = PPMI_EPOCHS * -(-PPMI_N // batch)
        _, logs = trainer.run_batches(params, batches, key)
        np.asarray(logs["total"])  # warm-up + compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, logs = trainer.run_batches(params, batches, key)
            total = np.asarray(logs["total"])
            times.append(time.perf_counter() - t0)
            assert np.isfinite(total).all()  # per-rep, not just the last
        sec = float(np.min(times))
        return sec / steps * 1e6, sec / (PPMI_EPOCHS * PPMI_N) * 1e6

    us_per_step, us_per_subject = floor_at(BATCH)
    flops = _matmul_flops_per_step(PPMI_DIMS, HIDDEN, LATENT, C_DIM, BATCH)
    out = {
        "ppmi_us_per_step": round(us_per_step, 1),
        "ppmi_us_per_subject": round(us_per_subject, 3),
        "ppmi_mfu_pct": round(
            flops / (us_per_step * 1e-6) / (PEAK_TFLOPS_FP32 * 1e12) * 100,
            2),
        "ppmi_native_bf16_mfu_pct": round(
            flops / (us_per_step * 1e-6) / (PEAK_TFLOPS_BF16 * 1e12) * 100,
            2),
    }
    # batch-1024 rows: the measured architectural headroom (--batch_size;
    # padding-corrected per-REAL-subject, so the gain over the
    # reference-parity 256 is honest for this 2560-row cohort). The bf16
    # arm (round 5) is the regime where the MXU 4x could show — wide
    # features AND a wide batch.
    try:
        out["ppmi_b1024_us_per_subject"] = round(floor_at(1024)[1], 3)
    except Exception as exc:
        out["ppmi_b1024_error"] = f"{type(exc).__name__}: {exc}"[:120]
    try:
        out["ppmi_b1024_bf16_us_per_subject"] = round(
            floor_at(1024, "bf16")[1], 3)
    except Exception as exc:
        out["ppmi_b1024_bf16_error"] = f"{type(exc).__name__}: {exc}"[:120]
    return out


def bench_torch_single_fold(epochs: int) -> float:
    """Reference-style eager torch CPU loop, one fold, ``epochs`` epochs.
    Returns seconds."""
    import torch
    import torch.nn as nn

    torch.manual_seed(SEED)

    class Enc(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.l1 = nn.Linear(d + C_DIM, HIDDEN[0])
            self.l2 = nn.Linear(HIDDEN[0], HIDDEN[1])
            self.mu = nn.Linear(HIDDEN[1], LATENT)
            self.lv = nn.Linear(HIDDEN[1], LATENT)

        def forward(self, x, c):
            h = torch.cat([x, c], dim=1)
            h = torch.nn.functional.leaky_relu(self.l1(h))
            h = torch.nn.functional.leaky_relu(self.l2(h))
            return self.mu(h), self.lv(h)

    class Dec(nn.Module):
        def __init__(self, d):
            super().__init__()
            self.l1 = nn.Linear(LATENT + C_DIM, HIDDEN[1])
            self.l2 = nn.Linear(HIDDEN[1], HIDDEN[0])
            self.mean = nn.Linear(HIDDEN[0], d)
            self.logvar_out = nn.Parameter(torch.full((1, d), -3.0))

        def forward(self, z, c):
            h = torch.cat([z, c], dim=1)
            h = torch.nn.functional.leaky_relu(self.l1(h))
            h = torch.nn.functional.leaky_relu(self.l2(h))
            return self.mean(h)

    encs = nn.ModuleList([Enc(d) for d in DIMS])
    decs = nn.ModuleList([Dec(d) for d in DIMS])
    alpha = nn.Parameter(torch.randn(len(DIMS)))
    params = list(encs.parameters()) + list(decs.parameters()) + [alpha]
    opt = torch.optim.Adam(params, lr=1e-4)

    rng = np.random.default_rng(SEED)
    data, cov = _make_data(rng)
    xs = [torch.from_numpy(d) for d in data]
    cs = [torch.from_numpy(c) for c in cov]

    def run_epochs(n):
        for _ in range(n):
            for start in range(0, N_SUBJECTS, BATCH):
                xb = [x[start:start + BATCH] for x in xs]
                cb = [c[start:start + BATCH] for c in cs]
                stats = [enc(x, c) for enc, x, c in zip(encs, xb, cb)]
                mus = torch.stack([s[0] for s in stats])
                variances = torch.exp(torch.stack([s[1] for s in stats]))
                w = torch.softmax(alpha, 0).reshape(-1, 1, 1)
                precision = w / variances
                var_mm = 1.0 / precision.sum(0)
                mu_mm = (mus * precision).sum(0) * var_mm
                logvar_mm = torch.log(var_mm)
                z = mu_mm + torch.randn_like(mu_mm) * torch.exp(0.5 * logvar_mm)
                total = 0.0
                for m in range(len(DIMS)):
                    mean = decs[m](z, cb[m])
                    lv = decs[m].logvar_out
                    ll = (-0.5 * (xb[m] - mean) ** 2 * torch.exp(-lv)
                          - 0.5 * lv - 0.9189385332046727).sum(1).mean(0)
                    kl = -0.5 * (1 + logvar_mm - mu_mm ** 2
                                 - torch.exp(logvar_mm)).sum(1).mean(0)
                    total = total + kl - ll
                opt.zero_grad()
                total.backward()
                opt.step()

    run_epochs(1)  # warm-up
    # min over repeats, matching the jax measurement: CPU scheduling jitter
    # is one-sided noise and would otherwise move vs_baseline run to run
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_epochs(epochs)
        times.append(time.perf_counter() - t0)
    return min(times)


def _measured_reference_seconds() -> "float | None":
    """Reference full-job seconds for the bench workload, derived from
    BASELINE.json['measured'] (the reference's ACTUAL scripts timed by
    scripts/baseline_probe.py), scaled per subject-epoch to this workload."""
    from pathlib import Path

    path = Path(__file__).parent / "BASELINE.json"
    try:
        measured = json.loads(path.read_text()).get("measured")
        per_fold_epoch = measured["train_seconds_per_fold_epoch"]
        rows = measured["approx_train_rows_per_fold"]
    except Exception:
        return None
    per_subject_epoch = per_fold_epoch / rows
    return per_subject_epoch * FOLDS * EPOCHS * N_SUBJECTS


def _attach_seconds():
    from multi_modal_normative_modeling_tpu.utils import jaxconfig

    dt = jaxconfig.attach_seconds
    return round(dt, 1) if dt is not None else None


def _child_main():
    """Child mode (MMNM_BENCH_CHILD=1): run the device measurements and
    print one tiny JSON line for the parent."""
    import jax

    jax_seconds, permod_seconds, extra = bench_jax()
    flag_steps = EPOCHS * -(-N_SUBJECTS // BATCH)
    flag_us = jax_seconds / flag_steps * 1e6
    flag_flops = FOLDS * _matmul_flops_per_step(DIMS, HIDDEN, LATENT,
                                                C_DIM, BATCH)
    floor = {
        "flagship_5fold_us_per_step": round(flag_us, 1),
        "flagship_layout": "width-grouped packed (models/grouped.py)",
        # r01-r03 flagship rows used the per-modality layout — this row is
        # the cross-round-comparable one
        "flagship_permodality_us_per_step": round(
            permod_seconds / flag_steps * 1e6, 1),
        "flagship_mfu_pct": round(
            flag_flops / (flag_us * 1e-6) / (PEAK_TFLOPS_FP32 * 1e12) * 100,
            2),
        # against the chip's NATIVE bf16 peak — the honest utilization
        # number (the fp32 step is chain-latency bound, not FLOP bound)
        "flagship_native_bf16_mfu_pct": round(
            flag_flops / (flag_us * 1e-6) / (PEAK_TFLOPS_BF16 * 1e12) * 100,
            2),
    }
    floor.update(extra)
    try:
        floor.update(bench_ppmi_floor())
    except Exception as exc:  # the headline metric must survive a floor
        floor["ppmi_error"] = f"{type(exc).__name__}: {exc}"[:200]
    floor["peak_tflops_assumed_fp32"] = PEAK_TFLOPS_FP32
    floor["peak_tflops_native_bf16"] = PEAK_TFLOPS_BF16
    print(json.dumps({"jax_seconds": jax_seconds,
                      "floor": floor,
                      "attach_seconds": _attach_seconds(),
                      "platform": jax.default_backend()}))


def _measure_in_subprocess(timeout_s: float, force_cpu: bool = False):
    """Run the jax measurement in a killable child: through the remote-TPU
    tunnel the session attach can block indefinitely in degraded windows
    (measured >900s), and jax's atexit teardown then blocks the parent —
    an in-process watchdog cannot protect the bench. Returns the child's
    JSON dict, or None on timeout/failure."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["MMNM_BENCH_CHILD"] = "1"
    if force_cpu:
        env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              capture_output=True, text=True, env=env,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None, "timeout"
    if proc.returncode != 0:
        # a crash is NOT a tunnel problem — surface the child's last lines
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-5:]
        return None, "child failed: " + " | ".join(tail)[-500:]
    try:
        return json.loads(proc.stdout.strip().splitlines()[-1]), None
    except Exception:
        return None, ("child printed no JSON: "
                      + proc.stdout.strip()[-200:])


def _fast_recipe_quality():
    """Latest recorded fast-recipe quality validation (BASELINE.json
    quality_parity_runs, experiment=fast_recipe_quality): the b512/bf16
    bench arms' AUC evidence, or None when no run is on record."""
    try:
        from pathlib import Path

        doc = json.loads(
            (Path(__file__).parent / "BASELINE.json").read_text())
        runs = [r for r in doc.get("quality_parity_runs", [])
                if r.get("experiment") == "fast_recipe_quality"]
        if not runs:
            return None
        run = runs[-1]
        fast = run["configs"]["fast_b512_bf16"]
        return {
            "fast_b512_bf16_auc": fast["hc_vs_ad_auc"],
            "reference_auc": run.get("reference_hc_vs_ad_auc"),
            "source": "scripts/quality_fast_recipe.py "
                      "(BASELINE.json quality_parity_runs)",
        }
    except Exception:
        return None


def _combine_floors(floors):
    """Min-over-windows floor dict: per-step/per-second times take the min
    across windows, the MFU estimates (1/time) take the max, anything else
    the first occurrence. A window's transient error string (e.g.
    ppmi_error) is dropped when any other window measured that floor —
    per-window details keep the full record."""
    best = {}
    for fl in floors:
        for k, v in fl.items():
            if k not in best:
                best[k] = v
            elif isinstance(v, (int, float)) and k.endswith(
                    ("_us_per_step", "_us_per_subject", "_seconds")):
                best[k] = min(best[k], v)
            elif isinstance(v, (int, float)) and k.endswith(
                    ("_mfu_pct", "_subject_epochs_per_sec")):
                best[k] = max(best[k], v)
    for metric, err in (
            ("ppmi_us_per_step", "ppmi_error"),
            ("ppmi_b1024_us_per_subject", "ppmi_b1024_error"),
            ("ppmi_b1024_bf16_us_per_subject", "ppmi_b1024_bf16_error"),
            ("flagship_10fold_us_per_step", "flagship_10fold_error"),
            ("flagship_b512_us_per_step", "flagship_b512_fp32_error"),
            ("flagship_b512_bf16_us_per_step", "flagship_b512_bf16_error")):
        if any(metric in fl for fl in floors):
            best.pop(err, None)
    return best


def main():
    import os

    # watchdog: healthy runs finish in ~2-4 min (attach 0.4s + cached
    # compile + 20 chained reps); a dead tunnel would otherwise hang forever
    timeout_s = float(os.environ.get("MMNM_BENCH_TIMEOUT", 1800))
    # Multi-window floor protocol (round 4): the remote chip's DEVICE-SIDE
    # throughput measured ~2x apart across sessions on the identical cached
    # executable (RESULTS.md round-3 addendum), so a single window's
    # min-over-reps floor carries window luck. Each window is a fresh child
    # process (fresh session attach); the recorded floors/headline are the
    # min over windows, with per-window values + spread in detail so
    # cross-round comparisons are best-window-vs-best-window by
    # construction.
    n_windows = max(1, int(os.environ.get("MMNM_BENCH_WINDOWS", 2)))
    window_gap_s = float(os.environ.get("MMNM_BENCH_WINDOW_GAP_S", 60))
    windows, window_errors = [], []
    for w in range(n_windows):
        if w:
            time.sleep(window_gap_s)
        child_w, err_w = _measure_in_subprocess(timeout_s)
        if child_w is not None:
            windows.append(child_w)
        else:
            window_errors.append(err_w)
            if err_w != "timeout" and not windows:
                # a crash (vs a blocked attach) is a code bug — fail loudly
                # with the child's diagnostics instead of mislabeling it
                # tunnel weather
                raise SystemExit(f"bench: device measurement {err_w}")
            if err_w == "timeout":
                # a dead tunnel will not heal within the gap — don't burn
                # n_windows x timeout before the cpu fallback
                break
    child = (min(windows, key=lambda c: c["jax_seconds"])
             if windows else None)
    err = window_errors[-1] if window_errors else None
    tunnel_unreachable = child is None and err == "timeout"
    if tunnel_unreachable:
        # transparent fallback: measure on the LOCAL cpu so the bench still
        # reports an honest (if far slower) number, flagged in detail. The
        # cpu leg needs its own budget (the full 5-fold x 200-epoch workload
        # takes ~6 min of cpu compute) even when the chip watchdog was short
        child, err = _measure_in_subprocess(max(timeout_s, 1800.0),
                                            force_cpu=True)
        if child is not None:
            windows = [child]
    if child is None:
        raise SystemExit("bench: cpu fallback measurement also failed "
                         f"({err})")
    jax_seconds = child["jax_seconds"]
    subjects_per_sec = FOLDS * EPOCHS * N_SUBJECTS / jax_seconds

    measured_job = _measured_reference_seconds()
    if measured_job is not None:
        # reference's own scripts, measured end-to-end (baseline_probe.py)
        reference_full_job = measured_job
        torch_seconds = measured_job / FOLDS
        baseline_source = "measured (reference scripts, BASELINE.json)"
    else:
        # fallback: in-process re-creation of the reference hot loop, probed
        # over fewer epochs and scaled (per-epoch cost is constant)
        probe_epochs = 10
        torch_seconds = (bench_torch_single_fold(probe_epochs)
                         * (EPOCHS / probe_epochs))
        reference_full_job = torch_seconds * FOLDS
        baseline_source = "in-process torch hot-loop re-creation"

    floors = [c.get("floor") for c in windows if c.get("floor")]
    detail = {
        "jax_5fold_seconds": round(jax_seconds, 3),
        # window-robust per-step device floors + MFU estimates: compare
        # THESE across rounds (wall-clock rows move with tunnel weather).
        # Since round 4 each floor is the MIN OVER >=2 separate device
        # sessions ("windows", MMNM_BENCH_WINDOWS / _GAP_S) of
        # min-over-reps of >=400-step programs: round 3 measured the
        # identical cached executable 2x apart across windows (293 vs
        # 142.8 us/step — its BENCH floor row 231 was one mid-luck window;
        # its best window was 137.6), so single-window floors carry window
        # luck by construction.
        "floor": _combine_floors(floors) if floors else None,
        "floor_windows": [
            {"jax_5fold_seconds": round(c["jax_seconds"], 3),
             "attach_seconds": c.get("attach_seconds"),
             "floor": c.get("floor")} for c in windows],
        "torch_cpu_single_fold_seconds": round(torch_seconds, 3),
        # tunnel health at measurement time: a multi-minute attach means
        # a degraded window whose ~120ms/invocation overhead inflates
        # jax_5fold_seconds (RESULTS.md "Window sensitivity")
        "session_attach_seconds": child.get("attach_seconds"),
        "platform": child.get("platform"),
        "baseline_source": baseline_source,
        "workload": f"{FOLDS} folds x {EPOCHS} epochs x {N_SUBJECTS} "
                    f"subjects x {len(DIMS)} modalities {DIMS}",
    }
    quality = _fast_recipe_quality()
    if quality is not None:
        # the b512/bf16 arms' quality evidence, read from the recorded
        # validation run (scripts/quality_fast_recipe.py) rather than
        # hardcoded — absent if no run is on record
        detail["flagship_b512_quality"] = quality
    ppmi_vals = [fl["ppmi_us_per_step"] for fl in floors
                 if isinstance(fl.get("ppmi_us_per_step"), (int, float))]
    if len(ppmi_vals) >= 2:
        detail["ppmi_floor_window_spread"] = round(
            max(ppmi_vals) / min(ppmi_vals), 2)
    if window_errors:
        detail["window_errors"] = window_errors
    if tunnel_unreachable:
        detail["tunnel_unreachable"] = (
            f"device measurement exceeded {timeout_s:.0f}s (session attach "
            "blocked; degraded windows measured >900s) — this line is the "
            "LOCAL CPU fallback, far below the chip numbers recorded in "
            "RESULTS.md / BENCH_r*.json")
    print(json.dumps({
        "metric": "5fold_cvae_train_subject_epochs_per_sec",
        "value": round(subjects_per_sec, 1),
        "unit": "subject-epochs/sec/chip",
        "vs_baseline": round(reference_full_job / jax_seconds, 2),
        "detail": detail,
    }))


if __name__ == "__main__":
    import os

    if os.environ.get("MMNM_BENCH_CHILD"):
        _child_main()
    else:
        main()
