#!/usr/bin/env python3
"""Serving-path benchmark: resident daemon vs the reference's only scoring
path (re-running the whole per-fold test pipeline per request).

The reference has no serving story: scoring N new subjects means re-running
multimodal_kfold_test_cvae_supervised.py — a fresh process that re-loads
every fold's pickled model, re-fits the per-fold RobustScalers and re-bins
covariates before the first prediction (test script:82-108). This benchmark
measures what cli/serve.py buys over that, on one machine and one synthetic
cohort:

  * daemon startup cost (paid once): checkpoint load + scaler refit +
    ONE fold-vmapped compile
  * per-request HTTP /score latency (p50/p95/p99) and subject throughput
    at several batch sizes, over the REAL request path (loopback HTTP,
    JSON in/out)
  * the "reference-shaped" alternative: a fresh process per request that
    loads checkpoints, refits scalers, and scores the same batch via
    cli/score.py (our fastest cold one-shot — the reference's own script
    would also pay torch + DataLoader overhead on top; see
    scripts/baseline_probe.py for its measured numbers)

Prints one JSON document. Platform is recorded: run with JAX_PLATFORMS=cpu
for tunnel-independent numbers, or on the default backend for real-chip
latency (through the remote tunnel each request pays ~25ms RTT +
30-100ms invocation overhead — CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _percentiles(samples):
    import numpy as np

    arr = np.asarray(samples) * 1000.0  # -> ms
    return {"p50_ms": round(float(np.percentile(arr, 50)), 2),
            "p95_ms": round(float(np.percentile(arr, 95)), 2),
            "p99_ms": round(float(np.percentile(arr, 99)), 2),
            "mean_ms": round(float(arr.mean()), 2)}


def build_project(root: Path, n_splits: int, epochs: int) -> None:
    import argparse as ap

    from multi_modal_normative_modeling_tpu.cli import train_supervised
    from multi_modal_normative_modeling_tpu.data.synthetic import (
        make_synthetic_resource,
    )

    from multi_modal_normative_modeling_tpu.cli.early_fusion import (
        build_early_fusion,
    )

    make_synthetic_resource(root, "ADNI", n_hc=400, n_disease={0: 150},
                            effect=1.2)
    build_early_fusion(root, "ADNI")
    args = ap.Namespace(
        dataset_resourse="ADNI", hz_para_list=[110, 110, 10],
        procedure="UCA-gPoE", combine="gPoE", epochs=epochs,
        n_splits=n_splits, oversample_percentage=1,
        model="cVAE_multimodal", single_modality=None,
        base_learning_rate=0.0001, max_learning_rate=0.005,
        training_class="nm", lr_schedule="constant", fold_parallel=True,
        precision="fp32",
    )
    train_supervised.main(args, project_root=root)


def bench_daemon(root: Path, n_splits: int, batch_sizes, n_requests: int):
    import numpy as np

    from multi_modal_normative_modeling_tpu.cli import serve

    t0 = time.perf_counter()
    service = serve.ScoringService("ADNI", "UCA-gPoE", combine="gPoE",
                                   n_splits=n_splits,
                                   project_root=root)
    startup_s = time.perf_counter() - t0

    server = serve.make_server(service, host="127.0.0.1", port=0)
    port = server.server_address[1]
    import threading

    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    ids = list(service._frames[0].index)
    url = f"http://127.0.0.1:{port}/score"
    results = {}
    try:
        for batch in batch_sizes:
            reps = int(np.ceil(batch / len(ids)))
            batch_ids = (ids * reps)[:batch]
            payload = json.dumps({"ids": batch_ids}).encode()
            # warm the compile for this padded bucket shape
            for _ in range(3):
                urllib.request.urlopen(
                    urllib.request.Request(
                        url, payload,
                        {"Content-Type": "application/json"})).read()
            samples = []
            t_all = time.perf_counter()
            for _ in range(n_requests):
                t1 = time.perf_counter()
                resp = urllib.request.urlopen(
                    urllib.request.Request(
                        url, payload,
                        {"Content-Type": "application/json"}))
                body = json.loads(resp.read())
                samples.append(time.perf_counter() - t1)
            wall = time.perf_counter() - t_all
            assert len(body["deviation"]) == batch
            row = _percentiles(samples)
            row["subjects_per_sec"] = round(batch * n_requests / wall, 1)
            results[f"batch_{batch}"] = row
    finally:
        server.shutdown()
        server.server_close()
    return round(startup_s, 2), results


COLD_CHILD = r"""
import json, sys, time
t0 = time.perf_counter()
import argparse
sys.path.insert(0, {repo!r})
from multi_modal_normative_modeling_tpu.cli import score
args = argparse.Namespace(
    dataset_resourse="ADNI", procedure="UCA-gPoE", combine="gPoE",
    n_splits={n_splits}, ids={ids_csv!r}, fold=None, output=None,
    roi_output=None, seed=42)
out = score.score(args, project_root={root!r})
assert len(out) == {batch}
print(json.dumps({{"seconds": time.perf_counter() - t0}}))
"""


def bench_cold(root: Path, n_splits: int, batch: int, n_requests: int):
    """Reference-shaped path: a fresh process per request (import + attach +
    checkpoint load + scaler refit + score)."""
    import pandas as pd

    y = pd.read_csv(root / "data" / "ADNI" / "y.csv")
    ids_csv = str(root / "bench_ids.csv")
    y[["IID"]].head(batch).to_csv(ids_csv, index=False)

    env = dict(os.environ)
    samples = []
    for _ in range(n_requests):
        t0 = time.perf_counter()
        child = COLD_CHILD.format(repo=str(REPO), n_splits=n_splits,
                                  ids_csv=ids_csv, root=str(root),
                                  batch=batch)
        out = subprocess.run([sys.executable, "-c", child], env=env,
                             capture_output=True, text=True, cwd=root)
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-2000:])
            raise RuntimeError("cold scoring child failed")
        samples.append(time.perf_counter() - t0)
    return _percentiles(samples)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_splits", type=int, default=5)
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--requests", type=int, default=50)
    parser.add_argument("--cold-requests", type=int, default=5)
    parser.add_argument("--batches", type=int, nargs="+",
                        default=[1, 16, 256])
    args = parser.parse_args()

    from multi_modal_normative_modeling_tpu.utils.jaxconfig import (
        configure_jax_cache,
    )

    configure_jax_cache()
    import jax

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        build_project(root, args.n_splits, args.epochs)
        startup_s, daemon = bench_daemon(root, args.n_splits, args.batches,
                                         args.requests)
        cold = bench_cold(root, args.n_splits, max(args.batches),
                          args.cold_requests)

    print(json.dumps({
        "platform": jax.default_backend(),
        "ensemble": f"{args.n_splits} folds, UCA-gPoE ADNI [110,110,10]",
        "daemon_startup_seconds": startup_s,
        "daemon": daemon,
        "cold_process_per_request": cold,
        "requests_per_point": args.requests,
    }, indent=1))


if __name__ == "__main__":
    main()
