#!/usr/bin/env python3
"""Streaming (out-of-core) trainer overhead vs the resident trainer.

The streaming path exists for cohorts that exceed HBM (train/streaming.py);
this measures what the shard pipeline COSTS when the data would have fit —
an upper bound on its overhead, since the out-of-core regime has no
resident alternative. Two regimes:

  * flagship width (4x[90..270], 512 rows): dispatch-overhead dominated —
    the worst case for a path that issues S programs per epoch instead of
    one program per run.
  * PPMI width (3x3485, 2560 rows): per-shard compute is real; upload
    (0.54 GB/epoch re-streamed) overlaps it. NOTE: through the remote-TPU
    tunnel the host->device link (~50 MB/s) makes re-streaming
    upload-bound — the measurement characterizes the tunnel, not a
    production host's PCIe/DMA (10+ GB/s). Run on a directly-attached host
    for the real number; the bit-parity tests are the correctness story.

Usage: python scripts/bench_streaming.py [flagship|ppmi|all] [epochs]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from multi_modal_normative_modeling_tpu.models import build_model  # noqa: E402
from multi_modal_normative_modeling_tpu.train import (  # noqa: E402
    FoldTrainer,
    StreamingFoldTrainer,
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
)


def bench(name, dims, n, epochs, shards_list, batch=256, hidden=(110, 110),
          latent=10, c_dim=29):
    print(f"\n=== {name}: dims={dims} n={n} epochs={epochs} "
          f"batch={batch} ===", flush=True)
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", list(dims), list(hidden), latent,
                        c_dim, len(dims))
    data = [rng.normal(size=(n, d)).astype(np.float32) for d in dims]
    cov = [rng.normal(size=(n, c_dim)).astype(np.float32)] * len(dims)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    gb = sum(d.nbytes for d in data) / 2**30
    print(f"  batch data: {gb:.2f} GiB host-side", flush=True)

    def timed(run):
        out, logs = run()  # compile + warm
        np.asarray(logs["total"])
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, logs = run()
            np.asarray(logs["total"])
            best = min(best, time.perf_counter() - t0)
        return best

    config = TrainConfig(epochs=epochs, batch_size=batch, combine="gpoe")
    resident = FoldTrainer(model, config, n)
    t_res = timed(lambda: resident.run(params, data, cov, key=key))
    print(f"  resident      {t_res * 1e3:9.1f} ms", flush=True)
    for s in shards_list:
        streaming = StreamingFoldTrainer(model, config, n, shards=s)
        t_s = timed(lambda: streaming.run(params, data, cov, key=key))
        print(f"  stream S={s:<3d} {t_s * 1e3:9.1f} ms "
              f"({t_s / t_res:5.2f}x resident)", flush=True)


def main():
    configure_jax_cache()
    print("devices:", jax.devices())
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    if which in ("all", "flagship"):
        bench("flagship", [90, 90, 90, 270], 512, max(epochs, 50), [2, 4])
    if which in ("all", "ppmi"):
        bench("ppmi", [3485, 3485, 3485], 2560, epochs, [2, 5])


if __name__ == "__main__":
    main()
