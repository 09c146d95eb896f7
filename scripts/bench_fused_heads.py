#!/usr/bin/env python3
"""Does fusing each encoder's mu/logvar heads into ONE matmul shorten the
serialized matmul chain the flagship step is bound by?

RESULTS.md: the flagship step (4 modalities, hz [110,110,10], batch 256)
is bound by ~30 small MXU ops' fixed pipeline latency, not FLOPs/HBM.
Each encoder ends in TWO parallel [H, Z] matmuls (mu and logvar heads);
on a TPU core ops execute one-at-a-time, so merging them into one
[H, 2Z] matmul (then a free slice) removes one chain link per modality
per direction. This script measures an optimizer step built on the
merged-head layout against the production step, same math to fusion-op
reorder tolerance.

Usage: python scripts/bench_fused_heads.py [epochs=50]
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
    TrainConfig,
)
from multi_modal_normative_modeling_tpu.train.trainer import (  # noqa: E402
    fused_heads_loss_fn,
    make_batches,
)
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
)

DIMS = [90, 90, 90, 270]
C = 29
HID = [110, 110]
Z = 10
N, B = 512, 256


def main():
    configure_jax_cache()
    print("devices:", jax.devices())
    # default 200 epochs x 2 batches = 400-step timed programs (CLAUDE.md:
    # shorter programs are dominated by the tunnel's variable invocation
    # overhead)
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", DIMS, HID, Z, C, len(DIMS))
    data = [rng.normal(size=(N, d)).astype(np.float32) for d in DIMS]
    cov = [rng.normal(size=(N, C)).astype(np.float32)] * len(DIMS)
    params = model.init_params(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    # the baseline must pin fused_heads=False: it became the DEFAULT after
    # this script's first measurement, and a default-config baseline would
    # silently compare the fused path against itself
    config = TrainConfig(epochs=epochs, batch_size=B, combine="gpoe",
                         fused_heads=False)
    batches = jax.device_put(make_batches(data, cov, B))
    steps = epochs * -(-N // B)

    def timed(tr):
        out, logs = tr.run_batches(params, batches, key)
        np.asarray(logs["total"])
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out, logs = tr.run_batches(params, batches, key)
            np.asarray(logs["total"])
            best = min(best, time.perf_counter() - t0)
        return best, logs

    base = FoldTrainer(model, config, N)
    tb, logs_b = timed(base)
    fused = FoldTrainer(model, config, N,
                        loss_fn=fused_heads_loss_fn(model, config))
    tf, logs_f = timed(fused)
    print(f"production step: {tb / steps * 1e6:8.1f} us/step")
    print(f"fused-head step: {tf / steps * 1e6:8.1f} us/step "
          f"({tb / tf:4.2f}x)")
    d = np.max(np.abs(np.asarray(logs_b["total"])
                      - np.asarray(logs_f["total"])))
    print(f"max |loss delta| over {epochs} epochs: {d:.3e} "
          "(expect float-reorder scale, not exact)")


if __name__ == "__main__":
    main()
