#!/usr/bin/env python3
"""Reproduce the RESULTS.md PPMI-width throughput numbers: 5 folds x 20
epochs x 2560 subjects x 3 modalities of 3485 features, fold-parallel."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multi_modal_normative_modeling_tpu.models import build_model  # noqa: E402
from multi_modal_normative_modeling_tpu.parallel import (  # noqa: E402
    MultiFoldTrainer,
    stack_fold_batches,
    stack_params,
)
from multi_modal_normative_modeling_tpu.train import TrainConfig  # noqa: E402
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (  # noqa: E402
    configure_jax_cache,
)


def main():
    configure_jax_cache()
    DIMS, C, N, B, F, E = [3485] * 3, 29, 2560, 256, 5, 20
    rng = np.random.default_rng(0)
    model = build_model("cVAE_multimodal", DIMS, [110, 110], 10, C, len(DIMS))
    per_fold_data = [[rng.normal(size=(N, d)).astype(np.float32)
                      for d in DIMS] for _ in range(F)]
    per_fold_cov = [[rng.normal(size=(N, C)).astype(np.float32)] * len(DIMS)
                    for _ in range(F)]
    stacked = stack_params(
        [model.init_params(jax.random.PRNGKey(f)) for f in range(F)])

    t0 = time.perf_counter()
    batches = jax.device_put(
        stack_fold_batches(per_fold_data, per_fold_cov, B))
    jax.block_until_ready(batches["mask"])
    print(f"upload {time.perf_counter() - t0:.1f}s "
          f"({F * N * sum(DIMS) * 4 / 1e9:.2f} GB)")

    keys = jnp.stack([jax.random.PRNGKey(f) for f in range(F)])
    trainer = MultiFoldTrainer(
        model, TrainConfig(epochs=E, batch_size=B, combine="gpoe"), N)
    t0 = time.perf_counter()
    out, logs = trainer.run(stacked, batches, keys)
    np.asarray(logs["total"])
    print(f"first (compile+run) {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    out, logs = trainer.run(stacked, batches, keys)
    total = np.asarray(logs["total"])
    elapsed = time.perf_counter() - t0
    steps = E * (N // B)
    print(f"warm {elapsed:.2f}s for {F} folds x {E} epochs x {N} subjects x "
          f"3x3485 dims -> {F * E * N / elapsed:.0f} subject-epochs/s, "
          f"{elapsed / steps * 1e3:.2f} ms/step; final loss "
          f"{total[0, -1]:.1f}")


if __name__ == "__main__":
    main()
