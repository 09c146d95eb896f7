#!/usr/bin/env python3
"""Reproduce the RESULTS.md flagship end-to-end numbers: UCA-gPoE, 10 folds x
200 epochs, 700 synthetic subjects, 4 modalities, fold-parallel on one chip.

Usage: python scripts/run_flagship_experiment.py [workdir] [--packed|--fast]

--packed trains on the round-4 pad-free width-grouped packed layout
(--packed_xla routing; the fastest measured configuration — RESULTS.md).
--fast additionally applies the quality-validated round-5 fast recipe on
top of --packed (batch 512, bf16 — +38% measured step throughput at
reference AUC parity; BASELINE.json quality_parity_runs).
"""
import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multi_modal_normative_modeling_tpu.cli import (  # noqa: E402
    group_analysis,
    test_supervised,
    train_supervised,
)
from multi_modal_normative_modeling_tpu.data.synthetic import (  # noqa: E402
    make_synthetic_resource,
)


def main():
    argv = [a for a in sys.argv[1:] if a not in ("--packed", "--fast")]
    fast = "--fast" in sys.argv[1:]
    packed = fast or "--packed" in sys.argv[1:]
    root = Path(argv[0]) if argv else Path(
        tempfile.mkdtemp(prefix="flagship_"))
    make_synthetic_resource(root, "ADNI", n_hc=400,
                            n_disease={0: 150, 1: 150}, effect=0.9,
                            with_early_fusion=True, seed=7)
    args = argparse.Namespace(
        dataset_resourse="ADNI", hz_para_list=[110, 110, 10],
        procedure="UCA-gPoE", combine="gPoE", epochs=200, n_splits=10,
        oversample_percentage=1, model="cVAE_multimodal",
        single_modality=None, base_learning_rate=0.0001,
        max_learning_rate=0.005, training_class="nm",
        lr_schedule="constant", fold_parallel=True,
        precision=("bf16" if fast else "fp32"),
        in_memory_fusion=True, emit_latent=False, fused_inference=False,
        packed_xla=packed, batch_size=(512 if fast else 256),
    )
    t0 = time.perf_counter()
    train_supervised.main(args, project_root=root)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    test_supervised.main(args, project_root=root)
    t_test = time.perf_counter() - t0
    t0 = time.perf_counter()
    stats = group_analysis.main(args, project_root=root)
    t_ga = time.perf_counter() - t0
    print(f"\nworkdir: {root}")
    print(f"TRAIN {t_train:.1f}s  TEST {t_test:.1f}s  ANALYSIS {t_ga:.1f}s")
    print(f"HC-vs-AD AUC: {stats['auc'][0]:.4f} ± {stats['auc_std'][0]:.4f}")


if __name__ == "__main__":
    main()
