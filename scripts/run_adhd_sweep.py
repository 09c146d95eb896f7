"""Reproduce the commands_list11_adhd.sh main grid through the whole-grid
sweep engine (cli/sweep_supervised.py) on a synthetic ADHD cohort.

The reference drives this grid as a bash loop of 120 separate
train -> test -> group-analysis launches (commands_list11_adhd.sh:7-24).
Here the same 120 points run as 20 fold-parallel training runs: the epochs
axis {50,500,1000} is snapshotted from one run to 1000, and the lr axis is
deduped under the reference's constant-effective-LR behavior (SURVEY.md Q1).

Measured (RESULTS.md): 189 s sweep body on one TPU v5e chip (plus the
one-time session attach, logged separately; 985 s -> 666 s -> 189 s across
round 2's optimizations) — vs ~47 h estimated for the reference's loop at
its measured per-fold-epoch cost (BASELINE.json["measured"]).

Usage: python scripts/run_adhd_sweep.py [workdir]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multi_modal_normative_modeling_tpu.cli import sweep_supervised
from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)


def main():
    workdir = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/adhd_sweep")
    workdir.mkdir(parents=True, exist_ok=True)
    if not (workdir / "data" / "ADHD" / "y.csv").exists():
        # DIA=2 subjects included: the reference's ADHD analysis iterates the
        # label pairs [2,0],[2,1],[1,0] (group_analysis_1x1.py:337-339)
        make_synthetic_resource(workdir, "ADHD", n_hc=500,
                                n_disease={0: 250, 2: 150}, effect=1.0)

    t0 = time.perf_counter()
    import os

    os.chdir(workdir)
    records = sweep_supervised.run([
        "-R", "ADHD", "-K", "10",
        "--procedures", "SM-sMRI", "SM-fMRI", "SE-MoE", "SE-PoE", "SE-gPoE",
        "--epochs_list", "50", "500", "1000",
        "--lr_grid", "1e-4:5e-3,1e-5:5e-3",
        "--hz_grid", "110 110 10;230 230 20;110 110 110 10;460 460 40",
    ])
    wall = time.perf_counter() - t0
    print(f"ADHD grid: {len(records)} points in {wall:.1f}s")


if __name__ == "__main__":
    main()
