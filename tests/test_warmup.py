"""--warmup_only: pre-seed the persistent compile cache for a sweep config.

Two fresh processes with a dedicated cache dir: the first warms, the second
must hit the warm path — it adds NO new cache entries (every lookup is a hit)
and compiles markedly faster.
"""
import os
import re
import subprocess
import sys
from pathlib import Path

from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)

REPO = Path(__file__).resolve().parents[1]


def _run_warmup(root, cache_dir):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "MMNM_JAX_CACHE": str(cache_dir),
        "PYTHONPATH": str(REPO),
    })
    out = subprocess.run(
        [sys.executable, str(REPO / "multimodal_kfold_train_cvae_supervised.py"),
         "-R", "ADNI", "-P", "SE-gPoE", "-E", "5", "-K", "2",
         "-H", "12", "12", "4", "--fold_parallel", "--warmup_only"],
        cwd=root, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    m = re.search(r"compiled in ([0-9.]+)s", out.stdout)
    assert m, out.stdout
    return float(m.group(1))


def test_warmup_preseeds_persistent_cache(tmp_path):
    root = tmp_path / "proj"
    root.mkdir()
    make_synthetic_resource(root, "ADNI", n_hc=30, n_disease={0: 10, 1: 10})
    cache = tmp_path / "cache"

    cold = _run_warmup(root, cache)
    entries_after_first = set(p.name for p in cache.rglob("*") if p.is_file())
    assert entries_after_first, "warmup produced no cache entries"

    warm = _run_warmup(root, cache)
    entries_after_second = set(p.name for p in cache.rglob("*")
                               if p.is_file())
    # the warm process added no new entries: every compile was a cache hit.
    # That set equality IS the preseeding proof; the wall-clock comparison is
    # only a sanity bound (a strict warm < cold flaked when the full suite
    # saturated the box and the second process ran under heavier load).
    assert entries_after_second == entries_after_first
    assert warm < cold * 1.5, (cold, warm)
