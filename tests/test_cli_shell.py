"""Shell-level integration: the repo-root drop-in scripts parse the reference
flag grammar and run end-to-end via subprocess (as commands_list*.sh invokes
them)."""
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from multi_modal_normative_modeling_tpu.data.synthetic import (
    make_synthetic_resource,
)

REPO = Path(__file__).resolve().parent.parent


def _run(script, argv, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_mmnm_tpu")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    result = subprocess.run(
        [sys.executable, str(REPO / script)] + argv,
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200,
    )
    assert result.returncode == 0, (
        f"{script} failed\nstdout: {result.stdout[-2000:]}\n"
        f"stderr: {result.stderr[-2000:]}"
    )
    return result


@pytest.mark.slow
def test_commands_list9_style_chain(tmp_path):
    """train -> test -> group analysis via the shell entry points with the
    exact commands_list9.sh flag spelling."""
    make_synthetic_resource(tmp_path, "ADNI", n_hc=45,
                            n_disease={0: 20, 1: 20}, effect=1.0)
    flags = ["-P", "SE-PoE", "-E", "10", "-Model", "cVAE_multimodal",
             "-K", "2", "-TrainingClass", "dm", "-H", "16", "16", "6"]
    _run("multimodal_kfold_train_cvae_supervised.py", flags, tmp_path)
    _run("multimodal_kfold_test_cvae_supervised.py",
         ["-P", "SE-PoE", "-K", "2", "-H", "16", "16", "6"], tmp_path)
    _run("multimodal_kfold_cvae_group_analysis_1x1.py", flags, tmp_path)

    auc_csv = np.loadtxt(tmp_path / "cvae_auc_and_std.csv", delimiter=",")
    assert auc_csv.shape == (3,)
    assert (tmp_path / "result_baseline" / "result_4.txt").exists()


@pytest.mark.slow
def test_wrapper_help_surfaces():
    for script in [
        "multimodal_kfold_train_cvae_supervised.py",
        "multimodal_kfold_test_cvae_supervised.py",
        "multimodal_kfold_cvae_group_analysis_1x1.py",
        "multimodal_kfold_cvae_nmpmcont.py",
        "multimodal_kfold_train_cvae_supervised_regression.py",
    ]:
        result = _run(script, ["--help"], REPO)
        assert "-P" in result.stdout or "--procedure" in result.stdout
    result = _run("multimodal_kfold_cvae_nmmlp.py", ["--help"], REPO)
    assert "train" in result.stdout
