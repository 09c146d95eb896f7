"""Tests for the environment-diagnostics CLI (cli/doctor.py).

The reference has no equivalent (single-workstation eager torch); doctor is
a TPU-native operational subsystem, so the tests pin its contract directly:
section coverage, JSON output shape, exit codes, the killable-subprocess
device probe, and the project-layout check.
"""
import json

import pytest


@pytest.fixture(autouse=True)
def _local_cpu_probe(monkeypatch):
    # The device probe runs in a subprocess that honors JAX_PLATFORMS; the
    # image exports axon, which would route the probe through the tunnel.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")


def _run(argv, capsys):
    from multi_modal_normative_modeling_tpu.cli.doctor import (
        build_parser, main)

    rc = main(build_parser().parse_args(argv))
    return rc, capsys.readouterr().out


def test_doctor_json_sections_and_exit(capsys):
    rc, out = _run(["--no-attach", "--json"], capsys)
    results = json.loads(out)
    sections = {r["section"] for r in results}
    assert {"versions", "platform", "compile-cache",
            "native-fastcsv", "native-fastwrite"} <= sections
    statuses = {r["status"] for r in results}
    assert statuses <= {"OK", "WARN", "FAIL"}
    # On a healthy test image nothing should FAIL
    assert rc == 0
    assert "FAIL" not in statuses


def test_doctor_human_output(capsys):
    rc, out = _run(["--no-attach"], capsys)
    assert rc == 0
    assert "[OK  ]" in out
    assert "versions" in out


def test_doctor_attach_probe_local_cpu(capsys):
    rc, out = _run(["--json"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["attach"]["status"] == "OK"
    assert "local cpu" in results["attach"]["detail"]
    assert results["platform"]["status"] == "OK"
    assert "backend 'cpu'" in results["platform"]["detail"]


def test_doctor_probe_timeout_fails_cleanly(capsys):
    # a timeout the child cannot possibly meet must FAIL the platform
    # section (never hang doctor itself) and set the exit code
    rc, out = _run(["--json", "--attach-timeout", "0.01"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["platform"]["status"] == "FAIL"
    assert "blocked" in results["platform"]["detail"]
    assert rc == 1


def test_doctor_project_layout(tmp_path, capsys):
    good = tmp_path / "data" / "ADNI"
    good.mkdir(parents=True)
    (good / "y.csv").write_text("IID,Diagnosis\n1,1\n")
    (good / "av45.csv").write_text("IID,a\n1,0.5\n")
    rc, out = _run(["--no-attach", "--json", "--root", str(tmp_path)], capsys)
    results = [r for r in json.loads(out) if r["section"] == "project"]
    assert results and results[0]["status"] == "OK"
    assert "data/ADNI" in results[0]["detail"]
    assert rc == 0


def test_doctor_project_layout_missing_y(tmp_path, capsys):
    bad = tmp_path / "data" / "PPMI"
    bad.mkdir(parents=True)
    (bad / "dti.csv").write_text("IID,a\n1,0.5\n")
    rc, out = _run(["--no-attach", "--json", "--root", str(tmp_path)], capsys)
    results = [r for r in json.loads(out) if r["section"] == "project"]
    assert results and results[0]["status"] == "FAIL"
    assert "y.csv" in results[0]["detail"]
    assert rc == 1


def test_doctor_no_data_dir_warns_only(tmp_path, capsys):
    rc, out = _run(["--no-attach", "--json", "--root", str(tmp_path)], capsys)
    results = [r for r in json.loads(out) if r["section"] == "project"]
    assert results and results[0]["status"] == "WARN"
    assert rc == 0


def test_doctor_detects_sitecustomize_platform_trap(capsys):
    """When a startup hook pins jax_platforms (this image's TPU plugin
    sitecustomize) and JAX_PLATFORMS requests something else, doctor must
    surface the trap: vanilla processes resolve the hook's value, not the
    env var."""
    import os

    if ".axon_site" not in os.environ.get("PYTHONPATH", ""):
        pytest.skip("no platform-pinning sitecustomize on this machine")
    rc, out = _run(["--no-attach", "--json"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["platform-config"]["status"] == "WARN"
    assert "sitecustomize" in results["platform-config"]["detail"]
    assert "configure_jax_cache" in results["platform-config"]["detail"]
    # the probe itself re-asserts the env var, so the resolved backend is OK
    assert results["platform"]["status"] == "OK"
    assert rc == 0


@pytest.mark.slow
def test_doctor_mesh_check_good_geometry(capsys):
    rc, out = _run(["--no-attach", "--json", "--mesh-check", "2,2",
                    "--mesh-timeout", "600"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["mesh-check"]["status"] == "OK"
    assert "4 virtual devices" in results["mesh-check"]["detail"]
    assert rc == 0


@pytest.mark.slow
def test_doctor_ep_check_good_geometry(capsys):
    rc, out = _run(["--no-attach", "--json", "--ep-check", "2,2",
                    "--mesh-batch", "8", "--mesh-timeout", "600"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["ep-check"]["status"] == "OK"
    assert "expert-parallel" in results["ep-check"]["detail"]
    assert rc == 0


def test_doctor_ep_check_indivisible_modalities(capsys):
    """--ep-modalities 3 cannot shard over a 2-way modality axis: the
    preflight fails exactly as `train --ep_mesh 2,2` would on 3 modalities."""
    rc, out = _run(["--no-attach", "--json", "--ep-check", "2,2",
                    "--mesh-batch", "8", "--ep-modalities", "3",
                    "--mesh-timeout", "600"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["ep-check"]["status"] == "FAIL"
    assert "not divisible" in results["ep-check"]["detail"]
    assert rc == 1


def test_doctor_ep_check_dual_bank_gates(capsys):
    """--ep-dual-bank preflights nmpmcont's geometry: the EP axis is [2M],
    so modality axis 2 ACCEPTS 3 modalities (2M=6 divides — where the
    plain check refuses) and the 2-axis form is refused outright."""
    # arithmetic accept: don't spawn the child (mesh product 8 devices is
    # fine but slow) — use a failing fold count to stop after the gate we
    # care about passes... instead assert the REFUSAL cases, which stay in
    # the parent and are fast
    rc, out = _run(["--no-attach", "--json", "--ep-check", "1,4,1",
                    "--mesh-folds", "10", "--mesh-batch", "8",
                    "--ep-modalities", "3", "--ep-dual-bank"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["ep-check"]["status"] == "FAIL"
    assert "dual-bank axis 2M=6" in results["ep-check"]["detail"]
    assert rc == 1

    rc, out = _run(["--no-attach", "--json", "--ep-check", "2,2",
                    "--ep-modalities", "3", "--ep-dual-bank"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["ep-check"]["status"] == "FAIL"
    assert "3-axis F,M,D form" in results["ep-check"]["detail"]
    assert rc == 1


def test_doctor_ep_check_indivisible_folds(capsys):
    """F,M,D fold-axis divisibility fails fast in the parent (shared
    common.ep_mesh_divisibility), before any child subprocess spawns."""
    rc, out = _run(["--no-attach", "--json", "--ep-check", "3,2,2",
                    "--mesh-folds", "10", "--mesh-batch", "8"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["ep-check"]["status"] == "FAIL"
    assert "folds not divisible" in results["ep-check"]["detail"]
    assert rc == 1


def test_doctor_mesh_check_malformed_spec(capsys):
    rc, out = _run(["--no-attach", "--json", "--mesh-check", "junk"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["mesh-check"]["status"] == "FAIL"
    assert rc == 1


def test_doctor_mesh_check_wrong_axis_count(capsys):
    # parse_mesh requires 2 or 3 axes; the child exits nonzero with its
    # SystemExit message surfaced in the finding
    rc, out = _run(["--no-attach", "--json", "--mesh-check", "8",
                    "--mesh-timeout", "600"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["mesh-check"]["status"] == "FAIL"
    assert "2 or 3 axis sizes" in results["mesh-check"]["detail"]
    assert rc == 1


def test_doctor_mesh_check_catches_real_divisibility(capsys):
    """The preflight validates the REAL launch parameters (default folds=10,
    batch=256): a data axis that doesn't divide the batch fails exactly as
    `train --mesh 2,3` would."""
    rc, out = _run(["--no-attach", "--json", "--mesh-check", "2,3"], capsys)
    results = {r["section"]: r for r in json.loads(out)}
    assert results["mesh-check"]["status"] == "FAIL"
    assert "not divisible" in results["mesh-check"]["detail"]
    assert rc == 1
