"""bench.py multi-window floor protocol (round 4): floors are the min over
>=2 separate device sessions, with per-window values + spread emitted, so
cross-round comparisons are best-window-vs-best-window by construction
(round 3 measured ~2x device-side throughput variance across windows on the
identical cached executable — RESULTS.md round-3 addendum)."""
import json

import bench


def _fake_window(jax_seconds, ppmi_us, flag_us, mfu):
    return {
        "jax_seconds": jax_seconds,
        "attach_seconds": 0.4,
        "platform": "tpu",
        "floor": {
            "flagship_5fold_us_per_step": flag_us,
            "flagship_mfu_pct": mfu,
            "ppmi_us_per_step": ppmi_us,
            "ppmi_us_per_subject": round(ppmi_us / 256, 3),
            "ppmi_mfu_pct": round(100.0 / ppmi_us, 2),
            "peak_tflops_assumed_fp32": 49.2,
        },
    }


def test_bench_multiwindow_min_over_windows(monkeypatch, capsys):
    fakes = [_fake_window(2.0, 290.0, 150.0, 10.0),
             _fake_window(1.5, 145.0, 130.0, 12.0)]
    calls = []

    def fake_measure(timeout_s, force_cpu=False):
        calls.append(force_cpu)
        return fakes[len(calls) - 1], None

    monkeypatch.setattr(bench, "_measure_in_subprocess", fake_measure)
    monkeypatch.setenv("MMNM_BENCH_WINDOWS", "2")
    monkeypatch.setenv("MMNM_BENCH_WINDOW_GAP_S", "0")
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert calls == [False, False]
    d = out["detail"]
    # headline rides the best window
    assert d["jax_5fold_seconds"] == 1.5
    # combined floor: per-step mins, MFU maxes
    assert d["floor"]["ppmi_us_per_step"] == 145.0
    assert d["floor"]["flagship_5fold_us_per_step"] == 130.0
    assert d["floor"]["flagship_mfu_pct"] == 12.0
    # per-window detail + spread make window luck visible
    assert len(d["floor_windows"]) == 2
    assert d["ppmi_floor_window_spread"] == 2.0
    assert out["vs_baseline"] > 0


def test_bench_window_timeout_falls_back_to_cpu(monkeypatch, capsys):
    """First window timing out (dead tunnel) short-circuits the remaining
    windows and lands on the flagged local-CPU fallback."""
    calls = []

    def fake_measure(timeout_s, force_cpu=False):
        calls.append(force_cpu)
        if not force_cpu:
            return None, "timeout"
        return _fake_window(40.0, 5000.0, 4000.0, 0.5), None

    monkeypatch.setattr(bench, "_measure_in_subprocess", fake_measure)
    monkeypatch.setenv("MMNM_BENCH_WINDOWS", "3")
    monkeypatch.setenv("MMNM_BENCH_WINDOW_GAP_S", "0")
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # exactly ONE device attempt (no 3x timeout burn), then the cpu leg
    assert calls == [False, True]
    assert "tunnel_unreachable" in out["detail"]
    assert out["detail"]["jax_5fold_seconds"] == 40.0
    assert len(out["detail"]["floor_windows"]) == 1


def test_bench_partial_window_failure_keeps_good_windows(monkeypatch,
                                                         capsys):
    """A non-timeout child failure in a LATER window keeps the earlier
    successful measurement and records the error."""
    calls = []

    def fake_measure(timeout_s, force_cpu=False):
        calls.append(force_cpu)
        if len(calls) == 1:
            return _fake_window(3.0, 300.0, 160.0, 9.0), None
        return None, "child failed: boom"

    monkeypatch.setattr(bench, "_measure_in_subprocess", fake_measure)
    monkeypatch.setenv("MMNM_BENCH_WINDOWS", "2")
    monkeypatch.setenv("MMNM_BENCH_WINDOW_GAP_S", "0")
    bench.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["detail"]["jax_5fold_seconds"] == 3.0
    assert out["detail"]["window_errors"] == ["child failed: boom"]
