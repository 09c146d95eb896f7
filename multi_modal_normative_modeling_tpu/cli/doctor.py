"""Environment diagnostics (`mmnm-doctor`).

The reference has nothing like this (single workstation, eager torch); on
this framework's target environment a run's wall-clock is dominated by
things OUTSIDE the training math — remote device-session attach, platform
resolution (a TPU-plugin sitecustomize can silently override JAX_PLATFORMS),
persistent-compile-cache state, and the native CSV plane's build. `doctor`
checks each one and prints OK / WARN / FAIL lines so operators can tell
environment weather from framework regressions before launching a sweep.

Checks:
  * python / jax / key-dependency versions
  * platform resolution: JAX_PLATFORMS env vs the resolved default backend,
    device inventory (count, kind) for mesh sizing
  * device-session attach probe (timed tiny op in a killable subprocess;
    the first blocking execution in a process pays the whole attach —
    0.4 s healthy, hundreds of seconds degraded)
  * persistent compile cache: location, entries, size, writability
  * native data plane: fastcsv / fastwrite build + engage status
  * mesh preflight (optional --mesh-check F,D[,M]): compile + run one
    fold-parallel train step over the exact --mesh geometry on virtual
    CPU devices — catches bad axis specs before real chips are queued
  * expert-parallel preflight (optional --ep-check M,D or F,M,D): same
    for an --ep_mesh geometry, one EP train epoch with --ep-modalities
    as the modality count the mesh must divide
  * project data layout (optional --root): data/<resource>/ with y.csv

Exit code 0 when nothing FAILs (WARNs allowed), 1 otherwise.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path

OK, WARN, FAIL = "OK", "WARN", "FAIL"


def _finding(results, section, status, detail):
    results.append({"section": section, "status": status, "detail": detail})


def check_versions(results):
    import jax

    try:
        import jaxlib

        jaxlib_v = getattr(jaxlib, "__version__", "?")
    except Exception:  # pragma: no cover - jaxlib ships with jax
        jaxlib_v = "?"
    detail = (f"python {sys.version.split()[0]}, jax {jax.__version__}, "
              f"jaxlib {jaxlib_v}")
    missing = []
    for name in ("flax", "optax", "numpy", "pandas"):
        try:
            mod = __import__(name)
            detail += f", {name} {getattr(mod, '__version__', '?')}"
        except Exception:
            missing.append(name)
            _finding(results, "versions", FAIL, f"{name} not importable")
    if not missing:
        _finding(results, "versions", OK, detail)


# The device probe runs in a SUBPROCESS: on the remote-TPU path both backend
# initialization (jax.devices()) and the first blocking execution can hang
# for the whole session attach (measured 300-900s in degraded windows), and
# jax's atexit teardown then blocks the parent too — an in-process thread
# with a timeout cannot protect doctor from either. A killable child can.
_PROBE_CHILD = r"""
import json, os, sys, time
want = os.environ.get("JAX_PLATFORMS")
import jax
# What a VANILLA process would resolve: a sitecustomize may have written
# jax_platforms via jax.config at interpreter start, which silently beats
# the env var — record it BEFORE re-asserting so the parent can diagnose
# the trap without initializing a second backend.
try:
    configured = jax.config.jax_platforms
except Exception:
    configured = None
if want:
    # honor the env var against the sitecustomize jax.config override
    plats = [p.strip() for p in want.split(",") if p.strip()]
    if "cpu" not in plats:
        plats.append("cpu")
    try:
        jax.config.update("jax_platforms", ",".join(plats))
    except Exception:
        pass
out = {"configured_platforms": configured}
t0 = time.perf_counter()
devices = jax.devices()
out["devices_seconds"] = round(time.perf_counter() - t0, 3)
out["backend"] = jax.default_backend()
out["n_devices"] = len(devices)
out["kinds"] = sorted({d.device_kind for d in devices})
if "--attach" in sys.argv:
    import numpy as np
    import jax.numpy as jnp
    t0 = time.perf_counter()
    # np.asarray forces a host transfer: block_until_ready alone
    # under-synchronizes small outputs through the tunnel
    np.asarray(jnp.zeros((1,), jnp.float32))
    out["attach_seconds"] = round(time.perf_counter() - t0, 3)
print(json.dumps(out))
"""


def check_device(results, timeout_s: float, attach: bool):
    """Resolve the backend + device inventory and time the session attach."""
    import subprocess

    argv = [sys.executable, "-c", _PROBE_CHILD]
    if attach:
        argv.append("--attach")
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(argv, capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _finding(results, "platform", FAIL,
                 f"device probe still blocked after "
                 f"{time.perf_counter() - t0:.0f}s (backend init or session "
                 "attach; healthy ~0.4s, degraded windows measured at "
                 "300-900s — treat wall-clock from this window as tunnel "
                 "weather)")
        return
    if proc.returncode != 0:
        _finding(results, "platform", FAIL,
                 "device probe failed: "
                 + (proc.stderr or proc.stdout).strip()[-300:])
        return
    probe = json.loads(proc.stdout.strip().splitlines()[-1])

    want = os.environ.get("JAX_PLATFORMS", "")
    backend = probe["backend"]
    detail = (f"default backend '{backend}', {probe['n_devices']} device(s) "
              f"{probe['kinds']}; JAX_PLATFORMS={want or '(unset)'}")
    want_first = want.split(",")[0].strip().lower() if want else ""
    configured = (probe.get("configured_platforms") or "")
    conf_first = configured.split(",")[0].strip().lower()
    if want_first and conf_first and conf_first != want_first:
        # the sitecustomize-override trap (see utils/jaxconfig.py): a
        # VANILLA process resolves jax.config's value, not the env var —
        # work the caller believes is local silently runs elsewhere. This
        # framework's entry points re-assert the env var
        # (configure_jax_cache), which is what the probe measured below.
        _finding(results, "platform-config", WARN,
                 f"a startup hook (sitecustomize) set "
                 f"jax_platforms='{configured}', which beats "
                 f"JAX_PLATFORMS={want} in plain python processes — only "
                 "code calling utils.jaxconfig.configure_jax_cache() (all "
                 "mmnm CLIs and the cVAE.py facade) honors the env var")
    if want_first and want_first != backend:
        _finding(results, "platform", WARN,
                 detail + f" — env requests '{want_first}' but the resolved "
                 "backend differs even after re-asserting the env var")
    else:
        _finding(results, "platform", OK, detail)
    if probe["n_devices"] > 1:
        _finding(results, "mesh", OK,
                 f"{probe['n_devices']} devices available for --mesh axes "
                 f"(e.g. F,D with F*D <= {probe['n_devices']})")

    if not attach:
        return
    if backend == "cpu":
        _finding(results, "attach", OK,
                 "local cpu backend — no remote session to attach")
        return
    dt = probe["attach_seconds"]
    status = OK if dt < 30 else WARN
    _finding(results, "attach", status,
             f"device session attached in {dt:.2f}s"
             + ("" if dt < 30 else " — degraded window"))


def check_compile_cache(results):
    from ..utils.jaxconfig import resolve_cache_dir

    cache_dir = resolve_cache_dir()
    if cache_dir is None:
        _finding(results, "compile-cache", WARN,
                 "persistent compile cache DISABLED (MMNM_JAX_CACHE=0) — "
                 "every process recompiles; eager ops cost ~0.4s each on "
                 "the remote path")
        return
    path = Path(cache_dir)
    if not path.exists():
        _finding(results, "compile-cache", OK,
                 f"{cache_dir} (will be created on first compile)")
        return
    entries = list(path.glob("*"))
    size_mb = sum(f.stat().st_size for f in entries if f.is_file()) / 2**20
    writable = os.access(path, os.W_OK)
    status = OK if writable else FAIL
    _finding(results, "compile-cache", status,
             f"{cache_dir}: {len(entries)} entries, {size_mb:.0f} MB"
             + ("" if writable else " — NOT WRITABLE"))


def check_native(results):
    from ..native.fastcsv import fastcsv_available
    from ..native.fastwrite import fastwrite_available

    for name, probe in (("fastcsv", fastcsv_available),
                        ("fastwrite", fastwrite_available)):
        try:
            available = probe()
        except Exception as exc:
            _finding(results, f"native-{name}", WARN,
                     f"probe raised {exc!r} (pandas fallback active)")
            continue
        if available:
            _finding(results, f"native-{name}", OK, "built and loadable")
        else:
            _finding(results, f"native-{name}", WARN,
                     "unavailable (g++ build failed?) — the pandas "
                     "fallback is correct but ~6x slower on wide frames")


def check_project(results, root: Path):
    data_dir = root / "data"
    if not data_dir.exists():
        _finding(results, "project", WARN,
                 f"no data/ under {root} (run from a project root, or pass "
                 "--root)")
        return
    resources = sorted(p.name for p in data_dir.iterdir() if p.is_dir())
    if not resources:
        _finding(results, "project", WARN, f"{data_dir} has no resources")
        return
    for res in resources:
        y = data_dir / res / "y.csv"
        modalities = [p.name for p in (data_dir / res).glob("*.csv")
                      if p.name != "y.csv"]
        if y.exists() and modalities:
            _finding(results, "project", OK,
                     f"data/{res}: y.csv + {len(modalities)} modality "
                     "CSV(s)")
        else:
            _finding(results, "project", FAIL,
                     f"data/{res}: missing "
                     + ("y.csv" if not y.exists() else "modality CSVs"))


# Mesh preflight: compile + execute ONE fold-parallel train step over the
# EXACT --mesh geometry the user intends to launch with — on virtual CPU
# devices, so a bad axis spec / divisibility mistake / sharding bug
# surfaces in seconds instead of after queueing for real chips. Runs in a
# subprocess because the device count is fixed at backend init.
_MESH_CHILD = r"""
import json, sys, time
spec = sys.argv[1]
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (
    configure_jax_cache)
configure_jax_cache()  # honors JAX_PLATFORMS=cpu set by the parent
import jax
import numpy as np
from multi_modal_normative_modeling_tpu.cli import common
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.parallel import (
    MultiFoldTrainer, stack_fold_batches, stack_params)
from multi_modal_normative_modeling_tpu.train import TrainConfig

# validate the REAL launch parameters: the intended fold count and batch
# size, not synthesized always-divisible stand-ins — a divisibility
# mistake must fail here exactly as the real launch would
n_folds = int(sys.argv[2])
batch = int(sys.argv[3])
mesh, shardings_fn = common.parse_mesh(spec, n_folds=n_folds,
                                       batch_size=batch)
model = build_model("cVAE_multimodal", [16, 12], [8, 8], 4, 3, 2)
config = TrainConfig(epochs=1, batch_size=batch, combine="gpoe")
rng = np.random.default_rng(0)
folds = [([rng.normal(size=(batch, d)).astype(np.float32)
           for d in (16, 12)],
          [rng.normal(size=(batch, 3)).astype(np.float32)] * 2)
         for _ in range(n_folds)]
params = common.host_init_params(model)
stacked = stack_params([params] * n_folds)
batches = stack_fold_batches([f[0] for f in folds], [f[1] for f in folds],
                             batch)
keys = np.stack([common.host_prng_key(f) for f in range(n_folds)])
t0 = time.perf_counter()
trainer = MultiFoldTrainer(model, config, batch, mesh=mesh,
                           shardings_fn=shardings_fn)
out, logs = trainer.run(stacked, batches, keys)
total = np.asarray(logs["total"])
assert np.isfinite(total).all()
print(json.dumps({"ok": True, "n_devices": jax.device_count(),
                  "n_folds": n_folds,
                  "seconds": round(time.perf_counter() - t0, 1)}))
"""


# Expert-parallel preflight: same idea for --ep_mesh M,D / F,M,D — one EP
# train epoch over the exact geometry (modality count included, since the
# modality axis must divide it) on virtual CPU devices.
_EP_CHILD = r"""
import json, sys, time
spec = sys.argv[1]
from multi_modal_normative_modeling_tpu.utils.jaxconfig import (
    configure_jax_cache)
configure_jax_cache()  # honors JAX_PLATFORMS=cpu set by the parent
import jax
import numpy as np
from multi_modal_normative_modeling_tpu.cli import common
from multi_modal_normative_modeling_tpu.models import build_model
from multi_modal_normative_modeling_tpu.train import TrainConfig

n_folds = int(sys.argv[2])
batch = int(sys.argv[3])
modalities = int(sys.argv[4])
sizes = common.parse_axis_sizes(
    spec, "--ep-check", (2, 3),
    "4,2 (modality,data) or 2,2,2 (fold,modality,data)")
dims = [12 + 4 * (m % 3) for m in range(modalities)]
model = build_model("cVAE_multimodal", dims, [8, 8], 4, 3, modalities)
config = TrainConfig(epochs=1, batch_size=batch, combine="gpoe")
rng = np.random.default_rng(0)
params = common.host_init_params(model)
t0 = time.perf_counter()
if len(sizes) == 2:
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        EPFoldTrainer, make_ep_mesh)
    mesh = make_ep_mesh(n_modality=sizes[0], n_data=sizes[1])
    trainer = EPFoldTrainer(model, config, batch, mesh)
    data = [rng.normal(size=(batch, d)).astype(np.float32) for d in dims]
    cov = rng.normal(size=(batch, 3)).astype(np.float32)
    _, logs = trainer.run(params, data, cov)
    total = np.asarray(logs["total"])
else:
    from multi_modal_normative_modeling_tpu.parallel.modality import (
        make_ep_mesh3, packed_fold_shardings)
    from multi_modal_normative_modeling_tpu.train.packed import (
        PackedMultiFoldTrainer)
    mesh = make_ep_mesh3(n_fold=sizes[0], n_modality=sizes[1],
                         n_data=sizes[2])
    trainer = PackedMultiFoldTrainer(model, config, batch, mesh=mesh,
                                     shardings_fn=packed_fold_shardings)
    folds = [([rng.normal(size=(batch, d)).astype(np.float32)
               for d in dims],
              [rng.normal(size=(batch, 3)).astype(np.float32)]
              * modalities) for _ in range(n_folds)]
    keys = [common.host_prng_key(f) for f in range(n_folds)]
    _, per_fold_logs = trainer.run([params] * n_folds, folds, keys)
    total = np.asarray([lg["total"] for lg in per_fold_logs])
assert np.isfinite(total).all()
print(json.dumps({"ok": True, "n_devices": jax.device_count(),
                  "modalities": modalities,
                  "seconds": round(time.perf_counter() - t0, 1)}))
"""


def _parse_preflight_axes(results, section: str, flag: str, spec: str,
                          usage: str):
    """Axis-size spec -> list[int], or None after reporting a FAIL."""
    try:
        sizes = [int(s)
                 for s in str(spec).replace("x", ",").split(",") if s]
        if not sizes or any(s < 1 for s in sizes):
            raise ValueError
    except ValueError:
        _finding(results, section, FAIL,
                 f"{flag} {spec!r}: expected comma-separated positive "
                 f"axis sizes, e.g. {usage}")
        return None
    return sizes


def _run_preflight(results, section: str, what: str, child_src: str,
                   spec: str, extra_argv, n_devices: int, timeout_s: float,
                   ok_detail):
    """Run a preflight child over `n_devices` virtual CPU devices and
    report `section`; `ok_detail(probe)` renders the OK line from the
    child's JSON. Shared by --mesh-check and --ep-check so their
    subprocess/timeout/error handling cannot drift."""
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # virtual devices so the geometry is testable without the real chips
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (flags + " "
                        f"--xla_force_host_platform_device_count"
                        f"={n_devices}").strip()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", child_src, str(spec),
             *[str(a) for a in extra_argv]],
            capture_output=True, text=True, env=env, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _finding(results, section, FAIL,
                 f"{what} {spec} preflight still compiling after "
                 f"{timeout_s:.0f}s")
        return
    out_lines = (proc.stdout or "").strip().splitlines()
    if proc.returncode != 0 or not out_lines:
        tail = ((proc.stderr or proc.stdout or "").strip().splitlines()
                or ["no output"])
        _finding(results, section, FAIL,
                 f"{what} {spec} preflight failed: "
                 + " | ".join(tail[-3:])[-400:])
        return
    _finding(results, section, OK, ok_detail(json.loads(out_lines[-1])))


def check_ep_mesh(results, spec: str, timeout_s: float, n_folds: int,
                  batch_size: int, modalities: int,
                  dual_bank: bool = False):
    sizes = _parse_preflight_axes(results, "ep-check", "--ep-check", spec,
                                  "4,2 or 2,2,2")
    if sizes is None:
        return
    if dual_bank and len(sizes) != 3:
        _finding(results, "ep-check", FAIL,
                 f"ep mesh {spec}: the packed dual-bank endtoend trainer "
                 "takes the 3-axis F,M,D form (nmpmcont --ep_mesh)")
        return
    if len(sizes) in (2, 3):
        # pure-arithmetic launch gates (shared with `train --ep_mesh` /
        # `nmpmcont --ep_mesh`): fail them here without paying the
        # child's framework import
        from .common import ep_mesh_divisibility

        reason = ep_mesh_divisibility(
            sizes, n_folds, batch_size, modalities,
            modality_axis_len=(2 * modalities if dual_bank else None),
            modality_axis_desc=("dual-bank axis 2M" if dual_bank
                                else None))
        if reason:
            _finding(results, "ep-check", FAIL, f"ep mesh {spec}: {reason}")
            return
    # dual-bank execution leg: a [2M]-expert program over the same mesh is
    # the geometry the nmpmcont trainer shards (each device group holds
    # slices of BOTH banks), so the cvae child with 2M experts validates
    # launchability without a second child
    child_m = 2 * modalities if dual_bank else modalities
    axis_word = "dual-bank experts (2M)" if dual_bank else "modalities"
    _run_preflight(
        results, "ep-check", "ep mesh", _EP_CHILD, spec,
        [n_folds, batch_size, child_m],
        n_devices=math.prod(sizes), timeout_s=timeout_s,
        ok_detail=lambda probe: (
            f"ep mesh {spec} compiled + ran one expert-parallel train "
            f"epoch on {probe['n_devices']} virtual devices "
            f"({probe['modalities']} {axis_word}, batch {batch_size}, "
            f"{probe['seconds']}s) — geometry is launchable"))


def check_mesh(results, spec: str, timeout_s: float, n_folds: int,
               batch_size: int):
    sizes = _parse_preflight_axes(results, "mesh-check", "--mesh-check",
                                  spec, "2,4 or 2,2,2")
    if sizes is None:
        return
    _run_preflight(
        results, "mesh-check", "mesh", _MESH_CHILD, spec,
        [n_folds, batch_size],
        n_devices=math.prod(sizes), timeout_s=timeout_s,
        ok_detail=lambda probe: (
            f"mesh {spec} compiled + ran one fold-parallel train step on "
            f"{probe['n_devices']} virtual devices ({probe['n_folds']} "
            f"folds, batch {batch_size}, {probe['seconds']}s) — geometry "
            "is launchable"))


def main(args):
    from ..utils.jaxconfig import configure_jax_cache

    configure_jax_cache()

    results = []
    check_versions(results)
    check_device(results, timeout_s=args.attach_timeout,
                 attach=not args.no_attach)
    check_compile_cache(results)
    check_native(results)
    if args.mesh_check:
        check_mesh(results, args.mesh_check, timeout_s=args.mesh_timeout,
                   n_folds=args.mesh_folds, batch_size=args.mesh_batch)
    if args.ep_check:
        check_ep_mesh(results, args.ep_check, timeout_s=args.mesh_timeout,
                      n_folds=args.mesh_folds, batch_size=args.mesh_batch,
                      modalities=args.ep_modalities,
                      dual_bank=args.ep_dual_bank)
    if args.root:
        check_project(results, Path(args.root))

    if args.json:
        print(json.dumps(results, indent=1))
    else:
        width = max(len(r["section"]) for r in results)
        for r in results:
            print(f"[{r['status']:<4}] {r['section']:<{width}}  "
                  f"{r['detail']}")
    failed = any(r["status"] == FAIL for r in results)
    return 1 if failed else 0


def build_parser():
    parser = argparse.ArgumentParser(
        prog="mmnm-doctor",
        description="Diagnose the runtime environment (platform, device "
                    "attach, compile cache, native plane, project layout).")
    parser.add_argument("--root", default=None,
                        help="project root to check for data/<resource>/ "
                             "layout (default: skip the project check)")
    parser.add_argument("--no-attach", action="store_true",
                        help="skip the timed device-attach execution (the "
                             "backend/device inventory probe still runs)")
    parser.add_argument("--attach-timeout", type=float, default=60.0,
                        help="seconds to wait for the device probe "
                             "subprocess before reporting FAIL (default 60)")
    parser.add_argument("--mesh-check", default=None, metavar="F,D[,M]",
                        help="preflight a --mesh geometry: compile + run one "
                             "fold-parallel train step over it on virtual "
                             "CPU devices (no real chips needed)")
    parser.add_argument("--ep-check", default=None, metavar="M,D|F,M,D",
                        help="preflight an --ep_mesh geometry: compile + "
                             "run one expert-parallel train epoch over the "
                             "exact mesh on virtual CPU devices (uses "
                             "--mesh-folds/--mesh-batch/--ep-modalities as "
                             "the launch parameters)")
    parser.add_argument("--ep-modalities", type=int, default=4,
                        help="modality count the --ep-check geometry must "
                             "divide (default 4 — UCA on a 3-modality "
                             "resource)")
    parser.add_argument("--ep-dual-bank", action="store_true",
                        help="preflight for the packed dual-bank endtoend "
                             "trainer (nmpmcont --ep_mesh): its EP axis is "
                             "[2M], so the 'modality' axis must divide "
                             "2*modalities instead of modalities")
    parser.add_argument("--mesh-timeout", type=float, default=300.0,
                        help="seconds for the mesh preflight subprocess "
                             "(default 300; first compile dominates)")
    parser.add_argument("--mesh-folds", type=int, default=10,
                        help="fold count the mesh must serve (default 10 — "
                             "the trainers' -K default); divisibility is "
                             "validated like the real launch")
    parser.add_argument("--mesh-batch", type=int, default=256,
                        help="batch size the mesh must serve (default 256 — "
                             "the supervised trainer's); the data axis must "
                             "divide it")
    parser.add_argument("--json", action="store_true",
                        help="machine-readable output")
    return parser


def run():
    sys.exit(main(build_parser().parse_args()))


if __name__ == "__main__":
    run()
