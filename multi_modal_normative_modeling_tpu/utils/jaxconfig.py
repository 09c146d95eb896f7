"""Process-wide JAX configuration for the CLIs.

Enables the persistent compilation cache: grid-search drivers
(commands_list*.sh) re-run identical program shapes dozens of times, and on
the remote-TPU path a single whole-fold train program can take minutes to
compile — caching it makes every subsequent sweep point start in seconds.

Override the location with MMNM_JAX_CACHE; disable with MMNM_JAX_CACHE=0.
"""
from __future__ import annotations

import os

_configured = False


def resolve_cache_dir():
    """Persistent-compile-cache location, or None when disabled — the ONE
    place the MMNM_JAX_CACHE default/sentinel logic lives (doctor diagnoses
    the same path the runtime reads)."""
    cache_dir = os.environ.get("MMNM_JAX_CACHE",
                               os.path.expanduser("~/.cache/mmnm_jax"))
    return None if cache_dir in ("0", "", "off") else cache_dir


def configure_jax_cache() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    # Honor an explicit JAX_PLATFORMS env var: this image's TPU plugin
    # sitecustomize overrides jax_platforms via jax.config at interpreter
    # start, which silently beats the env var (e.g. subprocess tests that
    # request CPU would otherwise run on the remote TPU).
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        # Keep the host 'cpu' backend registered alongside the requested
        # platform (this image exports JAX_PLATFORMS=axon while its
        # sitecustomize sets 'axon,cpu'): the default backend is the FIRST
        # entry, and init-time eager ops run on the local cpu backend
        # instead of paying ~0.4s remote compiles each (host_init_params).
        plats = [p.strip() for p in want.split(",") if p.strip()]
        if "cpu" not in plats:
            plats.append("cpu")
        try:
            jax.config.update("jax_platforms", ",".join(plats))
        except Exception:
            pass

    cache_dir = resolve_cache_dir()
    if cache_dir is None:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: on the remote-compile path even trivial eager
        # ops cost ~0.4s to compile, so the usual >=1s threshold would leave
        # dozens of per-run recompiles on the table
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def no_compile_cache():
    """Context manager: compile without touching the persistent cache.

    Used around the CPU-local init helpers (common.host_init_params /
    host_prng_key): their compiles are milliseconds, but persisting them
    fills the cache with XLA:CPU AOT entries whose feature-flag stamp never
    matches the host's runtime detection (XLA adds prefer-no-gather/scatter
    pseudo-features at compile time only), so every later load spams
    multi-KB cpu_aot_loader ERROR lines into user-facing CLI output."""
    import contextlib

    import jax

    @contextlib.contextmanager
    def _ctx():
        prev = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", None)
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    return _ctx()


_warm_thread = None
# measured duration of the one-time remote session attach (set by the
# warm_device_session thread once it completes; None until then)
attach_seconds = None


def warm_device_session() -> None:
    """Fire-and-forget a tiny op on the default backend so the remote device
    session attaches WHILE host-side prep runs.

    On the remote-TPU tunnel the first execution in a process carries the
    whole session-establishment cost — measured from ~0.4 s (healthy) up to
    several hundred seconds when the service is degraded — and it is paid
    exactly once per process. Every data-path CLI calls this right after
    argument parsing, so the attach overlaps CSV loading/scaling instead of
    serializing in front of the first training/inference dispatch. The
    measured attach time is logged on 'mmnm.device' (warning above 30 s so
    operators can tell service degradation from framework cost)."""
    global _warm_thread
    if _warm_thread is not None:
        return

    import logging
    import threading
    import time

    log = logging.getLogger("mmnm.device")

    def _attach():
        global attach_seconds
        t0 = time.perf_counter()
        try:
            import jax

            if jax.default_backend() == "cpu":
                # no remote session exists; executing (and persist-caching)
                # a warm op here would only seed cpu_aot_loader load spam
                log.info("local cpu backend: no remote session to attach")
                return
            import jax.numpy as jnp
            import numpy as np

            np.asarray(jnp.zeros((1,), jnp.float32))
        except Exception as exc:  # pragma: no cover - depends on backend
            log.info("device session warmup failed: %r", exc)
            return
        dt = time.perf_counter() - t0
        attach_seconds = dt
        level = log.warning if dt > 30 else log.info
        level("device session attached in %.1fs (overlapped with host prep)",
              dt)

    _warm_thread = threading.Thread(target=_attach, daemon=True,
                                    name="mmnm-device-warmup")
    _warm_thread.start()
