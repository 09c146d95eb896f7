"""Profiling and timing instrumentation.

The reference has no tracing at all (progress is epoch prints); here:
  * ``trace(dir)``      — context manager around jax.profiler.trace: emits a
                          TensorBoard-loadable device trace for any region.
  * ``timed``/``Timer`` — wall-clock harness for the north-star metric;
                          forces completion through a host transfer (on the
                          remote-TPU tunnel, block_until_ready alone
                          under-synchronizes small outputs).
  * ``annotate(name)``  — TraceAnnotation for labeling regions inside jit
                          boundaries on the host timeline.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


def _force(value):
    """Force device work to completion (host transfer of one leaf)."""
    import jax

    leaves = jax.tree_util.tree_leaves(value)
    if leaves:
        np.asarray(leaves[-1])
    return value


class Timer:
    """Median-of-k wall-clock timer with warm-up, completion-forced."""

    def __init__(self, warmup: int = 1, repeats: int = 3):
        self.warmup = warmup
        self.repeats = repeats

    def measure(self, fn: Callable, *args, **kwargs) -> dict:
        for _ in range(self.warmup):
            _force(fn(*args, **kwargs))
        times = []
        for _ in range(self.repeats):
            t0 = time.perf_counter()
            _force(fn(*args, **kwargs))
            times.append(time.perf_counter() - t0)
        return {
            "median_s": float(np.median(times)),
            "min_s": float(np.min(times)),
            "times_s": times,
        }


def timed(fn: Callable, *args, warmup: int = 1, repeats: int = 3, **kwargs):
    """(result, stats) for one measured call after warm-up."""
    timer = Timer(warmup=warmup, repeats=repeats)
    stats = timer.measure(fn, *args, **kwargs)
    return fn(*args, **kwargs), stats
