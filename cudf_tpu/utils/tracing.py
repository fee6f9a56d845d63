"""Tracing & per-node timing.

TPU-native equivalent of the reference's observability stack
(reference: CUDF_FUNC_RANGE NVTX ranges nvtx/ranges.hpp:50, cudf-polars
structlog node tracing dsl/tracing.py, Timer → polars .profile()
utils/timer.py).  Device-side ranges use jax.profiler traces/named scopes
(XPlane), host-side timing uses a context registry that the query engine
reports through ``LazyFrame.profile()``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List, Optional

import jax


class Tracer:
    def __init__(self):
        self.enabled = False
        self.records: List[tuple] = []

    @contextlib.contextmanager
    def range(self, name: str):
        """Host+device range: shows up in jax.profiler traces as a named
        scope and in the host timing log."""
        if not self.enabled:
            with jax.named_scope(name):
                yield
            return
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        self.records.append((name, time.perf_counter() - t0))

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = defaultdict(float)
        for name, dt in self.records:
            out[name] += dt
        return dict(out)

    def clear(self):
        self.records.clear()


tracer = Tracer()


@contextlib.contextmanager
def enable_tracing():
    prev = tracer.enabled
    tracer.enabled = True
    try:
        yield tracer
    finally:
        tracer.enabled = prev


def start_profiler_trace(logdir: str):
    """XPlane trace for xprof/tensorboard (jax.profiler)."""
    jax.profiler.start_trace(logdir)


def stop_profiler_trace():
    jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator: wrap a function in a trace range."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(*a, **k):
            with tracer.range(name):
                return fn(*a, **k)

        return wrapper

    return deco
