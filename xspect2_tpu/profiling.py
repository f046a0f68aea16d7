"""Profiling/observability subsystem.

The reference has no tracing at all (SURVEY §5); here per-phase wall
timers (parse / pack / transfer / kernel / collective / SVM) are a
first-class subsystem, plus optional JAX device profiling.

Usage::

    from xspect2_tpu.profiling import phase, report, trace
    with phase("parse"):
        ...
    with trace("/tmp/jax-trace"):   # XLA device trace (TensorBoard format)
        ...
    print(report())
"""

import contextlib
import json
import time
from collections import defaultdict

_totals: dict[str, float] = defaultdict(float)
_counts: dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall time under a named phase."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _totals[name] += time.perf_counter() - t0
        _counts[name] += 1


def add(name: str, seconds: float) -> None:
    """Record an externally measured duration."""
    _totals[name] += seconds
    _counts[name] += 1


def reset() -> None:
    _totals.clear()
    _counts.clear()


def report() -> dict:
    """Phase totals: {phase: {seconds, calls}}."""
    return {
        name: {"seconds": round(_totals[name], 6), "calls": _counts[name]}
        for name in sorted(_totals)
    }


def report_json() -> str:
    return json.dumps(report(), indent=2)


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX device profiler trace (viewable in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
