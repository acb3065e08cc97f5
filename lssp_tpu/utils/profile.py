"""Profiling hooks (the TPU analog of the reference's wall-clock timers,
SURVEY §5: jax.profiler traces + derived bandwidth counters)."""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (open in TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the xprof timeline)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


def spmv_counters(A, seconds: float, iters: int = 1) -> dict:
    """Derived throughput counters for an SpMV-dominated phase — nnz/s and
    effective GB/s under the standard traffic model (values + indices read
    once, x read once, y written once).  These are the BASELINE.md metrics
    the reference could not measure."""
    nnz = int(A.nnz)
    n = int(A.shape[0])
    itemsize = getattr(A.dtype, "itemsize", 8)
    bytes_per = nnz * itemsize + nnz * 4 + 2 * n * itemsize
    t = seconds / max(1, iters)
    return {"nnz_per_s": nnz / t, "gbytes_per_s": bytes_per / t / 1e9,
            "seconds_per_iter": t}
