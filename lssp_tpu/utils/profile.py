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


def enable_persistent_cache(warn=True):
    """Point XLA's persistent compilation cache at ``$LSSP_XLA_CACHE``
    (default ~/.cache/lssp_tpu_xla) so first-touch compiles amortize
    across processes — the shared protocol of bench.py and
    benchmarks/acceptance.py.  Returns the cache dir, or None when the
    cache could not be configured (warned on stderr unless warn=False)."""
    import os
    import sys
    import jax
    cache_dir = os.environ.get("LSSP_XLA_CACHE",
                               os.path.expanduser("~/.cache/lssp_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception as e:                                # noqa: BLE001
        if warn:
            print(f"warning: compilation cache unavailable: {e}",
                  file=sys.stderr)
        return None


# --- setup-phase itemization -------------------------------------------------
# The reference times assemble and PC-assemble separately
# (/root/reference/src/lssp.cxx:162-184, /root/reference/src/pc.cxx:83-236);
# prepare_ir/assemble fill this ledger so harnesses can itemize where setup
# wall-clock goes (reorder+convert vs device upload vs PC factor).

_phase_times: dict = {}
_phase_bytes: dict = {}


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall-clock for a named setup phase into the ledger."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _phase_times[name] = (_phase_times.get(name, 0.0)
                              + time.perf_counter() - t0)


def add_bytes(name: str, nbytes: int) -> None:
    """Attribute ``nbytes`` of host→device transfer to a phase.  Lets the
    harnesses normalize the remote-attach tunnel out of setup accounting
    (VERDICT r4 #6): a phase's tunnel component = bytes / measured link
    rate, and what remains is genuine host/device compute."""
    _phase_bytes[name] = _phase_bytes.get(name, 0) + int(nbytes)


def tree_device_bytes(tree) -> int:
    """Total bytes of the array leaves of a pytree (device or host — the
    committed execution state that must cross the link once)."""
    import jax
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        nb = getattr(leaf, "nbytes", None)
        if nb is not None:
            total += int(nb)
    return total


def reset_phases() -> None:
    _phase_times.clear()
    _phase_bytes.clear()


def phase_times() -> dict:
    """Snapshot of the accumulated {phase: seconds} ledger."""
    return dict(_phase_times)


def phase_bytes() -> dict:
    """Snapshot of the accumulated {phase: bytes-uploaded} ledger."""
    return dict(_phase_bytes)
