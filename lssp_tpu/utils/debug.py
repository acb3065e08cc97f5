"""Numerics debugging aids (the framework's analog of the reference's
sanitizer/warning story, SURVEY §5: JAX determinism + NaN checks instead
of TSan — the code is data-race-free by construction under jit)."""
from __future__ import annotations

import contextlib


@contextlib.contextmanager
def nan_guard():
    """Raise at the first NaN produced inside jitted code (wraps
    ``jax_debug_nans``).  Use around a solve to localize breakdowns:

        with nan_guard():
            x, info = lt.solve(A, b, method="bicgstab")
    """
    import jax
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def check_finite(x, what: str = "array"):
    """Host-side assertion that a result is finite (cheap post-solve
    sanity check; the reference's equivalent is its hard `lssp_error`
    aborts, src/utils.cxx:114-135 — we raise instead)."""
    import numpy as np
    a = np.asarray(x)
    if not np.all(np.isfinite(a)):
        bad = int(np.sum(~np.isfinite(a)))
        raise FloatingPointError(
            f"{what} contains {bad} non-finite entries "
            f"(first at index {int(np.flatnonzero(~np.isfinite(a))[0])})")
    return x
