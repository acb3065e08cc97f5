"""Checkpoint / resume.

The reference has none (SURVEY §5); its solvers support warm restart by
construction — x is read as the initial guess everywhere (r0 = b − A·x,
/root/reference/src/solver-cg.cxx:59) and factorizations are cached behind
``factored`` flags (solver-umfpack.cxx:43-44).  This module makes that
durable: Krylov state is tiny (x), so a checkpoint is the solution vector
plus metadata; preconditioner state (ILU/LU factors, level schedules, AMG
hierarchies, ARMS levels) is a pytree of arrays and round-trips losslessly.

File format: an 8-byte magic (``LSSPCKPT``), a format-version word, a crc32
of the payload, then a ``pickle`` of the payload with device arrays
converted to numpy — every ``apply_fn`` in the framework is a module-level
function (or a ``functools.partial`` of one), so Preconditioner objects
serialize by reference without any custom machinery.  The version gate and
checksum make a truncated/corrupted or format-bumped file fail loudly
instead of resuming from garbage.

.. warning:: **Trust boundary.** The payload is pickle: loading executes
   arbitrary code embedded in the file.  Only load checkpoints you wrote —
   never from untrusted storage or network paths.  (``checkpointed_solve``
   auto-loads any existing file at ``path``; point it at a directory you
   control.)
"""
from __future__ import annotations

import pickle
import struct
import zlib
from typing import Any, Optional

import jax
import numpy as np

_MAGIC = b"LSSPCKPT"
FORMAT_VERSION = 1


def _to_host(tree):
    return jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, tree)


def _to_device(tree):
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a, tree)


def save_checkpoint(path: str, x=None, M=None, info=None, **extra) -> None:
    """Write a checkpoint: current iterate ``x`` (warm-restart state),
    optional preconditioner ``M`` (factors survive the round trip, so
    resume skips re-factorization), optional ``SolveInfo`` and any extra
    pytrees (e.g. ``b``, solver options)."""
    payload = {"x": _to_host(x) if x is not None else None,
               "M": _to_host(M) if M is not None else None,
               "info": _to_host(info) if info is not None else None,
               "extra": _to_host(extra)}
    body = pickle.dumps(payload, protocol=pickle.HIGHEST_PROTOCOL)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", FORMAT_VERSION, zlib.crc32(body)))
        f.write(body)


def load_checkpoint(path: str, device: bool = True) -> dict:
    """Read a checkpoint written by ``save_checkpoint``.  Returns a dict
    with keys ``x``, ``M``, ``info`` and the extras; arrays are moved back
    to the default device unless ``device=False``.

    Raises ``ValueError`` on a missing magic header, a format-version
    mismatch, or a checksum failure — see the module docstring for the
    pickle trust boundary (only load files you wrote)."""
    with open(path, "rb") as f:
        head = f.read(len(_MAGIC) + 8)
        if len(head) < len(_MAGIC) + 8 or not head.startswith(_MAGIC):
            if head[:1] == b"\x80":
                # pre-v1 (unversioned bare-pickle) checkpoint: still
                # loadable so in-progress solves survive the format bump,
                # but warn — no integrity protection existed for it
                from lssp_tpu.utils.log import warning
                warning(f"{path!r} is a pre-v1 checkpoint (no integrity "
                        "header); loading legacy format — it will be "
                        "rewritten versioned on the next save")
                f.seek(0)
                payload = pickle.load(f)
                out = dict(payload.pop("extra", {}))
                out.update(payload)
                return _to_device(out) if device else out
            raise ValueError(
                f"{path!r} is not an lssp_tpu checkpoint (bad magic)")
        version, crc = struct.unpack("<II", head[len(_MAGIC):])
        if version != FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path!r} has format version {version}, this "
                f"build reads version {FORMAT_VERSION} — re-create it")
        body = f.read()
        if zlib.crc32(body) != crc:
            raise ValueError(
                f"checkpoint {path!r} failed its integrity check "
                "(truncated or corrupted); refusing to load")
        payload = pickle.loads(body)
    out = dict(payload.pop("extra", {}))
    out.update(payload)
    if device:
        out = _to_device(out)
    return out


def checkpointed_solve(A, b, path: str, every: int = 100, method="gmres",
                       pc: Optional[str] = "none", options=None,
                       pc_options=None, max_rounds: int = 1000):
    """Solve with periodic checkpointing: runs ``every`` iterations at a
    time, writing ``path`` after each round; if ``path`` exists, resumes
    from it (x and the factorized preconditioner are restored, so neither
    prior iterations nor setup cost are repeated)."""
    import dataclasses
    import os

    import jax.numpy as jnp

    from lssp_tpu import pc as pc_mod
    from lssp_tpu.config import SolverOptions
    from lssp_tpu.solvers.facade import solve

    opts = (options or SolverOptions()).resolved()
    x0, M = None, None
    done = 0
    tol0 = None
    if os.path.exists(path):
        ck = load_checkpoint(path)
        x0, M = ck["x"], ck["M"]
        done = int(ck.get("nits_done", 0))
        tol0 = ck.get("tol0")
    if M is None and pc not in (None, "none"):
        M = pc_mod.setup(A, pc, pc_options)

    if tol0 is None:
        # freeze the stopping threshold to the ORIGINAL r0 once: later
        # rounds would otherwise re-derive rtol·‖r_round0‖ from their own
        # (already reduced) start residual and over-solve
        bn = np.asarray(b, np.float64)
        r0 = bn if x0 is None else bn - A.to_scipy() @ np.asarray(x0, np.float64)
        tol0 = float(max(opts.rtol * np.linalg.norm(r0), opts.atol,
                         opts.rbtol * np.linalg.norm(bn)))

    total = 0
    info = None
    for _ in range(max_rounds):
        round_opts = dataclasses.replace(opts, maxit=every, atol=tol0,
                                         rtol=0.0, rbtol=0.0)
        x0, info = solve(A, b, x0=x0, method=method, M=M,
                         options=round_opts, reorder=None)
        total = done + int(info.nits)
        save_checkpoint(path, x=x0, M=M, info=info, nits_done=total,
                        tol0=tol0)
        if bool(info.converged) or int(info.nits) == 0:
            break
        done = total
    info = dataclasses.replace(info, nits=jnp.int32(total))
    return x0, info
