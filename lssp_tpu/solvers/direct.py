"""Direct solve: x = x0 + M⁻¹(b − A·x0) with an exact-LU preconditioner.

Capability parity with the reference's direct-solver wrappers (UMFPACK
solver-umfpack.cxx:107-153, KLU solver-klu.cxx:8-41, SuperLU
solver-superlu.cxx:28-85, MUMPS solver-mumps.cxx:162-210, PARDISO
solver-pardiso.cxx:10-116), which all report nits=1 after one factored
solve.  The facade defaults ``pc="lu"`` for this method; through the
``Solver`` lifecycle the factorization is cached across right-hand sides
(the reference's ``factored`` flag, solver-umfpack.cxx:43-44).  Unlike the
reference (residual hardwired to 0, solver-umfpack.cxx:150) the true
residual is computed and reported.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lssp_tpu.solvers.base import SolveInfo, init_state, stopping_tol, vdot
from lssp_tpu.solvers.registry import register_solver


def solve_lsq(A, b, rtol: float = 1e-10, max_refine: int = 4,
              method: str = "qr"):
    """Direct least squares: min ‖Ax − b‖₂ for full-column-rank A.

    Capability parity with the reference's QR_MUMPS adapter
    (/root/reference/src/solver-qrmumps.cxx:10-84, sparse QR).

    ``method="qr"`` (default): host sparse QR (George–Heath Givens row
    merging, RCM column ordering — ``lssp_tpu/pc/qr_host.py``) with Qᵀb
    accumulated through the rotations, so the error scales with cond(A),
    not cond(A)² — ill-conditioned tall systems solve to full accuracy
    where normal equations fail.

    ``method="normal"``: the round-1 normal-equations route (AᵀA x = Aᵀb
    via the native sparse LU plus refinement) — faster for large
    well-conditioned systems.  For iterative least squares use
    ``solve(method="lsqr")``.

    Returns (x, residual_norm) with residual = ‖Aᵀ(b − Ax)‖ (the
    least-squares optimality measure).

    Rank-deficient systems do not error — empty columns get unit diagonals
    (QR) / near-zero pivots are clamped (LU), yielding *a* least-squares
    solution.  Underdetermined systems (m < n) return the MINIMUM-NORM
    solution on the qr route (via a Q-less factorization of Aᵀ).
    """
    import jax.numpy as jnp

    bn = np.asarray(b, np.float64)
    if method == "qr":
        m, n = A.shape
        if m < n:
            # minimum-norm solution of the wide system via QR of the tall Aᵀ
            if m * n <= 2e7:
                As = A.to_scipy().tocsr().astype(np.float64)
                Q, R = np.linalg.qr(As.T.toarray())
                d = np.diag(R)
                Rs = R + np.diag(np.where(np.abs(d) == 0, 1.0, 0.0))
                x = Q @ np.linalg.solve(Rs.T, bn)
                return (jnp.asarray(x),
                        float(np.linalg.norm(As.T @ (bn - As @ x))))
            from lssp_tpu.pc.qr_host import qr_factor, qr_solve_minnorm
            from lssp_tpu.sparse.utils import transpose
            f = qr_factor(transpose(A))
            x = qr_solve_minnorm(f, bn)
            As = f.A_scipy.T.tocsr()
            return jnp.asarray(x), float(np.linalg.norm(As.T @ (bn - As @ x)))
        if m * n <= 2e7:
            # small enough for dense LAPACK QR — sparse Givens QR on a
            # RANDOM pattern fills R near-dense anyway (its win is large
            # structured systems, where it scales linearly: 200k-row
            # banded factor in ~5 s)
            As = A.to_scipy().tocsr().astype(np.float64)
            Q, R = np.linalg.qr(As.toarray())
            x = np.linalg.solve(
                R + np.diag(np.where(np.abs(np.diag(R)) == 0, 1.0, 0.0)),
                Q.T @ bn)
            return jnp.asarray(x), float(np.linalg.norm(As.T @ (bn - As @ x)))
        from lssp_tpu.pc.qr_host import qr_factor, qr_solve
        f = qr_factor(A, b=bn)
        x = qr_solve(f)
        As = f.A_scipy
        return jnp.asarray(x), float(np.linalg.norm(As.T @ (bn - As @ x)))

    import scipy.sparse as sp

    from lssp_tpu.ops.trisolve import level_schedule, ilu_apply
    from lssp_tpu.pc.lu_host import splu_factor
    from lssp_tpu.sparse.types import CSR

    As = A.to_scipy().tocsr().astype(np.float64)
    G = (As.T @ As).tocsr()
    f = splu_factor(CSR.from_scipy(G), order="amd")
    sl = level_schedule(f.L, lower=True)
    su = level_schedule(f.U, lower=False)
    pin = jnp.asarray(f.perm_in)
    pout = jnp.asarray(f.perm_out)

    def gsolve(r):
        return ilu_apply(sl, su, jnp.asarray(r)[pin])[pout]

    atb = As.T @ bn
    x = np.asarray(gsolve(atb), np.float64)
    res = atb - G @ x
    scale = max(1.0, float(np.linalg.norm(atb)))
    for _ in range(max_refine):
        if np.linalg.norm(res) <= rtol * scale:
            break
        x = x + np.asarray(gsolve(res), np.float64)
        res = atb - G @ x
    return jnp.asarray(x), float(np.linalg.norm(As.T @ (bn - As @ x)))


@register_solver("direct", "splu")
def direct(A, b, x0=None, M=None, opts=None, dot=vdot):
    if M is None:
        raise ValueError('method="direct" needs an exact preconditioner; '
                         'use solve(..., method="direct") (the facade '
                         'installs pc="lu") or pass M explicitly')
    op, pc, x, r = init_state(A, b, x0, M)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    x = x + pc(r)
    rr = b - op(x)
    res = jnp.sqrt(dot(rr, rr))
    return x, SolveInfo(nits=jnp.int32(1), residual=res,
                        converged=res <= tol, r0norm=r0norm, bnorm=bnorm,
                        history=None)
