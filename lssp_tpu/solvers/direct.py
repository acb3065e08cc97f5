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

from lssp_tpu.solvers.base import SolveInfo, init_state, stopping_tol, vdot
from lssp_tpu.solvers.registry import register_solver


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
