"""Exact sparse-LU preconditioner (and the engine of ``method="direct"``).

Replaces the reference's external direct solvers (UMFPACK/KLU/SuperLU/
MUMPS/PARDISO wrappers, SURVEY §2.5) and the "LU" entry of its PETSc PC
table (/root/reference/src/solver-petsc.cxx:23-32): Gilbert–Peierls
factorization on the host (lssp_tpu/pc/lu_host.py, C++ fast path), exact
level-scheduled triangular sweeps on the device.  One PC application is an
exact solve up to pivot clamping — as a preconditioner it converges any
Krylov method in one iteration; inside ``solve_ir`` it gives a direct
solver with fp64-quality answers on fp32 TPU hardware.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lssp_tpu.ops.trisolve import level_schedule, ilu_apply
from lssp_tpu.pc.base import Preconditioner, register_pc
from lssp_tpu.pc.lu_host import splu_factor


def _lu_apply(state, r):
    sl, su, perm_in, perm_out = state
    y = ilu_apply(sl, su, r[perm_in])
    return y[perm_out]


@register_pc("lu")
def setup_lu(A, opts):
    f = splu_factor(A, order=opts.lu_order, pivot_tol=opts.lu_pivot_tol)
    dtype = np.asarray(A.data).dtype
    sl = level_schedule(f.L.astype(dtype) if f.L.dtype != dtype else f.L,
                        lower=True)
    su = level_schedule(f.U.astype(dtype) if f.U.dtype != dtype else f.U,
                        lower=False)
    state = (sl, su, jnp.asarray(f.perm_in), jnp.asarray(f.perm_out))
    return Preconditioner(_lu_apply, state=state, name="lu")
