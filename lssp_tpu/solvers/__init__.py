"""Krylov solver suite (reference L3a, /root/reference/src/solver-*.cxx).

Every solver is a pure jittable function ``method(A, b, x0, M, opts)`` whose
iteration is a single ``lax.while_loop`` device program; the only host↔device
sync is reading the final info.  All share the reference's stopping rule
``tol = max(rtol·‖r0‖, atol, rbtol·‖b‖)`` and breakdown guards.
"""

from lssp_tpu.solvers.base import SolveInfo, stopping_tol, operator
from lssp_tpu.solvers.registry import SOLVERS, get_solver
from lssp_tpu.solvers.facade import solve, Solver

__all__ = ["SolveInfo", "stopping_tol", "operator", "SOLVERS", "get_solver",
           "solve", "Solver"]
