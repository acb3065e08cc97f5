"""lssp_tpu — a TPU-native sparse linear-solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the serial C++
reference library huiscliu/lssp (solving sparse ``Ax = b``): CSR/BSR/ELL/DIA
sparse matrices resident in TPU HBM, the full Krylov suite, ILU-family and AMG
preconditioners, and a row-partitioned multi-chip distribution layer built on
``jax.sharding.Mesh`` + ``shard_map`` with ICI collectives.

Public API (functional):

    >>> import lssp_tpu as lt
    >>> A = lt.sparse.laplacian_2d(128)           # CSR pytree
    >>> b = jnp.ones(A.shape[0])
    >>> x, info = lt.solve(A, b, method="gmres", pc="iluk")

Lifecycle API (parity with the reference's create/assemble/solve/destroy
protocol, /root/reference/include/lssp.h:44-53):

    >>> s = lt.Solver(method="gmres", pc="iluk")
    >>> s.assemble(A, b)
    >>> x = s.solve()
    >>> s.info.nits, s.info.residual
"""

from lssp_tpu import sparse
from lssp_tpu import ops
from lssp_tpu import solvers
from lssp_tpu import pc
from lssp_tpu import amg
from lssp_tpu import parallel
from lssp_tpu.config import SolverOptions, PCOptions, Defaults
from lssp_tpu.solvers.facade import solve, solve_multi, Solver, SolveInfo
from lssp_tpu.solvers.refine import solve_ir, prepare_ir
from lssp_tpu.solvers.direct import solve_lsq
from lssp_tpu.sparse import CSR, COO, BSR, ELL, DIA

__version__ = "0.1.0"

__all__ = [
    "sparse", "ops", "solvers", "pc", "amg", "parallel",
    "SolverOptions", "PCOptions", "Defaults",
    "solve", "solve_multi", "solve_ir", "prepare_ir", "solve_lsq", "Solver", "SolveInfo",
    "CSR", "COO", "BSR", "ELL", "DIA",
]
