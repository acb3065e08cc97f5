"""Solver registry (replaces the reference's dispatch switch,
/root/reference/src/lssp.cxx:250-414)."""
from __future__ import annotations

SOLVERS = {}


def register_solver(*names):
    def deco(fn):
        for n in names:
            SOLVERS[n] = fn
        return fn
    return deco


def get_solver(name: str):
    key = name.lower()
    if key not in SOLVERS:
        raise ValueError(f"unknown solver {name!r}; available: {sorted(SOLVERS)}")
    return SOLVERS[key]


def get_block_solver(name: str):
    """Block-Krylov methods (multi-rhs only: one SHARED search block, every
    reduction a stacked Gram).  Returns None for ordinary per-rhs methods —
    solve_multi/dist_solve_multi then vmap the registered solver instead.
    Signature of a block solver: (A, B, X0, M=, opts=, reduce=)."""
    key = name.lower().replace("_", "")
    if key == "blockcg":
        from lssp_tpu.solvers.block_cg import block_cg
        return block_cg
    if key == "blockgmres":
        from lssp_tpu.solvers.block_gmres import block_gmres
        return block_gmres
    return None


def _populate():
    """Import solver modules so their @register_solver decorators run."""
    from lssp_tpu.solvers import cg as _cg
    from lssp_tpu.solvers import gmres as _gmres
    for mod in ("bicgstab", "bicgstabl", "bicgsafe", "cgs", "gpbicg",
                "cr", "crs", "bicrstab", "bicrsafe", "gpbicr",
                "qmrcgstab", "tfqmr", "orthomin", "idrs", "lgmres",
                # capability parity with the reference's external-package
                # solver tables (LASPACK/PETSc/LIS adapters, SURVEY §2.5)
                "minres", "bicg", "qmr", "cgnr", "lsqr", "fgmres",
                # communication-avoiding variants (multi-chip latency):
                # single-reduction pipelined CG
                "pipecg",
                # native sparse direct LU (the reference's external
                # UMFPACK/KLU/SuperLU/MUMPS/PARDISO capability)
                "direct"):
        try:
            __import__(f"lssp_tpu.solvers.{mod}")
        except ImportError:
            pass
    SOLVERS.setdefault("cg", _cg.cg)
    SOLVERS.setdefault("gmres", _gmres.gmres)
    SOLVERS.setdefault("rgmres", _gmres.gmres_r)


_populate()
