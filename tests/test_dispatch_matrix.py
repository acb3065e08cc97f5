"""Full facade dispatch-matrix smoke: EVERY registered solver and EVERY
registered preconditioner solves through the public API.

The reference exposes its matrix through per-package solver×pc tables
(LASPACK solver-laspack.cxx:29-34, PETSc solver-petsc.cxx:23-32, LIS
solver-lis.cxx:8-41); here the whole cross-product is native, so the
completeness claim is testable: no (method, pc) cell may crash, return
non-finite values, or fail to reduce the residual on the canonical SPD
model problem.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import lssp_tpu as lt
from lssp_tpu.solvers.registry import SOLVERS, get_block_solver
from lssp_tpu.pc.base import PC_REGISTRY

A = None
OPTS = lt.SolverOptions(rtol=1e-7, atol=0.0, rbtol=0.0, maxit=400,
                        restart=25)


def _matrix():
    global A
    if A is None:
        A = lt.sparse.laplacian_2d(16)          # SPD, n=256
    return A


PC_OPTS = {
    "biluk": lt.PCOptions(num_blocks=64),
    "bilut": lt.PCOptions(num_blocks=64),
    "vbiluk": lt.PCOptions(block_sizes=np.full(64, 4)),
    "vbilut": lt.PCOptions(block_sizes=np.full(64, 4)),
    "user": lt.PCOptions(
        user_setup=lambda A: 1.0 / np.asarray(A.to_scipy().diagonal()),
        user_apply=lambda d, r: d * r),
}


def _solve(method, pc, pc_options=None):
    Am = _matrix()
    b = jnp.ones(Am.shape[0], dtype=jnp.float64)
    x, info = lt.solve(Am, b, method=method, pc=pc, options=OPTS,
                       pc_options=pc_options)
    xn = np.asarray(x, np.float64)
    assert np.isfinite(xn).all(), (method, pc, "non-finite solution")
    res = float(np.linalg.norm(np.asarray(b) - Am.to_scipy() @ xn))
    b0 = float(np.linalg.norm(np.asarray(b)))
    return res / b0, info


@pytest.mark.parametrize("method", sorted(SOLVERS))
def test_every_method_with_iluk(method):
    """All registered methods × the reference's flagship PC (the direct
    methods take their exact-LU PC — one inexact ILU apply is not a
    direct solve, which is why the facade installs pc="lu" for them)."""
    pc = "lu" if method in ("direct", "splu") else "iluk"
    rel, info = _solve(method, pc)
    # every method must at least strongly reduce the residual on the
    # SPD model problem; the convergent ones reach the 1e-7 class
    assert rel < 1e-3, (method, rel)


# one-directional relaxation sweeps are NONSYMMETRIC operators — CG's
# theory needs an SPD preconditioner, so those cells run under GMRES
# (the reference pairs them the same way: LASPACK SSOR rides its
# nonsymmetric solvers, solver-laspack.cxx:29-34)
_NONSYM_PCS = {"gs", "sor"}


@pytest.mark.parametrize("pc", sorted(PC_REGISTRY))
def test_every_pc_with_cg_or_gmres(pc):
    """All registered PCs under the two workhorse methods."""
    method = "gmres" if pc in _NONSYM_PCS else "cg"
    rel, info = _solve(method, pc, PC_OPTS.get(pc))
    assert rel < 1e-3, (pc, rel)


@pytest.mark.parametrize("method", ["blockcg", "blockgmres"])
def test_block_methods_multi_rhs(method):
    Am = _matrix()
    k = 4
    B = jnp.ones((Am.shape[0], k), dtype=jnp.float64)
    X, info = lt.solve_multi(Am, B, method=method, pc="iluk", options=OPTS)
    Xn = np.asarray(X, np.float64)
    assert np.isfinite(Xn).all()
    R = np.asarray(B) - Am.to_scipy() @ Xn
    assert float(np.linalg.norm(R)) / float(np.linalg.norm(np.asarray(B))) \
        < 1e-3
