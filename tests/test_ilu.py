"""ILU factorization exactness tests (SURVEY §4 tier 3):

- ILU(0) of an SPD tridiagonal has a closed form — check against it.
- ILU(0) pattern equals A's pattern; ILU(k) pattern grows with k.
- Full-fill ILU(n) equals the exact dense LU for small matrices.
- ILUT with tol=0, p=n equals full LU (no dropping).
"""
import numpy as np
import pytest
import scipy.sparse as sp

from lssp_tpu.pc.ilu_host import (
    iluk_factor, iluk_symbolic, ilut_factor, ilu0_numeric,
)
from lssp_tpu.sparse import CSR, laplacian_2d, random_sparse
from lssp_tpu.sparse.utils import adjust_zero_diag, sort_columns


def dense_lu_nopivot(A):
    """Doolittle LU without pivoting: A = L U, L unit diag."""
    n = A.shape[0]
    L = np.eye(n)
    U = A.astype(float).copy()
    for k in range(n):
        for i in range(k + 1, n):
            L[i, k] = U[i, k] / U[k, k]
            U[i, :] -= L[i, k] * U[k, :]
    return L, np.triu(U)


class TestILU0:
    def test_tridiag_closed_form(self):
        # ILU(0) == exact LU for a tridiagonal matrix (no fill exists)
        n = 12
        T = sp.diags([-np.ones(n - 1), 2 * np.ones(n), -np.ones(n - 1)],
                     [-1, 0, 1]).tocsr()
        L, U = iluk_factor(CSR.from_scipy(T), level=0)
        Lr, Ur = dense_lu_nopivot(T.toarray())
        np.testing.assert_allclose(L.todense() + np.eye(n), Lr, rtol=1e-12)
        np.testing.assert_allclose(U.todense(), Ur, rtol=1e-12)

    def test_pattern_is_A_pattern(self):
        A = laplacian_2d(8)
        L, U = iluk_factor(A, level=0)
        total = L.nnz + U.nnz
        assert total == A.nnz

    def test_residual_reduces(self):
        # ILU(0) product LU should approximate A on A's pattern exactly
        A = laplacian_2d(6)
        L, U = iluk_factor(A, level=0)
        n = A.shape[0]
        prod = (L.todense() + np.eye(n)) @ U.todense()
        dense = A.todense()
        mask = dense != 0
        np.testing.assert_allclose(prod[mask], dense[mask], rtol=1e-10)


class TestILUK:
    def test_full_level_equals_exact_lu(self):
        n = 25
        A = laplacian_2d(5)
        # the reference's max-update level rule (pc-iluk.cxx:103) lets fill
        # levels exceed n, so "full fill" needs a generously large level
        L, U = iluk_factor(A, level=1000)
        Lr, Ur = dense_lu_nopivot(A.todense())
        np.testing.assert_allclose(L.todense() + np.eye(n), Lr, atol=1e-10)
        np.testing.assert_allclose(U.todense(), Ur, atol=1e-10)

    def test_fill_grows_with_level(self):
        A = laplacian_2d(8)
        sizes = []
        for lev in [0, 1, 2, 3]:
            L, U = iluk_factor(A, level=lev)
            sizes.append(L.nnz + U.nnz)
        assert sizes == sorted(sizes)
        assert sizes[1] > sizes[0]

    def test_symbolic_level0_pattern(self):
        A = sort_columns(adjust_zero_diag(laplacian_2d(6), 1e-10))
        P = iluk_symbolic(A, 0)
        assert P.nnz == A.nnz
        np.testing.assert_array_equal(np.asarray(P.indices), np.asarray(A.indices))

    def test_block_factor(self):
        A = laplacian_2d(6)          # n=36
        L, U = iluk_factor(A, level=1, num_blocks=4)
        n = 36
        # factors must be block-diagonal: no entries across 9-row blocks
        for F in (L, U):
            ip = np.asarray(F.indptr)
            rows = np.repeat(np.arange(n), ip[1:] - ip[:-1])
            cols = np.asarray(F.indices)
            assert np.all((rows // 9) == (cols // 9))


class TestILUT:
    def test_no_dropping_equals_full_lu(self):
        n = 20
        A = random_sparse(n, 5, seed=0)
        L, U = ilut_factor(A, tol=0.0, p=n)
        Lr, Ur = dense_lu_nopivot(A.todense())
        np.testing.assert_allclose(L.todense() + np.eye(n), Lr, atol=1e-8)
        np.testing.assert_allclose(U.todense(), Ur, atol=1e-8)

    def test_p_caps_row_fill(self):
        A = laplacian_2d(8)
        p = 3
        L, U = ilut_factor(A, tol=1e-8, p=p)
        for F, extra in ((L, 0), (U, 1)):      # U also holds the diagonal
            ip = np.asarray(F.indptr)
            assert (ip[1:] - ip[:-1] <= p + extra).all()

    def test_tighter_tol_more_fill(self):
        A = laplacian_2d(8)
        n1 = sum(F.nnz for F in ilut_factor(A, tol=1e-1, p=10))
        n2 = sum(F.nnz for F in ilut_factor(A, tol=1e-8, p=10))
        assert n2 >= n1


class TestILUTP:
    """ILUT with column pivoting (LIS ilutp capability,
    solver-lis.cxx:8-41)."""

    def test_no_drop_exact(self):
        """With tol=0 and unlimited fill, ILUTP is an exact pivoted LU:
        L·U = A[:, perm]."""
        import scipy.sparse as sp
        from lssp_tpu.pc.ilu_host import ilutp_factor
        from lssp_tpu.sparse.types import CSR
        m = sp.random(40, 40, density=0.25, random_state=3, format="csr")
        m = (m + sp.eye(40) * 0.01).tocsr()
        L, U, perm = ilutp_factor(CSR.from_scipy(m), tol=0.0, p=10**6,
                                  permtol=0.5)
        LU = (L.todense() + np.eye(40)) @ U.todense()
        np.testing.assert_allclose(LU, m.toarray()[:, perm],
                                   rtol=1e-10, atol=1e-12)
        assert (perm != np.arange(40)).any()       # pivoting engaged

    def test_robust_on_tiny_diagonal(self):
        """Near-zero diagonals: ILUTP pivots instead of clamping and beats
        plain ILUT."""
        import scipy.sparse as sp
        import jax.numpy as jnp
        from lssp_tpu import solve, SolverOptions
        from lssp_tpu.sparse.types import CSR
        d = np.r_[np.full(50, 1e-14), np.ones(78)]
        m = (sp.diags(d) + 0.5 * sp.diags(np.ones(127), 1)
             + 0.3 * sp.diags(np.ones(127), -1)).tocsr()
        A = CSR.from_scipy(m)
        b = jnp.ones(128, dtype=jnp.float64)
        x, info = solve(A, b, method="gmres", pc="ilutp",
                        options=SolverOptions(maxit=200))
        res = float(np.linalg.norm(np.asarray(b) - m @ np.asarray(x)))
        assert bool(info.converged) and res < 1e-6
        assert int(info.nits) <= 5


def test_exact_neumann_matches_level_scheduled():
    """ilu_sweeps=-1: the complete Neumann series (nilpotent strict
    factors) must reproduce the exact substitution apply."""
    import numpy as np
    import jax.numpy as jnp
    from lssp_tpu import sparse, PCOptions
    from lssp_tpu.pc import setup

    A = sparse.laplacian_2d(24)
    n = A.shape[0]
    M_ex = setup(A, "iluk", PCOptions(ilu_sweeps=0))
    M_nm = setup(A, "iluk", PCOptions(ilu_sweeps=-1))
    r = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    np.testing.assert_allclose(np.asarray(M_nm(r)), np.asarray(M_ex(r)),
                               rtol=1e-12, atol=1e-13)
    # transpose apply too
    M_ex_t = setup(A, "iluk", PCOptions(ilu_sweeps=0, transpose=True))
    np.testing.assert_allclose(np.asarray(M_nm.t(r)),
                               np.asarray(M_ex_t.t(r)),
                               rtol=1e-12, atol=1e-13)
