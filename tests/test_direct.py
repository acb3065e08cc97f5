"""Native sparse direct LU tests (the reference's external direct-solver
capability — UMFPACK/KLU/SuperLU/MUMPS/PARDISO wrappers, SURVEY §2.5 —
reimplemented natively: Gilbert–Peierls host factorization + device
level-scheduled triangular solves)."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from lssp_tpu import solve, solve_ir, SolverOptions, PCOptions
from lssp_tpu.pc.lu_host import splu_factor, _splu_python
from lssp_tpu.sparse.generators import (
    laplacian_2d, convection_diffusion_2d, random_sparse)
from lssp_tpu.sparse.types import CSR
from lssp_tpu.sparse.utils import transpose


def _residual(A, x, b):
    return float(np.linalg.norm(np.asarray(b) - A.to_scipy() @ np.asarray(x)))


class TestFactorization:
    @pytest.mark.parametrize("gen,order", [
        (lambda: laplacian_2d(16), "rcm"),
        (lambda: convection_diffusion_2d(12, beta=25.0), "rcm"),
        (lambda: random_sparse(150, nnz_per_row=6, seed=1), None),
    ])
    def test_exact_vs_scipy(self, gen, order):
        A = gen()
        n = A.shape[0]
        f = splu_factor(A, order=order)
        assert f.nclamped == 0
        b = np.linspace(1.0, 2.0, n)
        Ld = f.L.todense() + np.eye(n)
        Ud = f.U.todense()
        x = np.linalg.solve(Ud, np.linalg.solve(Ld, b[f.perm_in]))[f.perm_out]
        xs = spla.spsolve(A.to_scipy().tocsc(), b)
        np.testing.assert_allclose(x, xs, rtol=1e-8, atol=1e-10)

    def test_pivoting_indefinite(self):
        """A shifted (indefinite) Laplacian has small/negative pivots without
        pivoting; threshold pivoting must keep the factorization exact."""
        A = CSR.from_scipy(
            (laplacian_2d(10).to_scipy() - 3.0 * sp.eye(100)).tocsr())
        f = splu_factor(A)
        assert f.nclamped == 0
        b = np.ones(100)
        Ld, Ud = f.L.todense() + np.eye(100), f.U.todense()
        x = np.linalg.solve(Ud, np.linalg.solve(Ld, b[f.perm_in]))[f.perm_out]
        assert np.linalg.norm(b - A.to_scipy() @ x) < 1e-9

    def test_python_native_parity(self, monkeypatch):
        """C++ and Python paths produce identical factors."""
        A = convection_diffusion_2d(8, beta=15.0)
        f1 = splu_factor(A, order=None)
        Bt = transpose(A)
        out = _splu_python(np.asarray(Bt.indptr, np.int64),
                           np.asarray(Bt.indices, np.int64),
                           np.asarray(Bt.data, np.float64),
                           A.shape[0], 0.1, 1e-10, 1e-3)
        Lp, Li, Lx, Up, Ui, Ux, pinv, ncl = out
        L2 = transpose(CSR(Lp, Li, Lx, A.shape))
        U2 = transpose(CSR(Up, Ui, Ux, A.shape))
        np.testing.assert_array_equal(f1.L.todense(), L2.todense())
        np.testing.assert_array_equal(f1.U.todense(), U2.todense())

    def test_zero_pivot_clamped(self):
        """A structurally singular matrix is clamped, not crashed
        (reference zero-pivot convention, pc-iluk.cxx:367-374)."""
        A = CSR.from_scipy(sp.diags(np.r_[np.ones(9), 0.0]).tocsr())
        f = splu_factor(A, order=None)
        assert f.nclamped >= 1

    def test_rcm_reduces_fill(self):
        A = laplacian_2d(24)
        f_rcm = splu_factor(A, order="rcm")
        f_raw = splu_factor(A, order=None)
        assert f_rcm.L.nnz + f_rcm.U.nnz <= f_raw.L.nnz + f_raw.U.nnz

    @pytest.mark.parametrize("gen", [
        lambda: laplacian_2d(24),
        lambda: convection_diffusion_2d(16, beta=25.0),
        lambda: random_sparse(400, nnz_per_row=5, seed=3),
    ])
    def test_amd_fill_within_2x_of_colamd(self, gen):
        """The minimum-degree ordering must keep fill within 2x of scipy's
        COLAMD (the reference's SuperLU default,
        /root/reference/src/solver-superlu.cxx:60-64) — VERDICT r3 item 5
        done-criterion.  On the vendored benchmark matrices it beats
        COLAMD outright (see pc/lu_host.py docstring)."""
        A = gen()
        lu = spla.splu(A.to_scipy().tocsc(), permc_spec="COLAMD")
        fill_colamd = (lu.L.nnz + lu.U.nnz) / A.nnz
        f = splu_factor(A, order="amd")
        assert f.fill_ratio(A) <= 2.0 * fill_colamd
        # and the factorization stays exact
        n = A.shape[0]
        b = np.linspace(1.0, 2.0, n)
        Ld, Ud = f.L.todense() + np.eye(n), f.U.todense()
        x = np.linalg.solve(Ud, np.linalg.solve(Ld, b[f.perm_in]))[f.perm_out]
        xs = spla.spsolve(A.to_scipy().tocsc(), b)
        np.testing.assert_allclose(x, xs, rtol=1e-8, atol=1e-10)

    def test_amd_python_native_parity(self, monkeypatch):
        """C++ lssp_amd_order and the Python oracle return the identical
        permutation (integer-exact algorithm, min-(degree,index) ties)."""
        from lssp_tpu.sparse import reorder
        from lssp_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        for gen in (lambda: convection_diffusion_2d(10, beta=15.0),
                    lambda: random_sparse(120, nnz_per_row=6, seed=7)):
            A = gen()
            p_native = reorder.amd_permutation(A)
            monkeypatch.setattr(native, "available", lambda: False)
            p_python = reorder.amd_permutation(A)
            monkeypatch.undo()
            np.testing.assert_array_equal(p_native, p_python)
            # a permutation of 0..n-1
            assert np.array_equal(np.sort(p_native),
                                  np.arange(A.shape[0]))


class TestDirectSolve:
    def test_direct_method(self):
        A = convection_diffusion_2d(20, beta=10.0)
        b = jnp.ones(A.shape[0], dtype=jnp.float64)
        x, info = solve(A, b, method="direct")
        assert int(info.nits) == 1 and bool(info.converged)
        assert _residual(A, x, b) < 1e-9

    def test_lu_pc_one_iteration(self):
        """An exact-LU PC converges any Krylov method in one iteration."""
        A = laplacian_2d(24)
        b = jnp.ones(A.shape[0], dtype=jnp.float64)
        for method in ("cg", "gmres", "bicgstab"):
            x, info = solve(A, b, method=method, pc="lu")
            assert int(info.nits) <= 2, method
            assert _residual(A, x, b) < 1e-8

    def test_ir_direct(self):
        """Mixed-precision direct: fp32 LU inner + fp64 refinement."""
        A = laplacian_2d(24)
        b = jnp.ones(A.shape[0], dtype=jnp.float64)
        x, info = solve_ir(A, b, method="direct")
        assert bool(info.converged)
        assert _residual(A, x, b) < 1e-6

    def test_lifecycle_caches_factorization(self):
        from lssp_tpu.solvers.facade import Solver
        A = convection_diffusion_2d(16, beta=5.0)
        b = jnp.ones(A.shape[0], dtype=jnp.float64)
        s = Solver(method="direct").assemble(A, b)
        x1 = s.solve()
        x2 = s.solve(b=2 * b)      # reuses factors — reference reset_rhs
        np.testing.assert_allclose(np.asarray(x2), 2 * np.asarray(x1),
                                   rtol=1e-10)


class TestLeastSquares:
    """solve_lsq — direct least squares (the reference's QR_MUMPS capability,
    solver-qrmumps.cxx:10-84) via normal equations + refinement."""

    def test_overdetermined_matches_lstsq(self, rng):
        m, n = 300, 120
        As = sp.random(m, n, density=0.08, random_state=5, format="csr")
        As = (As + sp.vstack([sp.eye(n),
                              sp.csr_matrix((m - n, n))])).tocsr()
        from lssp_tpu import solve_lsq
        A = CSR.from_scipy(As)
        b = rng.standard_normal(m)
        x, res = solve_lsq(A, b)
        xs, *_ = np.linalg.lstsq(As.toarray(), b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), xs, rtol=1e-8, atol=1e-10)
        assert res < 1e-10

    def test_square_reproduces_direct(self):
        from lssp_tpu import solve_lsq
        A = laplacian_2d(16)
        b = np.linspace(1.0, 2.0, 256)
        x, res = solve_lsq(A, b)
        assert np.linalg.norm(b - A.to_scipy() @ np.asarray(x)) < 1e-9


class TestSparseQR:
    """Host sparse QR (George–Heath Givens; pc/qr_host.py) — the reference's
    QR_MUMPS capability (solver-qrmumps.cxx:10-84), round-2 replacement for
    the normal-equations stand-in."""

    @staticmethod
    def _ill_conditioned(m=200, n=100, cond_exp=8, seed=1):
        import scipy.sparse as sp
        A0 = sp.random(m, n, density=0.04, random_state=seed, format="csr")
        A0 = A0 + sp.vstack([sp.eye(n),
                             sp.csr_matrix((m - n, n))]).tocsr()
        scal = np.logspace(0, -cond_exp, n)
        return CSR.from_scipy((A0 @ sp.diags(scal)).tocsr())

    def test_qr_beats_normal_equations_at_cond_1e8(self):
        from lssp_tpu import solve_lsq
        rng = np.random.default_rng(0)
        A = self._ill_conditioned()
        x_true = rng.standard_normal(100)
        b = A.to_scipy() @ x_true
        x_qr, _ = solve_lsq(A, b, method="qr")
        err_qr = np.linalg.norm(np.asarray(x_qr) - x_true) \
            / np.linalg.norm(x_true)
        assert err_qr < 1e-7          # cond*eps scale; normal eqs give O(1e3)
        x_ne, _ = solve_lsq(A, b, method="normal")
        err_ne = np.linalg.norm(np.asarray(x_ne) - x_true) \
            / np.linalg.norm(x_true)
        assert err_ne > 1e3 * err_qr  # documents WHY qr is the default

    def test_qr_matches_dense_lstsq_oracle(self):
        from lssp_tpu import solve_lsq
        rng = np.random.default_rng(3)
        A = self._ill_conditioned(150, 80, cond_exp=4, seed=5)
        b = rng.standard_normal(150)        # inconsistent rhs
        x, res = solve_lsq(A, b, method="qr")
        xd, *_ = np.linalg.lstsq(A.to_scipy().toarray(), b, rcond=None)
        np.testing.assert_allclose(np.asarray(x), xd, rtol=1e-8, atol=1e-10)
        # returned residual is the optimality measure ||A^T (b - Ax)||
        assert res < 1e-8

    def test_qr_resolve_new_rhs_csne(self):
        from lssp_tpu.pc.qr_host import qr_factor, qr_solve
        rng = np.random.default_rng(7)
        A = self._ill_conditioned(150, 80, cond_exp=6, seed=9)
        x1 = rng.standard_normal(80)
        b1 = A.to_scipy() @ x1
        f = qr_factor(A, b=b1)
        x2_true = rng.standard_normal(80)
        b2 = A.to_scipy() @ x2_true
        x2 = qr_solve(f, b=b2)              # Q-less CSNE + refinement
        err = np.linalg.norm(x2 - x2_true) / np.linalg.norm(x2_true)
        assert err < 1e-7

    def test_qr_underdetermined_minnorm(self):
        """m < n: the qr route returns the minimum-norm solution instead of
        crashing (round-2 review finding)."""
        import scipy.sparse as sp
        from lssp_tpu import solve_lsq
        rng = np.random.default_rng(5)
        A0 = sp.random(40, 80, density=0.1, random_state=3, format="csr")
        A0 = A0 + sp.hstack([sp.eye(40), sp.csr_matrix((40, 40))]).tocsr()
        A = CSR.from_scipy(A0.tocsr())
        b = rng.standard_normal(40)
        x, res = solve_lsq(A, b, method="qr")
        # consistent (full row rank): exact solve + min-norm
        np.testing.assert_allclose(A0 @ np.asarray(x), b, atol=1e-9)
        xd = np.linalg.pinv(A0.toarray()) @ b        # min-norm oracle
        np.testing.assert_allclose(np.asarray(x), xd, atol=1e-8)

    def test_qr_underdetermined_minnorm_sparse_route(self):
        """Same contract through the sparse Q-less route (qr_solve_minnorm
        on a factorization of A^T)."""
        import scipy.sparse as sp
        from lssp_tpu.pc.qr_host import qr_factor, qr_solve_minnorm
        from lssp_tpu.sparse.utils import transpose
        rng = np.random.default_rng(6)
        A0 = sp.random(60, 120, density=0.08, random_state=4, format="csr")
        A0 = A0 + sp.hstack([sp.eye(60), sp.csr_matrix((60, 60))]).tocsr()
        A = CSR.from_scipy(A0.tocsr())
        b = rng.standard_normal(60)
        f = qr_factor(transpose(A))
        x = qr_solve_minnorm(f, b)
        np.testing.assert_allclose(A0 @ x, b, atol=1e-9)
        xd = np.linalg.pinv(A0.toarray()) @ b
        np.testing.assert_allclose(x, xd, atol=1e-8)

    def test_qr_zero_matrix_no_crash(self):
        """All-zero (no stored entries) matrix: unit diagonals + pure
        residual, no IndexError/NaN."""
        import scipy.sparse as sp
        from lssp_tpu.pc.qr_host import qr_factor, qr_solve
        A = CSR.from_scipy(sp.csr_matrix((5, 3)))
        b = np.ones(5)
        f = qr_factor(A, b=b)
        x = qr_solve(f)
        assert np.all(np.isfinite(x)) and np.allclose(x, 0.0)
        np.testing.assert_allclose(f.resnorm, np.linalg.norm(b))

    def test_qr_explicit_zero_leading_entries(self):
        """Explicit stored zeros in leading positions must not produce NaNs
        (0/0 Givens guard, Python and C++ paths)."""
        import scipy.sparse as sp
        from lssp_tpu.pc.qr_host import qr_factor, qr_solve
        rows = np.array([0, 1, 2, 3, 3])
        cols = np.array([0, 0, 1, 1, 2])
        vals = np.array([0.0, 0.0, 1.0, 2.0, 1.0])
        A0 = sp.csr_matrix((vals, (rows, cols)), shape=(4, 3))
        A = CSR.from_scipy(A0)
        b = np.ones(4)
        f = qr_factor(A, b=b)
        x = qr_solve(f)
        assert np.all(np.isfinite(x))


class TestMultifrontal:
    """Supernodal multifrontal LU (pc/multifrontal.py + native/src/mf.cpp)
    — the BLAS-3 factor path behind splu_factor(method='auto').
    Reference perf-class anchor: UMFPACK/MUMPS adapters,
    /root/reference/src/solver-umfpack.cxx:107-153."""

    def _solve_with(self, F, A, b):
        import scipy.sparse as sp
        n = A.shape[0]
        L = (F.L.to_scipy() + sp.eye(n)).tocsr()
        U = F.U.to_scipy().tocsr()
        y = spla.spsolve_triangular(L, b[F.perm_in], lower=True)
        y = spla.spsolve_triangular(U, y, lower=False)
        return y[F.perm_out]

    @pytest.mark.parametrize("gen", [
        lambda: laplacian_2d(24),
        lambda: convection_diffusion_2d(20, beta=25.0),
        lambda: random_sparse(500, nnz_per_row=5, seed=3),
    ])
    def test_exact_solve(self, gen):
        from lssp_tpu.pc.multifrontal import mf_factor
        A = gen()
        n = A.shape[0]
        b = np.linspace(1.0, 2.0, n)
        F = mf_factor(A)
        x = self._solve_with(F, A, b)
        res = np.linalg.norm(b - A.to_scipy() @ x)
        assert res < 1e-8 * max(1.0, np.linalg.norm(b)), res

    def test_python_oracle_matches_native(self, monkeypatch):
        """The numpy/scipy oracle and the C++ engine produce equivalent
        factorizations (same solve to fp accuracy)."""
        from lssp_tpu.pc import multifrontal as mfm
        from lssp_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        A = convection_diffusion_2d(16, beta=20.0)
        n = A.shape[0]
        b = np.linspace(-1.0, 1.0, n)
        F_nat = mfm.mf_factor(A)
        monkeypatch.setattr(mfm, "_mf_factor_native",
                            lambda *a, **k: None)
        F_py = mfm.mf_factor(A)
        monkeypatch.undo()
        x1 = self._solve_with(F_nat, A, b)
        x2 = self._solve_with(F_py, A, b)
        np.testing.assert_allclose(x1, x2, rtol=1e-9, atol=1e-11)

    def test_splu_factor_auto_routes_to_mf(self):
        """method='auto' picks the supernodal engine for large matrices
        when native is available; explicit 'gp' keeps the scalar path."""
        from lssp_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        A = laplacian_2d(32)          # 1024 rows >= threshold
        f_auto = splu_factor(A)
        f_gp = splu_factor(A, method="gp")
        n = A.shape[0]
        b = np.ones(n)
        for f in (f_auto, f_gp):
            Ld, Ud = f.L.todense() + np.eye(n), f.U.todense()
            x = np.linalg.solve(
                Ud, np.linalg.solve(Ld, b[f.perm_in]))[f.perm_out]
            res = np.linalg.norm(b - A.to_scipy() @ x)
            assert res < 1e-8, res

    def test_zero_pivot_clamped(self):
        from lssp_tpu.pc.multifrontal import mf_factor
        import scipy.sparse as sp
        # structurally nonsingular but numerically singular block
        n = 600
        A = random_sparse(n, nnz_per_row=4, seed=5).to_scipy().tolil()
        A[5, 5] = 0.0
        A[5, :] = 0.0
        A[:, 5] = 0.0
        A[5, 5] = 0.0
        A[5, 6] = 1e-30
        A[6, 5] = 1e-30
        from lssp_tpu.sparse.types import CSR
        F = mf_factor(CSR.from_scipy(A.tocsr()))
        assert F.nclamped >= 1
