"""Facade input validation (the reference's assemble-time checks,
/root/reference/src/lssp.cxx:147-160) and the rectangular-LSQR fix the
round-5 adversarial sweep surfaced."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

import lssp_tpu as lt


def test_non_square_raises():
    A = lt.sparse.CSR.from_scipy(sp.random(10, 8, density=0.5,
                                           random_state=0).tocsr())
    with pytest.raises(ValueError, match="SQUARE"):
        lt.solve(A, jnp.ones(10), method="cg")
    with pytest.raises(ValueError, match="SQUARE"):
        lt.solve_ir(A, jnp.ones(10), method="gmres")


def test_rhs_length_mismatch_raises():
    with pytest.raises(ValueError, match="rhs length"):
        lt.solve(lt.sparse.laplacian_2d(8), jnp.ones(63), method="cg")


def test_integer_rhs_cast():
    x, info = lt.solve(lt.sparse.laplacian_2d(8),
                       jnp.ones(64, dtype=jnp.int32), method="cg")
    assert bool(info.converged)
    X, i2 = lt.solve_multi(lt.sparse.laplacian_2d(8),
                           jnp.ones((64, 2), dtype=jnp.int32),
                           method="cg", pc="iluk")
    assert np.isfinite(np.asarray(X)).all()


def test_lsqr_rectangular_least_squares():
    """LSQR through solve() on a TALL system converges to the
    least-squares solution (the iterate lives in column space — the
    zeros_like(b) init only coincided for square matrices)."""
    rng = np.random.default_rng(0)
    As = (sp.random(24, 10, density=0.4, random_state=0)
          + sp.vstack([sp.eye(10), sp.csr_matrix((14, 10))])).tocsr()
    A = lt.sparse.CSR.from_scipy(As)
    b = jnp.asarray(rng.standard_normal(24))
    x, info = lt.solve(A, b, method="lsqr",
                       options=lt.SolverOptions(maxit=300, rtol=1e-12,
                                                atol=1e-12))
    xs, *_ = np.linalg.lstsq(As.toarray(), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), xs, atol=1e-9)


def test_singular_reported_honestly():
    """A zero row must not crash — the solver reports converged=False."""
    A = lt.sparse.laplacian_2d(8).to_scipy().tolil()
    A[5, :] = 0.0
    Am = lt.sparse.CSR.from_scipy(A.tocsr())
    x, info = lt.solve(Am, jnp.ones(64), method="gmres", pc="iluk",
                       options=lt.SolverOptions(maxit=50))
    assert not bool(info.converged)
