"""Distributed classical AMG (parallel/dist_rs.py): the rs hierarchy as a
DistSA (B := P-hat, C := P-hat^T, pair-reshape agg) run by dist_sa_vcycle.

The whole construction hangs on one identity — P·ec == P̂·broadcast(ec)
— tested exactly, then end-to-end iteration parity with the single-device
rsamg cycle on the virtual mesh."""
import numpy as np
import jax.numpy as jnp
import pytest

import lssp_tpu as lt
from lssp_tpu.amg import rs
from lssp_tpu.parallel import dist_rs as dr
from lssp_tpu.parallel.dist_solve import dist_solve, make_mesh

OPTS = lt.SolverOptions(rtol=1e-8, atol=0.0, rbtol=0.0, maxit=100)


class TestPhat:
    @pytest.mark.parametrize("gen,dims", [
        (lambda: lt.sparse.laplacian_3d(8), (8, 8, 8)),
        (lambda: lt.sparse.laplacian_2d(16), (1, 16, 16)),
        (lambda: lt.sparse.anisotropic_poisson_2d(16, epsilon=0.01),
         (1, 16, 16)),
    ])
    def test_identity_exact(self, gen, dims):
        A = gen()
        hier = rs.rs_host_setup(A)
        n = A.shape[0]
        rng = np.random.default_rng(0)
        for lev in hier.levels[:2]:
            if lev.agg is None:
                continue
            ldims = lev.agg[2]
            Phat = dr.phat_from_p(lev.P, lev.grp, ldims, lev.agg[1])
            ec = rng.standard_normal(lev.P.shape[1])
            bcast = ec[lev.grp]
            err = np.abs(Phat @ bcast - lev.P @ ec).max()
            assert err == 0.0, err
            break   # level-0 covers each generator shape


class TestFeasibility:
    def test_gates(self):
        # 8 shards on a 16^3 lattice: all axes feasible
        assert all(dr.axis_feasible((16, 16, 16), a, 8) for a in range(3))
        # odd extents never coarsen
        assert not dr.axis_feasible((15, 16, 16), 0, 8)
        # z-pairs need nz % P and (nz//P) even
        assert not dr.axis_feasible((8, 16, 16), 0, 8)   # nz//P == 1, odd
        assert dr.axis_feasible((32, 16, 16), 0, 8)

    def test_non_lattice_returns_none(self):
        import scipy.sparse as sp
        rng = np.random.default_rng(1)
        n = 512
        R = sp.random(n, n, density=0.02, random_state=2)
        A = lt.sparse.CSR.from_scipy((R + R.T + 8 * sp.eye(n)).tocsr())
        assert dr.build_dist_rs(A, 8) is None


class TestEndToEnd:
    @pytest.mark.parametrize("name,gen,method", [
        ("poisson3d_16", lambda: lt.sparse.laplacian_3d(16), "cg"),
        ("aniso_128",
         lambda: lt.sparse.anisotropic_poisson_2d(128, epsilon=0.01), "cg"),
        ("convdiff_64",
         lambda: lt.sparse.convection_diffusion_2d(64), "gmres"),
    ])
    def test_matches_single_device(self, name, gen, method):
        A = gen()
        b = jnp.ones(A.shape[0], dtype=jnp.float64)
        mesh = make_mesh(8)
        x1, i1 = lt.solve(A, b, method=method, pc="rsamg", options=OPTS)
        x2, i2 = dist_solve(A, b, method=method, pc="rsamg", mesh=mesh,
                            options=OPTS)
        r2 = float(np.linalg.norm(
            np.asarray(b) - A.to_scipy() @ np.asarray(x2)))
        assert bool(i2.converged) and r2 < 1e-5 * np.sqrt(A.shape[0])
        assert abs(int(i1.nits) - int(i2.nits)) <= 2, (
            int(i1.nits), int(i2.nits))

    def test_non_lattice_falls_back(self):
        """pc='rsamg' on a non-lattice matrix routes to the distributed
        saamg hierarchy with a warning — and still converges."""
        import scipy.sparse as sp
        rng = np.random.default_rng(3)
        n = 1024
        R = sp.random(n, n, density=0.008, random_state=4)
        W = -(abs(R) + abs(R.T))
        W = W - sp.diags(W.diagonal())
        Araw = (W + sp.diags(-np.asarray(W.sum(axis=1)).ravel() + 0.05)
                ).tocsr()
        A = lt.sparse.CSR.from_scipy(Araw)
        b = jnp.ones(n, dtype=jnp.float64)
        x, info = dist_solve(A, b, method="cg", pc="rsamg",
                             mesh=make_mesh(8), options=OPTS)
        res = float(np.linalg.norm(np.asarray(b) - Araw @ np.asarray(x)))
        assert bool(info.converged) and res < 1e-5 * np.sqrt(n)


def test_dist_ir_rsamg():
    """The distributed mixed-precision refinement path with the classical
    hierarchy (fp32 inner shard program, fp64 outer residuals)."""
    from lssp_tpu.parallel.dist_solve import dist_solve_ir
    A = lt.sparse.anisotropic_poisson_2d(64, epsilon=0.01)
    b = jnp.ones(A.shape[0], dtype=jnp.float64)
    x, info = dist_solve_ir(A, b, method="cg", pc="rsamg",
                            mesh=make_mesh(8))
    rel = float(np.linalg.norm(
        np.asarray(b) - A.to_scipy() @ np.asarray(x, np.float64))) / 64.0
    assert bool(info.converged) and rel < 1e-6
