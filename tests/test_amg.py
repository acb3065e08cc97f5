"""Native AMG tests: hierarchy structure, V-cycle convergence factor,
multigrid grid-size robustness, and AMG-preconditioned Krylov (BASELINE
config #5 shape: GMRES+AMG on anisotropic Poisson)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lssp_tpu import solve, SolverOptions, PCOptions
from lssp_tpu.amg import amg_setup, amg_solve, build_device_amg, vcycle
from lssp_tpu.amg.setup import strength_graph, pmis_coarsen, direct_interpolation
from lssp_tpu.ops.spmv import spmv
from lssp_tpu.sparse import laplacian_2d, laplacian_3d, anisotropic_poisson_2d


class TestSetup:
    def test_strength_poisson(self):
        A = laplacian_2d(8).to_scipy()
        S = strength_graph(A, 0.25)
        # all 4 neighbors are equally strong for the 5-pt stencil
        assert S.nnz == A.nnz - A.shape[0]

    def test_pmis_partitions(self):
        A = laplacian_2d(16).to_scipy()
        S = strength_graph(A, 0.25)
        state = pmis_coarsen(S)
        assert set(np.unique(state)) <= {-1, 1}
        nc = (state == 1).sum()
        assert 0 < nc < 256
        # every F point has a strong C neighbour
        Sc = S.tocsr()
        for i in np.nonzero(state == -1)[0]:
            cols = Sc.indices[Sc.indptr[i]:Sc.indptr[i + 1]]
            assert (state[cols] == 1).any()

    def test_interp_preserves_constants(self):
        A = laplacian_2d(16)
        hier = amg_setup(A)
        for lev in hier.levels[:-1]:
            # rows of P sum to ~1 for interior F points (constant vectors
            # interpolate exactly up to boundary effects)
            rs = np.asarray(lev.P.sum(axis=1)).ravel()
            assert np.isfinite(rs).all()

    def test_hierarchy_shrinks(self):
        hier = amg_setup(laplacian_2d(32))
        sizes = [l.A.shape[0] for l in hier.levels]
        assert sizes == sorted(sizes, reverse=True)
        assert sizes[-1] <= 64
        assert hier.complexity() < 4.0


class TestVCycle:
    def _cf(self, A, n_iter=12):
        hier = amg_setup(A)
        h = build_device_amg(hier)
        n = A.shape[0]
        b = jnp.ones(n, dtype=jnp.float64)
        x = jnp.zeros_like(b)
        Ad = h.levels[0].A
        norms = []
        for _ in range(n_iter):
            r = b - spmv(Ad, x)
            x = x + vcycle(h, r)
            norms.append(float(jnp.linalg.norm(b - spmv(Ad, x))))
        return (norms[-1] / norms[3]) ** (1.0 / (n_iter - 4))

    def test_cf_poisson2d(self):
        assert self._cf(laplacian_2d(64)) < 0.45

    def test_cf_grid_robust(self):
        cf32 = self._cf(laplacian_2d(32))
        cf64 = self._cf(laplacian_2d(64))
        assert cf64 < max(2.0 * cf32, 0.45)     # near grid-independent

    def test_cf_anisotropic(self):
        assert self._cf(anisotropic_poisson_2d(64, 0.001)) < 0.45

    def test_cf_poisson3d(self):
        assert self._cf(laplacian_3d(12)) < 0.5

    def test_standalone_solver(self):
        A = laplacian_2d(32)
        b = np.ones(1024)
        x, info = amg_solve(A, b)
        assert info["nits"] < 25
        res = np.linalg.norm(b - A.to_scipy() @ np.asarray(x))
        assert res <= 1.01 * max(1e-7 * 32, 1e-7)


class TestAMGPreconditioner:
    def test_cg_amg_poisson(self):
        A = laplacian_2d(64)
        b = jnp.ones(4096, dtype=jnp.float64)
        x, info = solve(A, b, method="cg", pc="amg")
        assert bool(info.converged)
        assert int(info.nits) <= 15
        res = np.linalg.norm(b - A.to_scipy() @ np.asarray(x))
        assert res <= 1.1e-7 * 64

    def test_gmres_amg_anisotropic(self):
        """BASELINE config #5 shape (scaled down for CI)."""
        A = anisotropic_poisson_2d(128, 0.001)
        b = jnp.ones(128 * 128, dtype=jnp.float64)
        x, info = solve(A, b, method="gmres", pc="amg",
                        options=SolverOptions(restart=30))
        assert bool(info.converged)
        assert int(info.nits) <= 20

    def test_iteration_count_grid_independence(self):
        """The multigrid hallmark: Krylov+AMG iterations stay ~constant as
        the grid refines (vs sqrt(n) growth unpreconditioned)."""
        counts = []
        for N in (32, 64, 96):
            A = laplacian_2d(N)
            b = jnp.ones(N * N, dtype=jnp.float64)
            x, info = solve(A, b, method="cg", pc="amg")
            counts.append(int(info.nits))
        assert counts[-1] <= counts[0] + 4


def test_classical_amg_tpu_dispatch(monkeypatch):
    """pc='amg' on the TPU backend builds the TPU-resident classical cycle
    (amg/rs.py) when its gather-free layout holds the interpolation mass,
    and falls back to saamg when it cannot (round-5 closure of the
    classical-AMG-on-TPU partial)."""
    import jax
    import numpy as np
    import scipy.sparse as sp
    import lssp_tpu as lt
    from lssp_tpu import pc as pc_mod
    from lssp_tpu.amg.rs import RSAMG
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    A = lt.sparse.laplacian_2d(32)
    M = pc_mod.setup(A, "amg")
    assert M.name == "amg" and isinstance(M.state, RSAMG)
    # a matrix whose interpolation offsets can't fit the layout routes to
    # saamg (random long-range couplings, tiny offset cap)
    rng = np.random.default_rng(4)
    n = 256
    i = rng.integers(0, n, 2000)
    j = rng.integers(0, n, 2000)
    m = i != j
    W = sp.csr_matrix((-np.ones(m.sum()), (i[m], j[m])), shape=(n, n))
    W = W + W.T
    Abad = lt.sparse.CSR.from_scipy(
        (W + sp.diags(-np.asarray(W.sum(axis=1)).ravel() + 1.0)).tocsr())
    M2 = pc_mod.setup(Abad, "amg", lt.PCOptions(amg_max_pdiags=2))
    assert "saamg" in M2.name
    # amg_force_classical pins the classical cycle regardless
    M3 = pc_mod.setup(Abad, "amg",
                      lt.PCOptions(amg_max_pdiags=2,
                                   amg_force_classical=True))
    assert M3.name == "amg" and isinstance(M3.state, RSAMG)


def test_fmg_initial_guess():
    """Full-multigrid start (the reference's FASP FMG solver type,
    solver-amg.cxx:99): the nested-iteration guess must not lose to the
    zero guess, on both cycle realizations."""
    import numpy as np
    from lssp_tpu.amg.cycle import amg_solve
    A = laplacian_2d(48)
    b = np.ones(A.shape[0])
    x1, i1 = amg_solve(A, b)
    x2, i2 = amg_solve(A, b, fmg=True)
    assert i2["nits"] <= i1["nits"]
    res = np.linalg.norm(b - A.to_scipy() @ np.asarray(x2))
    assert res <= 1.05 * max(1e-7 * np.sqrt(A.shape[0]), 1e-7)


@pytest.mark.parametrize("pc", ["amg", "rsamg", "saamg"])
def test_w_cycle(pc):
    """W-cycle (FASP AMG_param cycle_type capability) on all three cycle
    realizations: converges, and never needs more iterations than V."""
    from lssp_tpu import solve, PCOptions
    A = anisotropic_poisson_2d(64, 0.01)
    b = jnp.ones(A.shape[0], dtype=jnp.float64)
    o = SolverOptions(rtol=1e-8, atol=0.0, rbtol=0.0, maxit=100)
    xv, iv = solve(A, b, method="cg", pc=pc, options=o)
    xw, iw = solve(A, b, method="cg", pc=pc, options=o,
                   pc_options=PCOptions(amg_cycle_type="W"))
    resw = np.linalg.norm(np.asarray(b) - A.to_scipy() @ np.asarray(xw))
    assert bool(iw.converged) and resw < 1e-5
    assert int(iw.nits) <= int(iv.nits) + 1, (int(iw.nits), int(iv.nits))
