"""Native C++ kernels must produce bit-identical results to the Python
reference implementations."""
import numpy as np
import pytest

from lssp_tpu import native
from lssp_tpu.sparse import laplacian_2d, random_sparse, CSR
from lssp_tpu.sparse.utils import adjust_zero_diag, sort_columns

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _python_env(monkeypatch):
    monkeypatch.setenv("LSSP_TPU_NO_NATIVE", "1")


class TestNativeParity:
    def test_levels(self):
        import scipy.sparse as sp
        rs = np.random.RandomState(0)
        S = sp.random(300, 300, density=0.05, random_state=rs, format="csr")
        L = sp.tril(S, k=-1).tocsr()
        ip = L.indptr.astype(np.int64)
        idx = L.indices.astype(np.int64)
        nat = native.levels(ip, idx, 300, True)
        # python oracle
        lev = np.zeros(300, dtype=np.int64)
        for i in range(300):
            s, e = ip[i], ip[i + 1]
            if e > s:
                lev[i] = lev[idx[s:e]].max() + 1
        np.testing.assert_array_equal(nat, lev)

    @pytest.mark.parametrize("level", [0, 1, 2])
    def test_iluk_identical(self, level, monkeypatch):
        A = laplacian_2d(20)
        from lssp_tpu.pc.ilu_host import iluk_factor
        Ln, Un = iluk_factor(A, level=level)           # native
        monkeypatch.setenv("LSSP_TPU_NO_NATIVE", "1")
        import lssp_tpu.native as nat
        monkeypatch.setattr(nat, "_lib", None)
        monkeypatch.setattr(nat, "_tried", True)
        Lp, Up = iluk_factor(A, level=level)           # python
        np.testing.assert_array_equal(np.asarray(Ln.indices), np.asarray(Lp.indices))
        np.testing.assert_array_equal(np.asarray(Un.indices), np.asarray(Up.indices))
        # values differ by ≤1 ulp (g++ -march=native contracts mul+sub to FMA)
        np.testing.assert_allclose(np.asarray(Ln.data), np.asarray(Lp.data),
                                   rtol=1e-14, atol=1e-300)
        np.testing.assert_allclose(np.asarray(Un.data), np.asarray(Up.data),
                                   rtol=1e-14, atol=1e-300)

    def test_ilut_identical(self, monkeypatch):
        A = random_sparse(80, 6, seed=2)
        from lssp_tpu.pc.ilu_host import ilut_factor
        Ln, Un = ilut_factor(A, tol=1e-2, p=5)         # native
        monkeypatch.setenv("LSSP_TPU_NO_NATIVE", "1")
        import lssp_tpu.native as nat
        monkeypatch.setattr(nat, "_lib", None)
        monkeypatch.setattr(nat, "_tried", True)
        Lp, Up = ilut_factor(A, tol=1e-2, p=5)         # python
        np.testing.assert_array_equal(np.asarray(Ln.indices), np.asarray(Lp.indices))
        np.testing.assert_array_equal(np.asarray(Un.indices), np.asarray(Up.indices))
        np.testing.assert_allclose(np.asarray(Ln.data), np.asarray(Lp.data), rtol=1e-14)
        np.testing.assert_allclose(np.asarray(Un.data), np.asarray(Up.data), rtol=1e-14)


def test_native_spqr_matches_python_oracle():
    """C++ George–Heath merge loop vs the pure-Python path (same merges,
    same rotation order)."""
    import os
    import scipy.sparse as sp
    from lssp_tpu import native
    from lssp_tpu.pc.qr_host import qr_factor, qr_solve
    from lssp_tpu.sparse.types import CSR
    if not native.available():
        import pytest
        pytest.skip("no compiler")
    A0 = sp.random(150, 70, density=0.04, random_state=2, format="csr")
    A0 = (A0 + sp.vstack([sp.eye(70), sp.csr_matrix((80, 70))])).tocsr()
    A = CSR.from_scipy(A0)
    b = np.arange(150, dtype=float)
    fn_ = qr_factor(A, b=b)
    xn = qr_solve(fn_)
    os.environ["LSSP_TPU_NO_NATIVE"] = "1"
    native._tried = False
    native._lib = None
    try:
        fp = qr_factor(A, b=b)
        xp = qr_solve(fp)
    finally:
        del os.environ["LSSP_TPU_NO_NATIVE"]
        native._tried = False
        native._lib = None
    np.testing.assert_allclose(xn, xp, rtol=1e-12, atol=1e-13)
    assert abs(fn_.resnorm - fp.resnorm) <= 1e-10 * (1 + fp.resnorm)


def test_spqr_resnorm_is_true_residual():
    """factor-time resnorm == independently computed ||b - A x||."""
    import scipy.sparse as sp
    from lssp_tpu.pc.qr_host import qr_factor, qr_solve
    from lssp_tpu.sparse.types import CSR
    A0 = sp.random(150, 70, density=0.04, random_state=2, format="csr")
    A0 = (A0 + sp.vstack([sp.eye(70), sp.csr_matrix((80, 70))])).tocsr()
    A = CSR.from_scipy(A0)
    b = np.arange(150, dtype=float)
    f = qr_factor(A, b=b)
    x = qr_solve(f)
    np.testing.assert_allclose(f.resnorm, np.linalg.norm(b - A0 @ x),
                               rtol=1e-10)


import scipy.sparse as sp


class TestAmgFilterParity:
    """C++ amgfilter kernels (native/src/amgfilter.cpp) against the numpy
    oracles — bit-identical by construction (same per-row left-to-right
    lump accumulation; np.rint == round-half-to-even == std::nearbyint)."""

    def _toggle(self, monkeypatch):
        from lssp_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        return native

    def test_filter_lumped_parity(self, monkeypatch):
        import lssp_tpu.amg.sa as sa
        native = self._toggle(monkeypatch)
        rng = np.random.default_rng(11)
        for n in (60, 230):
            A = sp.random(n, n, density=0.06, random_state=n,
                          format="csr") + sp.eye(n) * 2.0
            A = A.tocsr(); A.sum_duplicates()
            F1 = sa._filter_lumped(A.copy(), 0.08)
            monkeypatch.setattr(native, "available", lambda: False)
            F2 = sa._filter_lumped(A.copy(), 0.08)
            monkeypatch.undo()
            np.testing.assert_array_equal(F1.indptr, F2.indptr)
            np.testing.assert_array_equal(F1.indices, F2.indices)
            np.testing.assert_array_equal(F1.data, F2.data)

    def test_lump_pattern_parity(self, monkeypatch):
        import lssp_tpu.amg.sa as sa
        native = self._toggle(monkeypatch)
        A = sp.random(144, 144, density=0.08, random_state=4,
                      format="csr") + sp.eye(144) * 2.0
        A = A.tocsr(); A.sum_duplicates()
        L1 = sa._lump_to_pattern(A.copy(), 12, 12, 1, 1)
        monkeypatch.setattr(native, "available", lambda: False)
        L2 = sa._lump_to_pattern(A.copy(), 12, 12, 1, 1)
        monkeypatch.undo()
        np.testing.assert_array_equal(L1.indptr, L2.indptr)
        np.testing.assert_array_equal(L1.indices, L2.indices)
        np.testing.assert_array_equal(L1.data, L2.data)

    def test_dia_convert_parity(self, monkeypatch):
        from lssp_tpu.sparse.convert import csr_to_dia
        from lssp_tpu.sparse.types import CSR
        native = self._toggle(monkeypatch)
        B = sp.random(200, 200, density=0.03, random_state=9,
                      format="csr") + sp.eye(200)
        B = B.tocsr(); B.sum_duplicates()
        C = CSR.from_scipy(B)
        for dt in (np.float32, np.float64):
            D1 = csr_to_dia(C, max_diags=4096, dtype=dt)
            monkeypatch.setattr(native, "available", lambda: False)
            D2 = csr_to_dia(C, max_diags=4096, dtype=dt)
            monkeypatch.undo()
            assert D1.offsets == D2.offsets
            np.testing.assert_array_equal(D1.data, D2.data)
        # over-max raises identically
        with pytest.raises(ValueError):
            csr_to_dia(C, max_diags=2)


class TestRAP:
    """Fused Galerkin product (native/src/rap.cpp) vs the scipy oracle."""

    def _case(self, seed, n=400, nc=90, with_b=True):
        import scipy.sparse as sp
        rng = np.random.default_rng(seed)
        A = sp.random(n, n, density=0.03, random_state=seed).tocsr()
        A = (A + A.T + sp.eye(n)).tocsr()
        B = None
        if with_b:
            B = (sp.random(n, n, density=0.012,
                           random_state=seed + 1).tocsr() + sp.eye(n)).tocsr()
        p0 = rng.integers(0, nc, n)
        return A, B, p0, nc

    @pytest.mark.parametrize("with_b", [True, False])
    def test_matches_scipy(self, with_b):
        import scipy.sparse as sp
        from lssp_tpu import native
        if not native.available():
            pytest.skip("no native toolchain")
        A, B, p0, nc = self._case(0, with_b=with_b)
        Ac = native.rap(A, B, p0, nc)
        P0 = sp.csr_matrix((np.ones(A.shape[0]), p0,
                            np.arange(A.shape[0] + 1)),
                           shape=(A.shape[0], nc))
        P = (B @ P0).tocsr() if B is not None else P0
        ref = (P.T @ A @ P).tocsr()
        ref.sum_duplicates()
        d = abs(Ac - ref)
        assert (d.max() if d.nnz else 0.0) < 1e-12

    def test_cap_retry(self):
        """The kernel reports a usable size estimate on overflow and the
        wrapper retries (exercised by shrinking the first cap)."""
        from lssp_tpu import native
        if not native.available():
            pytest.skip("no native toolchain")
        import scipy.sparse as sp
        A, B, p0, nc = self._case(3, n=600, nc=40)
        # dense-ish coarse op => first cap (0.6*nnzA) may or may not
        # suffice; force the retry path by calling the raw fn with tiny cap
        ip = A.indptr
        fn_name = "lssp_rap_i32" if ip.dtype == np.int32 else "lssp_rap_i64"
        lib = native.load()
        fn = getattr(lib, fn_name)
        oip = np.empty(nc + 1, dtype=ip.dtype)
        oix = np.empty(8, dtype=ip.dtype)
        oax = np.empty(8, dtype=np.float64)
        bx = np.ascontiguousarray(B.data, np.float64)
        bp = np.ascontiguousarray(B.indptr, ip.dtype)
        bj = np.ascontiguousarray(B.indices, ip.dtype)
        out = fn(ip, A.indices.astype(ip.dtype),
                 np.ascontiguousarray(A.data, np.float64), A.shape[0],
                 bp.ctypes.data, bj.ctypes.data, bx.ctypes.data,
                 np.ascontiguousarray(p0, ip.dtype), nc, oip, oix, oax, 8)
        assert out < 0 and -out > 8      # needs more space, estimate given

    def test_gersh_matches_numpy(self):
        from lssp_tpu import native
        if not native.available():
            pytest.skip("no native toolchain")
        import scipy.sparse as sp
        A, _, _, _ = self._case(5, with_b=False)
        dinv = 1.0 / A.diagonal()
        g = native.gersh(A.indptr, A.data, dinv, A.shape[0])
        ref = float((np.add.reduceat(np.abs(A.data), A.indptr[:-1])
                     * np.abs(dinv)).max())
        assert abs(g - ref) < 1e-12
