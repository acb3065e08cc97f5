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
