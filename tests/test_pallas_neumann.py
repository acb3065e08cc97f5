"""Fused Neumann-ILU Pallas kernel (ops/pallas_neumann.py) vs the XLA
Neumann oracle (ops/trisolve.py) — interpret mode on CPU.

The fused kernel must reproduce the truncated-Neumann apply in fp32:
same band sweeps, same stray handling (exact one-hot gather/scatter),
same diagonal scale.  Tolerance is fp32 round-off over a different
summation order, not bitwise.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lssp_tpu.pc.ilu_host import iluk_factor
from lssp_tpu.ops.trisolve import make_neumann_tri, neumann_ilu_apply
from lssp_tpu.ops.pallas_neumann import plan_fused_neumann, \
    fused_neumann_apply


def _oracle(L, U, sweeps, r):
    """fp32 XLA Neumann apply on the same factors."""
    import dataclasses
    L32 = dataclasses.replace(L, data=np.asarray(L.data, np.float32))
    U32 = dataclasses.replace(U, data=np.asarray(U.data, np.float32))
    st = make_neumann_tri(L32, U32, sweeps=sweeps)
    return np.asarray(neumann_ilu_apply(st, jnp.asarray(r, jnp.float32)))


def _strayed_laplacian(n1d, nstray, seed=0):
    """2-D Laplacian plus random long-range couplings (the coupled3d
    pattern class: dominant band + scattered remainder)."""
    from lssp_tpu.sparse import laplacian_2d
    from lssp_tpu.sparse.types import CSR
    import scipy.sparse as sp
    A = laplacian_2d(n1d, dtype=np.float64)
    S = sp.csr_matrix((np.asarray(A.data), np.asarray(A.indices),
                       np.asarray(A.indptr)), shape=A.shape)
    rng = np.random.default_rng(seed)
    n = A.shape[0]
    r = rng.integers(0, n, nstray)
    c = rng.integers(0, n, nstray)
    keep = r != c
    E = sp.coo_matrix((0.1 * rng.standard_normal(keep.sum()),
                       (r[keep], c[keep])), shape=A.shape)
    M = (S + E.tocsr()).tocsr()
    M.sort_indices()
    return CSR(M.indptr, M.indices, M.data, M.shape)


@pytest.mark.parametrize("sweeps", [2, 6])
def test_fused_matches_oracle_banded(sweeps):
    from lssp_tpu.sparse import laplacian_2d
    A = laplacian_2d(64, dtype=np.float64)          # n=4096 ≥ the 1024 floor
    L, U = iluk_factor(A, level=0)
    st = plan_fused_neumann(L, U, sweeps)
    assert st is not None
    assert st.L.gt is None and st.U.gt is None       # pure band
    r = np.random.default_rng(1).standard_normal(A.shape[0])
    z = np.asarray(fused_neumann_apply(st, jnp.asarray(r), interpret=True))
    ref = _oracle(L, U, sweeps, r)
    assert np.allclose(z, ref, rtol=2e-5, atol=1e-6)


def test_fused_matches_oracle_with_strays():
    A = _strayed_laplacian(48, 300)
    L, U = iluk_factor(A, level=1)
    st = plan_fused_neumann(L, U, 4)
    assert st is not None
    assert st.L.gt is not None or st.U.gt is not None
    r = np.random.default_rng(2).standard_normal(A.shape[0])
    z = np.asarray(fused_neumann_apply(st, jnp.asarray(r), interpret=True))
    ref = _oracle(L, U, 4, r)
    assert np.allclose(z, ref, rtol=2e-5, atol=1e-6)


def test_fused_pads_non_aligned_n():
    from lssp_tpu.sparse import laplacian_2d
    A = laplacian_2d(37, dtype=np.float64)          # n=1369, not 1024-aligned
    L, U = iluk_factor(A, level=0)
    st = plan_fused_neumann(L, U, 3)
    assert st is not None and st.P % 1024 == 0 and st.P >= A.shape[0]
    r = np.random.default_rng(3).standard_normal(A.shape[0])
    z = np.asarray(fused_neumann_apply(st, jnp.asarray(r), interpret=True))
    ref = _oracle(L, U, 3, r)
    assert z.shape == (A.shape[0],)
    assert np.allclose(z, ref, rtol=2e-5, atol=1e-6)


def test_plan_rejects_oversized():
    from lssp_tpu.sparse import laplacian_2d
    A = laplacian_2d(64, dtype=np.float64)
    L, U = iluk_factor(A, level=0)
    assert plan_fused_neumann(L, U, 6, vmem_budget=1024) is None


def test_vmap_over_rhs_matches_loop():
    """solve_ir_multi vmaps the inner per column — the custom_vmap rule
    (batched shifted-stream SpMM sweeps for pure-band factors) must
    produce per-column applies matching the unbatched kernel."""
    from lssp_tpu.sparse import laplacian_2d
    A = laplacian_2d(48, dtype=np.float64)
    L, U = iluk_factor(A, level=0)
    st = plan_fused_neumann(L, U, 3)
    assert st.L.gt is None                      # exercises the SpMM rule
    R = jnp.asarray(np.random.default_rng(5).standard_normal((4, A.shape[0])))
    import jax
    Z = jax.vmap(lambda r: fused_neumann_apply(st, r, interpret=True))(R)
    for j in range(4):
        zj = fused_neumann_apply(st, R[j], interpret=True)
        assert np.allclose(np.asarray(Z[j]), np.asarray(zj),
                           rtol=1e-5, atol=1e-7)


def test_vmap_over_rhs_with_strays():
    """Factors with off-band strays take the per-column lax.map rule."""
    A = _strayed_laplacian(40, 200, seed=9)
    L, U = iluk_factor(A, level=1)
    st = plan_fused_neumann(L, U, 3)
    assert st.L.gt is not None or st.U.gt is not None
    R = jnp.asarray(np.random.default_rng(6).standard_normal((3, A.shape[0])))
    import jax
    Z = jax.vmap(lambda r: fused_neumann_apply(st, r, interpret=True))(R)
    for j in range(3):
        zj = fused_neumann_apply(st, R[j], interpret=True)
        assert np.allclose(np.asarray(Z[j]), np.asarray(zj),
                           rtol=1e-6, atol=0.0)


def test_fp64_roundtrip_dtype():
    from lssp_tpu.sparse import laplacian_2d
    A = laplacian_2d(64, dtype=np.float64)
    L, U = iluk_factor(A, level=0)
    st = plan_fused_neumann(L, U, 2)
    r = jnp.asarray(np.random.default_rng(4).standard_normal(A.shape[0]))
    z = fused_neumann_apply(st, r, interpret=True)
    assert z.dtype == r.dtype
