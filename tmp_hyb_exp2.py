import time, numpy as np, jax, jax.numpy as jnp
import scipy.sparse as sp
from lssp_tpu.sparse import laplacian_2d, CSR
from lssp_tpu.sparse.convert import csr_to_hyb
from lssp_tpu.ops.spmv import _spmv_dia

N = 2048
rng = np.random.default_rng(5)
S = laplacian_2d(N, dtype=np.float32).to_scipy().tocoo()
n = S.shape[0]
n_extra = max(n // 200, 8)
r = rng.integers(0, n, n_extra); c = rng.integers(0, n, n_extra)
E = sp.coo_matrix((np.full(n_extra, 0.01, np.float32), (r, c)), shape=S.shape)
A = CSR.from_scipy((S + E).tocsr())
H = jax.device_put(csr_to_hyb(A))
x = jnp.ones(n, dtype=jnp.float32)

rows = np.asarray(H.rem_rows); cols = np.asarray(H.rem_cols); vals = np.asarray(H.rem_vals)
# sort entries by row; compact unique rows + seg ids
order = np.argsort(rows, kind="stable")
rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
urows, seg = np.unique(rows_s, return_inverse=True)
# compact unique cols + ids (entry order = row-sorted)
ucols, colid = np.unique(cols_s, return_inverse=True)
d_urows, d_seg = jnp.asarray(urows), jnp.asarray(seg.astype(np.int32))
d_ucols, d_colid = jnp.asarray(ucols), jnp.asarray(colid.astype(np.int32))
d_vals = jnp.asarray(vals_s)
nu_r, nu_c = len(urows), len(ucols)
print("entries", len(rows), "unique rows", nu_r, "unique cols", nu_c)

def timeit(name, step):
    def make(it):
        @jax.jit
        def g(xv):
            def body(vv, _):
                return step(vv) * 0.25, None
            vv, _ = jax.lax.scan(body, xv, None, length=it)
            return jnp.sum(vv)
        return g
    g1, g2 = make(20), make(120)
    float(g1(x)); float(g2(x))
    best = 1e9
    for _ in range(5):
        t0=time.perf_counter(); float(g1(x)); t1=time.perf_counter(); float(g2(x)); t2=time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/100)
    print(f"{name}: {best*1e6:.1f} us/iter")

# A: hinted compact gather only
def stepA(vv):
    y = _spmv_dia(H.dia, vv)
    xu = vv.at[d_ucols].get(indices_are_sorted=True, unique_indices=True)
    return y + jnp.sum(xu) / n
timeit("dia+hinted_unique_gather", stepA)

# B: full compact pipeline
def stepB(vv):
    y = _spmv_dia(H.dia, vv)
    xu = vv.at[d_ucols].get(indices_are_sorted=True, unique_indices=True)
    contrib = d_vals * xu[d_colid]
    compact = jax.ops.segment_sum(contrib, d_seg, num_segments=nu_r,
                                  indices_are_sorted=True)
    return y.at[d_urows].add(compact, indices_are_sorted=True,
                             unique_indices=True)
timeit("compact_full", stepB)

# C: hinted scatter only on top of hinted gather (no segsum; rows unique already? no)
def stepC(vv):
    y = _spmv_dia(H.dia, vv)
    xu = vv.at[d_ucols].get(indices_are_sorted=True, unique_indices=True)
    contrib = d_vals * xu[d_colid]
    return y.at[jnp.asarray(rows_s)].add(contrib, indices_are_sorted=True)
timeit("sorted_scatter_nonunique", stepC)
