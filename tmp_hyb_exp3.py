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
L = 128
cq = jnp.asarray((cols // L).astype(np.int32)); cr = jnp.asarray((cols % L).astype(np.int32))
rq = jnp.asarray((rows // L).astype(np.int32)); rr = jnp.asarray((rows % L).astype(np.int32))
vals_d = jnp.asarray(vals)
iota = jnp.arange(L, dtype=jnp.int32)

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

def lane_gather(vv):
    x2 = vv.reshape(-1, L)
    xr = x2[cq]                                   # (nnz, 128) row gather
    return jnp.sum(xr * (cr[:, None] == iota[None, :]), axis=1)

# D: lane-row gather only (scalar scatter kept)
def stepD(vv):
    y = _spmv_dia(H.dia, vv)
    xg = lane_gather(vv)
    return y.at[jnp.asarray(rows)].add(vals_d * xg)
timeit("lane_gather+scalar_scatter", stepD)

# E: lane-row gather + lane-row scatter
def stepE(vv):
    y = _spmv_dia(H.dia, vv)
    xg = lane_gather(vv)
    contrib = (vals_d * xg)[:, None] * (rr[:, None] == iota[None, :])
    y2 = y.reshape(-1, L).at[rq].add(contrib)
    return y2.reshape(n)
timeit("lane_gather+lane_scatter", stepE)

# F: verify correctness vs current
from lssp_tpu.ops.spmv import spmv
ref = spmv(H, x + jnp.arange(n, dtype=jnp.float32) * 1e-7)
got = stepE(x + jnp.arange(n, dtype=jnp.float32) * 1e-7)
# stepE includes dia already; ref = spmv = dia+remainder; same
err = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
print("lane variant rel err vs current:", err)
