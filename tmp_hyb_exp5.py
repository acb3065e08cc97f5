import time, numpy as np, jax, jax.numpy as jnp
import scipy.sparse as sp
from lssp_tpu.sparse import laplacian_2d, CSR
from lssp_tpu.sparse.convert import csr_to_hyb
from lssp_tpu.ops.spmv import spmv, _spmv_dia, lane_gather
from lssp_tpu.ops.pallas_spmv import dia_spmv_hyb_pallas

N = 2048
rng = np.random.default_rng(5)
S0 = laplacian_2d(N, dtype=np.float32).to_scipy().tocoo()
n = S0.shape[0]
n_extra = max(n // 200, 8)
r = rng.integers(0, n, n_extra); c = rng.integers(0, n, n_extra)
E = sp.coo_matrix((np.full(n_extra, 0.01, np.float32), (r, c)), shape=S0.shape)
A = CSR.from_scipy((S0 + E).tocsr())
H = jax.device_put(csr_to_hyb(A))
S, nwin = H.win_vals.shape
x = jnp.ones(n, dtype=jnp.float32)

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
    for _ in range(7):
        t0=time.perf_counter(); float(g1(x)); t1=time.perf_counter(); float(g2(x)); t2=time.perf_counter()
        best = min(best, ((t2-t1)-(t1-t0))/100)
    print(f"{name}: {best*1e6:.1f} us/iter", flush=True)

timeit("dia_only", lambda vv: _spmv_dia(H.dia, vv))
timeit("slot_gather_only", lambda vv: _spmv_dia(H.dia, vv)
       + jnp.sum(lane_gather(vv, H.win_cols.reshape(-1))) / n)
def fused_no_ovr(vv):
    xg = lane_gather(vv, H.win_cols.reshape(-1)).reshape(S, nwin)
    return dia_spmv_hyb_pallas(H, vv, H.win_vals * xg)
timeit("fused_kernel_no_ovr", fused_no_ovr)
timeit("hyb_full", lambda vv: spmv(H, vv))
