import time, numpy as np, jax, jax.numpy as jnp
import scipy.sparse as sp
from lssp_tpu.sparse import laplacian_2d, CSR
from lssp_tpu.sparse.convert import csr_to_hyb
from lssp_tpu.ops.spmv import spmv, _spmv_dia

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
nrem = int(np.asarray(H.rem_rows).shape[0])
print("n", n, "nrem", nrem, "ndiag", len(H.dia.offsets))

# row-chunk bucketing on host
B = 256
rows = np.asarray(H.rem_rows); cols = np.asarray(H.rem_cols); vals = np.asarray(H.rem_vals)
nc = n // B
chunk = rows // B
order = np.argsort(chunk, kind="stable")
rows_s, cols_s, vals_s = rows[order], cols[order], vals[order]
cnt = np.bincount(chunk, minlength=nc)
Smax = int(cnt.max())
print("Smax per chunk", Smax)
# pad to (nc, Smax)
rloc = np.zeros((nc, Smax), np.int32); cidx = np.zeros((nc, Smax), np.int32)
v = np.zeros((nc, Smax), np.float32)
pos = np.zeros(nc, np.int64)
for i in range(len(rows_s)):
    ch = rows_s[i] // B
    p = pos[ch]; pos[ch] = p + 1
    rloc[ch, p] = rows_s[i] % B; cidx[ch, p] = cols_s[i]; v[ch, p] = vals_s[i]
v[:, :] = np.where(np.arange(Smax)[None, :] < cnt[:, None], v, 0.0)
rloc_d, cidx_d, v_d = map(jnp.asarray, (rloc, cidx, v))

def run_variant(name, step):
    @jax.jit
    def f(xv, iters_arr):
        def body(vv, _):
            return step(vv) * 0.25, None
        vv, _ = jax.lax.scan(body, xv, None, length=iters_arr)
        return jnp.sum(vv)
    f20 = jax.jit(lambda xv: f(xv, 20)) if False else None
    # build two lengths
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
    return best

run_variant("dia_only", lambda vv: _spmv_dia(H.dia, vv))
run_variant("dia+gather", lambda vv: _spmv_dia(H.dia, vv) + jnp.sum(H.rem_vals * vv[H.rem_cols]) / n)
run_variant("current(hyb)", lambda vv: spmv(H, vv))
def onehot_step(vv):
    y = _spmv_dia(H.dia, vv)
    xg = vv[cidx_d]                       # (nc, Smax) gather
    contrib = v_d * xg
    oh = (rloc_d[:, :, None] == jnp.arange(B, dtype=jnp.int32)[None, None, :])
    upd = jnp.sum(jnp.where(oh, contrib[:, :, None], 0.0), axis=1)  # (nc, B)
    return y + upd.reshape(n)
run_variant("onehot_scatter", onehot_step)
