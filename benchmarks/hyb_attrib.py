"""HYB remainder bytes/time attribution (VERDICT r4 #5).

Round 4's tile-compact HYB kernel reached 0.69× of the plain-DIA
headline and *asserted* a per-entry 128-lane gather-traffic model for
the remaining 31%.  This harness MEASURES the attribution at the bench
scale (4.2M-row 5-point + 0.5% random strays, fp32):

  band        — the DIA part alone through the Pallas kernel
  gather      — contrib = tc_vals · lane_gather(x, tc_cols) alone
  kernel+fix  — the tc kernel with a PRECOMPUTED contrib (epilogue cost)
  full        — the shipped path (gather + kernel fused by XLA)

plus the model bytes for each term, so docs/performance.md carries a
measured bytes-accounting table instead of a narrated model.  Timing is
the same min-of-K repeat-marginal protocol as bench.py (tunnel-safe).

Usage (TPU):  python benchmarks/hyb_attrib.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _marginal(run, n_lo, n_hi, best_of=5):
    """min-of-K marginal seconds per iteration between two chained counts."""
    lo = [run(n_lo) for _ in range(best_of)]
    hi = [run(n_hi) for _ in range(best_of)]
    return (min(hi) - min(lo)) / (n_hi - n_lo)


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from lssp_tpu.sparse import laplacian_2d, CSR
    from lssp_tpu.sparse.convert import csr_to_hyb
    from lssp_tpu.ops.spmv import spmv, lane_gather
    from lssp_tpu.ops.pallas_spmv import dia_spmv_hyb_tc_pallas
    from lssp_tpu.utils.profile import enable_persistent_cache

    enable_persistent_cache()
    print(f"backend: {jax.default_backend()}", flush=True)
    float(jnp.sum(jnp.ones(8)))          # tunnel warm-up

    N, seed = 2048, 5
    rng = np.random.default_rng(seed)
    S = laplacian_2d(N, dtype=np.float32).to_scipy().tocoo()
    n = S.shape[0]
    n_extra = max(n // 200, 8)
    r = rng.integers(0, n, n_extra)
    c = rng.integers(0, n, n_extra)
    E = sp.coo_matrix((np.full(n_extra, 0.01, np.float32), (r, c)),
                      shape=S.shape)
    A = CSR.from_scipy((S + E).tocsr())
    H = jax.device_put(csr_to_hyb(A))
    x = jnp.ones(n, dtype=jnp.float32)
    assert H.tc_vals is not None, "tile-compact layout not built"
    nb, TS = H.tc_vals.shape
    nrem = int(np.count_nonzero(np.asarray(H.tc_vals)))
    ndiag = len(H.dia.offsets)

    def chain(step):
        def make(iters):
            @jax.jit
            def run(v):
                def body(v, _):
                    return step(v), None
                v, _ = jax.lax.scan(body, v, None, length=iters)
                return jnp.sum(v)

            def timed(_v=x):
                t0 = time.perf_counter()
                float(run(_v))
                return time.perf_counter() - t0
            float(run(x))            # compile+warm
            return timed
        return lambda iters: make(iters)()

    # 1. full shipped path
    t_full = _marginal(chain(lambda v: spmv(H, v) * 0.25), 20, 120)
    # 2. band alone
    t_band = _marginal(chain(lambda v: spmv(H.dia, v) * 0.25), 20, 120)
    # 3. gather alone (contrib compute; fold into v to keep the chain live)
    cols = H.tc_cols.reshape(-1)

    def g_step(v):
        xg = lane_gather(v, cols).reshape(nb, TS)
        contrib = H.tc_vals * xg
        return v * 0.9999 + jnp.sum(contrib) * 1e-30

    t_gather = _marginal(chain(g_step), 20, 120)
    # 4. kernel with fixed contrib (epilogue cost on top of the band)
    contrib0 = H.tc_vals * lane_gather(x, cols).reshape(nb, TS)

    interp = jax.default_backend() != "tpu"

    def k_step(v):
        return dia_spmv_hyb_tc_pallas(H, v, contrib0,
                                      interpret=interp) * 0.25

    t_kfix = _marginal(chain(k_step), 20, 120)

    # model bytes (useful traffic)
    fp = 4
    bytes_band = (ndiag * n + 2 * n) * fp
    bytes_slots = 3 * nb * TS * fp                  # contrib/win/lane reads
    bytes_gather_useful = nrem * 3 * fp             # val + col + x value
    bytes_gather_lanes = nb * TS * (128 + 1) * fp   # (1,128) row per slot
    roof = 819e9 if jax.default_backend() == "tpu" else 50e9

    rows = {
        "n": n, "nnz": A.nnz, "nrem": nrem, "slots": nb * TS,
        "ndiag": ndiag,
        "t_full_us": round(t_full * 1e6, 1),
        "t_band_us": round(t_band * 1e6, 1),
        "t_gather_us": round(t_gather * 1e6, 1),
        "t_kernel_fixed_contrib_us": round(t_kfix * 1e6, 1),
        "epilogue_us": round((t_kfix - t_band) * 1e6, 1),
        "gather_model_floor_us": round(bytes_gather_lanes / roof * 1e6, 1),
        "bytes_band": bytes_band,
        "bytes_slot_arrays": bytes_slots,
        "bytes_gather_useful": bytes_gather_useful,
        "bytes_gather_128lane": bytes_gather_lanes,
        "model_gbps_full": round(
            (bytes_band + bytes_gather_useful) / t_full / 1e9, 1),
        "sum_parts_us": round((t_band + t_gather
                               + (t_kfix - t_band)) * 1e6, 1),
    }
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
