"""Benchmark: SpMV sustained bandwidth per chip (the BASELINE north-star
metric; the reference publishes no numbers — BASELINE.md).

Runs on whatever accelerator jax sees (one real TPU chip under the driver).
Prints exactly ONE JSON line:
  {"metric": "spmv_gbps", "value": ..., "unit": "GB/s", "vs_baseline": ...}

``vs_baseline`` is the fraction of the chip's HBM-bandwidth roofline
(BASELINE target: >=0.70).  Memory-traffic model for the DIA 5-point SpMV:
diagonal values (ndiag*n reads) + x (n read; shifted reuse assumed cached)
+ y (n write), all in fp32.
"""
import json
import time

import numpy as np


# HBM bandwidth rooflines (GB/s) by chip generation
ROOFLINE = {
    "v5 lite": 819.0,   # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,       # v6e (Trillium) ~1.6 TB/s
    "cpu": 50.0,
}


def chip_roofline(dev) -> float:
    kind = getattr(dev, "device_kind", "").lower()
    for key, bw in ROOFLINE.items():
        if key in kind:
            return bw
    return 819.0


def main():
    import jax
    import jax.numpy as jnp
    from lssp_tpu.sparse import laplacian_2d, csr_to_dia
    from lssp_tpu.ops.spmv import spmv

    dev = jax.devices()[0]
    N = 2048                                # n = 4.19M rows, nnz ≈ 21M
    A = laplacian_2d(N, dtype=np.float32)
    D = csr_to_dia(A)
    n = A.shape[0]
    nnz = A.nnz
    ndiag = len(D.offsets)

    D = jax.device_put(D, dev)
    x = jax.device_put(jnp.ones(n, dtype=jnp.float32), dev)

    # Timing methodology: the scan loop runs fully on-device (one dispatch);
    # fetching the scalar sum forces completion (block_until_ready through
    # the remote-attach tunnel does not).  The per-iteration cost is the
    # *marginal* difference between two scan lengths, cancelling the fixed
    # dispatch/transfer overhead (~28 ms through the tunnel).
    def make(iters):
        @jax.jit
        def run(M, v):
            def step(v, _):
                return spmv(M, v) * 0.25, None   # feedback keeps iters live
            v, _ = jax.lax.scan(step, v, None, length=iters)
            return jnp.sum(v)
        return run

    i1, i2 = 20, 120
    f1, f2 = make(i1), make(i2)
    float(f1(D, x)), float(f2(D, x))             # compile + warm-up

    def best_of(f, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(D, x))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (best_of(f2) - best_of(f1)) / (i2 - i1)

    bytes_per = (ndiag * n + n + n) * 4     # values + x + y, fp32
    gbps = bytes_per / dt / 1e9
    roof = chip_roofline(dev)
    print(json.dumps({
        "metric": "spmv_gbps",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbps / roof, 4),
    }))


if __name__ == "__main__":
    main()
