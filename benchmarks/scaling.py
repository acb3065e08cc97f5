"""Weak-scaling structure sweep on the virtual device mesh (VERDICT r3 #8).

Real multi-chip hardware is unavailable in this environment, so this
artifact validates the SCALING STRUCTURE of the distributed path on a
1→8-shard virtual CPU mesh: per-shard problem size held fixed while the
shard count grows, measuring the TOTAL-WORK INFLATION the distributed
machinery adds (halo exchanges, psum reductions, padding, per-shard
dispatch).

On this host all virtual devices serialize onto ONE physical core
(``nproc`` = 1), so wall time at P shards ideally equals P × the 1-shard
time; the reported efficiency is

    eff(P) = P · t(1 shard, n rows) / t(P shards, P·n rows)

— a structural weak-scaling efficiency: 1.0 means the halo/psum overhead
is zero-cost relative to the shard-local compute; the ICI latency/BW
terms of real hardware are modeled separately (docs/performance.md
"Distributed scaling model").  This is the honest measurable complement:
overhead structure from measurement, interconnect terms from the model.

Outputs SCALING_r04.json: one record per (op, P) with times and
efficiency.  tests/test_dist.py asserts a floor on these curves.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        JAX_PLATFORMS=cpu python benchmarks/scaling.py [--out FILE]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

ROWS_PER_SHARD = 131072          # weak scaling: fixed per-shard rows
SPMV_ITERS = 60
CG_ITERS = 40


def _spmv_program(A, P, iters):
    """One jitted shard_map program: ``iters`` chained DistDIA SpMVs."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as Pspec
    from lssp_tpu.parallel.dist_ops import make_dist_spmv
    from lssp_tpu.parallel.dist_solve import make_mesh, AXIS
    from lssp_tpu.parallel.partition import partition_csr_dia

    mesh = make_mesh(P)
    M = partition_csr_dia(A, P)
    op = make_dist_spmv(M, AXIS)

    def body(d, v):
        d_l, v_l = d[0], v[0]
        def step(v_l, _):
            return op(d_l, v_l) * 0.25, None
        v_l, _ = jax.lax.scan(step, v_l, None, length=iters)
        return jnp.sum(v_l)[None]

    mapped = jax.jit(jax.shard_map(body, mesh=mesh,
                                   in_specs=(Pspec(AXIS), Pspec(AXIS)),
                                   out_specs=Pspec(AXIS), check_vma=False))
    data = jnp.asarray(M.data)
    n = A.shape[0]
    x = jnp.ones((P, n // P), dtype=jnp.float32)
    return lambda: float(mapped(data, x)[0])


def _cg_run(A, P, iters):
    """Fixed-iteration distributed CG (rtol=0 → exactly ``iters`` its)."""
    import jax.numpy as jnp
    from lssp_tpu import SolverOptions
    from lssp_tpu.parallel.dist_solve import dist_solve, make_mesh

    mesh = make_mesh(P)
    b = jnp.ones(A.shape[0], dtype=jnp.float64)
    opts = SolverOptions(rtol=0.0, atol=0.0, rbtol=0.0, maxit=iters)

    def run():
        x, info = dist_solve(A, b, method="cg", pc="jacobi", mesh=mesh,
                             options=opts)
        return float(info.residual)
    return run


def _best_of(run, reps=5):
    run()                                       # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--shards", default="1,2,4,8")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from lssp_tpu.sparse import laplacian_2d

    shard_counts = [int(s) for s in args.shards.split(",")]
    assert len(jax.devices()) >= max(shard_counts)

    records = []
    base = {}
    for P in shard_counts:
        n_side = int(np.sqrt(P * ROWS_PER_SHARD))
        A = laplacian_2d(n_side, dtype=np.float64)
        A32 = laplacian_2d(n_side, dtype=np.float32)
        n = A.shape[0]

        t_spmv = _best_of(_spmv_program(A32, P, SPMV_ITERS))
        t_cg = _best_of(_cg_run(A, P, CG_ITERS), reps=3)
        for op, t in (("dist_dia_spmv", t_spmv), ("dist_cg_jacobi", t_cg)):
            if P == shard_counts[0]:
                base[op] = t / P
            eff = base[op] * P / t
            rec = dict(op=op, shards=P, rows=n, rows_per_shard=n // P,
                       iters=SPMV_ITERS if op == "dist_dia_spmv" else CG_ITERS,
                       wall_s=round(t, 4),
                       weak_eff_structural=round(eff, 4),
                       note="single-core host: eff = P*t(1)/t(P), "
                            "overhead-structure metric (see module doc)")
            records.append(rec)
            print(json.dumps(rec))

    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
