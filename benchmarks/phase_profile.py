"""Per-iteration phase split for the unstructured acceptance configs.

VERDICT r3 item 4: ``bicgstab_iluk_coupled3d_mtx`` runs at ~17 Mnnz/s vs
2000+ for the banded configs, and no per-phase split existed to prove
where the time goes.  This harness times, on the real device, the three
phase kernels that compose one Krylov iteration:

  * ``spmv``  — one execution-format SpMV with the system matrix,
  * ``pc``    — one full preconditioner application (for ILU at
                ``ilu_sweeps=k``: 2k factor SpMVs + the diagonal scale),
  * ``dot``   — one fused vdot (mul+sum) on n-vectors.

Measurement protocol: each phase is a jitted ``lax.fori_loop`` of the
kernel with an eps-feedback carry (``arg = r0 + 1e-300*prev``) so XLA can
neither hoist the loop-invariant computation nor let the iterates grow;
marginal timing between two loop lengths removes dispatch and fetch
overhead (the axon tunnel makes one-shot timing meaningless — see
.claude/skills/verify/SKILL.md).  Output: one JSON line per config with
per-phase microseconds and the implied per-iteration composition.

Reference protocol anchor: per-phase assemble/solve timers,
/root/reference/src/lssp.cxx:162-184.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MATDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "matrices")


def _marginal(fn, k1, k2, reps=5):
    """Best-of-reps marginal seconds-per-iteration between loop lengths."""
    fn(k1)
    fn(k2)                                   # compile both
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(k1)
        t1 = time.perf_counter()
        fn(k2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best


def profile_config(name, A_csr, method, pc_name, pc_opts, opts):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from lssp_tpu.solvers.facade import _prepare_matrix
    from lssp_tpu.pc.base import setup as pc_setup
    from lssp_tpu.ops.spmv import spmv
    from lssp_tpu.solvers.base import vdot

    A_host, A_dev, perm = _prepare_matrix(A_csr, reorder="auto")
    M = pc_setup(A_host, pc_name, pc_opts)
    n = A_host.shape[0]
    r0 = jnp.asarray(np.random.default_rng(0).standard_normal(n))

    eps = 1e-300

    def loop(kernel):
        @jax.jit
        def run(k, z0):
            def body(_, z):
                return kernel(r0 + eps * z)
            z = lax.fori_loop(0, k, body, z0)
            return jnp.sum(z)
        return lambda k: float(run(k, jnp.zeros_like(r0)))

    fmt = type(A_dev).__name__
    phases = {
        "spmv": loop(lambda v: spmv(A_dev, v)),
        "pc": loop(lambda v: M(v)),
        "dot": loop(lambda v: r0 * vdot(v, r0)),
    }
    out = {"config": name, "n": n, "nnz": int(A_host.nnz),
           "format": fmt, "pc": M.name,
           "backend": jax.default_backend()}
    k1, k2 = 50, 150
    for pname, fn in phases.items():
        out[f"{pname}_us"] = round(_marginal(fn, k1, k2) * 1e6, 2)
    # implied composition of one iteration for the two-spmv product methods
    # (bicgstab: 2 spmv + 2 pc + ~6 dots; gmres: 1 spmv + 1 pc + O(j) dots)
    if method == "bicgstab":
        comp = 2 * out["spmv_us"] + 2 * out["pc_us"] + 6 * out["dot_us"]
    else:
        comp = out["spmv_us"] + out["pc_us"] + 16 * out["dot_us"]
    out["implied_iter_us"] = round(comp, 2)
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--sweeps", type=int, default=None,
                    help="override ilu_sweeps for the ILU configs")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    from lssp_tpu.utils.profile import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp
    float(jnp.sum(jnp.ones(8)))             # tunnel warm-up

    from lssp_tpu import SolverOptions, PCOptions
    from lssp_tpu.sparse.io import read_matrix_market

    pco = PCOptions()
    if args.sweeps is not None:
        pco = PCOptions(ilu_sweeps=args.sweeps)

    configs = [
        ("bicgstab_iluk_coupled3d_mtx", "coupled3d_25.mtx.gz",
         "bicgstab", "iluk", pco),
        ("gmres30_ilut_convdiff_mtx", "convdiff_rot_128.mtx.gz",
         "gmres", "ilut", pco),
    ]
    records = []
    for name, mat, method, pc, popts in configs:
        A = read_matrix_market(os.path.join(MATDIR, mat))
        rec = profile_config(name, A, method, pc, popts,
                             SolverOptions())
        records.append(rec)
        print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
