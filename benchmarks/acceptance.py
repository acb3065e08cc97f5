"""Acceptance-config benchmark harness (BASELINE.md / BASELINE.json).

Runs the five acceptance configurations to a **relative residual of 1e-8**
(the BASELINE north-star target) and reports per-config iteration count,
independently recomputed true residual, setup/solve wall time, and
SpMV-equivalent throughput.

Sizes: FULL problem sizes by default on TPU (they fit one chip); the CPU
default shrinks configs 2 and 5 so the suite stays test-sized.  ``--full``
forces full sizes anywhere, ``--small`` forces the reduced ones.

Config #3 uses the *vendored* general-pattern matrix
``benchmarks/matrices/convdiff_rot_128.mtx.gz`` through the MatrixMarket
reader (``lssp_tpu.sparse.io``) — a recirculating-wind variable-coefficient
convection–diffusion discretization this library does not generate itself
(offline stand-in for the SuiteSparse class named in BASELINE; this
environment has no network access for genuine downloads).  A second
vendored matrix, ``coupled3d_25.mtx.gz`` (RCM-resistant couplings), rides
as config #3b to pin the HYB band+remainder execution path.

Usage:
    python benchmarks/acceptance.py [--full|--small] [--cpu] [--json]
                                    [--out results.json]

Measurement protocol follows the reference example
(/root/reference/example/exam.cxx:109-116): wall-clock around the solve,
then an independent ||b - Ax|| recompute.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MATDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "matrices")

MAXIT = 5000        # iteration budget; the nits gate defaults to it


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="force full problem sizes (config 5 at 1M rows)")
    ap.add_argument("--small", action="store_true",
                    help="force reduced sizes (CI/CPU scale)")
    ap.add_argument("--xl", action="store_true",
                    help="add the chip-max stretch config (16.8M-row "
                         "anisotropic Poisson, CG+saamg)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--json", action="store_true", help="JSON-lines output")
    ap.add_argument("--out", default=None,
                    help="also append JSON-lines records to this file")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # persistent compilation cache: first-touch time-to-solution is part
    # of the protocol, so amortize XLA compiles across processes
    from lssp_tpu.utils.profile import enable_persistent_cache
    enable_persistent_cache()
    import jax.numpy as jnp

    from lssp_tpu import solve, SolverOptions, PCOptions
    from lssp_tpu.sparse import (
        laplacian_2d, laplacian_3d, convection_diffusion_2d, elasticity_2d,
        anisotropic_poisson_2d,
    )
    from lssp_tpu.sparse.io import read_matrix_market

    on_tpu = jax.default_backend() == "tpu"
    # full sizes fit one chip; default to them on TPU (VERDICT r1 item #3)
    full = args.full or (on_tpu and not args.small)
    dtype = np.float64

    def vendored(name, fallback):
        path = os.path.join(MATDIR, name)
        if os.path.exists(path):
            return read_matrix_market(path)
        print(f"warning: vendored matrix {name} missing — "
              "run benchmarks/gen_vendored.py; using generator fallback",
              file=sys.stderr)
        return fallback()

    configs = [
        dict(name="cg_poisson2d_128", method="cg", pc="none",
             gen=lambda: laplacian_2d(128, dtype=dtype)),
        dict(name="cg_ilu0_poisson3d_64", method="cg", pc="ilu0",
             gen=lambda: laplacian_3d(64 if full else 32, dtype=dtype)),
        dict(name="gmres30_ilut_convdiff_mtx", method="gmres", pc="ilut",
             opts=SolverOptions(restart=30),
             gen=lambda: vendored(
                 "convdiff_rot_128.mtx.gz",
                 lambda: convection_diffusion_2d(128, dtype=dtype))),
        dict(name="bicgstab_iluk_coupled3d_mtx", method="bicgstab",
             pc="iluk",
             gen=lambda: vendored(
                 "coupled3d_25.mtx.gz",
                 lambda: laplacian_3d(25, dtype=dtype))),
        dict(name="bicgstabl_biluk_elasticity", method="bicgstabl",
             pc="biluk", pc_opts=PCOptions(block_size=2),
             gen=lambda: elasticity_2d(48, dtype=dtype)),
        # TPU uses the gather-free structured-SA multigrid (amg/sa.py);
        # classical AMG remains the CPU-parity path
        dict(name="gmres_amg_aniso",
             method="gmres", pc="saamg" if on_tpu else "amg",
             opts=SolverOptions(restart=30),
             gen=lambda: anisotropic_poisson_2d(
                 1024 if full else 256, dtype=dtype)),
    ]
    if args.xl:
        # chip-max stretch: 16.8M rows ~ the largest fp32+fp64 pair one
        # v5e chip holds with the saamg hierarchy.  max_nits pins the
        # round-3 grid-robust convergence (direction-aware semicoarsening
        # measured 18/19/19 its at 512^2..2048^2; round 2 sat at 623 at
        # 16.8M) — the xl-config iteration ratchet.
        configs.append(dict(
            name="cg_saamg_aniso_16m", method="cg", pc="saamg",
            max_nits=250,
            gen=lambda: anisotropic_poisson_2d(4096 if full else 512,
                                               dtype=dtype)))

    # absorb the remote-attach tunnel's cold start (the first dispatch of a
    # fresh process can stall minutes when the worker is cold) so the first
    # config's compile_s is honest compile time, not connection latency
    float(jnp.sum(jnp.ones(8)))
    # measure the fixed dispatch+fetch round-trip cost of this backend: a
    # trivial warm jitted program.  Through the remote-attach tunnel this
    # is ~25 ms — it bounds the warm wall time of ANY solve from below and
    # is why solve_device_s (repeat-marginal, refine.py: ir_device_time)
    # is reported alongside solve_s for the small configs
    triv = jax.jit(lambda v: jnp.sum(v))
    float(triv(jnp.ones(1024)))
    floor = min(_timed(lambda: float(triv(jnp.ones(1024))))
                for _ in range(7))
    # measured host→device link rate: min-of-3 upload of a 32 MB buffer.
    # Through the remote-attach tunnel this is ~26 MB/s — recording it per
    # run lets the ledger normalize the tunnel out of any upload phase
    # (est_upload_s = setup_bytes[phase] / link rate); a local deployment
    # measures HBM-copy rates instead (VERDICT r4 #6)
    up_probe = np.ones(4 * 1024 * 1024, dtype=np.float64)   # 32 MB

    def _upload_once():
        # fetching a scalar forces completion (block_until_ready does not
        # block through the remote-attach tunnel — verify skill gotcha)
        return float(jnp.sum(jax.device_put(up_probe)))

    up_t = min(_timed(_upload_once) for _ in range(3))
    upload_mbps = round(up_probe.nbytes / max(up_t, 1e-9) / 1e6, 1)
    # every row of a results artifact must be measured at ONE code state
    # (VERDICT r4 #2: a stale row contradicted the round ledger)
    import subprocess
    try:
        git_sha = subprocess.run(
            ["git", "rev-parse", "--short=12", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ).stdout.strip()
        # PROGRESS.jsonl is the round driver's heartbeat file — always
        # modified while a round runs, never code; ignore it in the
        # cleanliness stamp
        _st = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ).stdout.splitlines()
        # self-measurement artifacts can't count as dirt: the run
        # REGENERATES results_r05.json (and the driver rewrites
        # PROGRESS.jsonl), so both are always modified mid-run
        def _ignorable(path):
            base = path.rsplit("/", 1)[-1]
            return (base == "PROGRESS.jsonl"
                    or (base.startswith("results_r")
                        and base.endswith(".json")))
        dirty = bool([ln for ln in _st
                      if ln.strip() and not _ignorable(ln.split()[-1])])
    except Exception:                                      # noqa: BLE001
        git_sha, dirty = "unknown", True
    print(json.dumps({"dispatch_floor_s": round(floor, 4),
                      "upload_probe_mbps": upload_mbps,
                      "git_sha": git_sha, "git_dirty": dirty,
                      "backend": jax.default_backend()}))

    # TRUNCATE: accumulating rows from different runs is exactly the
    # stale-row failure class the round-4 verdict flagged (one artifact,
    # one code state); tests/test_acceptance_artifact.py enforces it
    out_f = open(args.out, "w") if args.out else None
    results = []
    for cfg in configs:
        t0 = time.perf_counter()
        A = cfg["gen"]()
        t_gen = time.perf_counter() - t0
        n = A.shape[0]
        b = jnp.ones(n, dtype=dtype)
        import dataclasses
        opts = cfg.get("opts") or SolverOptions()
        # north-star target: relative residual 1e-8
        opts = dataclasses.replace(opts, rtol=1e-8, atol=0.0, rbtol=0.0,
                                   maxit=MAXIT)

        setup_split = None
        setup_bytes = None
        t_dev = None
        if on_tpu:
            from lssp_tpu import solve_ir, prepare_ir
            from lssp_tpu.utils import profile as prof
            # setup alone: reorder + convert + device upload + PC factor
            # (reference protocol separates PC assemble, pc.cxx:83-236)
            prof.reset_phases()
            t0 = time.perf_counter()
            prepare_ir(A, method=cfg["method"], pc=cfg["pc"],
                       pc_options=cfg.get("pc_opts"))
            t_setup = time.perf_counter() - t0
            setup_split = {k: round(v, 3)
                           for k, v in prof.phase_times().items()}
            setup_bytes = {k: int(v)
                           for k, v in prof.phase_bytes().items()}
            t0 = time.perf_counter()
            x, info = solve_ir(A, b, method=cfg["method"], pc=cfg["pc"],
                               options=opts, pc_options=cfg.get("pc_opts"))
            t_first = time.perf_counter() - t0      # compile + solve
            t0 = time.perf_counter()
            x, info = solve_ir(A, b, method=cfg["method"], pc=cfg["pc"],
                               options=opts, pc_options=cfg.get("pc_opts"))
            t_solve = time.perf_counter() - t0      # warm (everything cached)
            # on-device time-to-solution via the repeat-marginal: the warm
            # wall time above includes ~4 fixed tunnel round trips (~25 ms
            # each, measured below as dispatch_floor_s) that a production
            # deployment does not pay — see refine.py: ir_device_time
            from lssp_tpu.solvers.refine import ir_device_time
            t_dev, _, _ = ir_device_time(
                A, b, method=cfg["method"], pc=cfg["pc"], options=opts,
                pc_options=cfg.get("pc_opts"),
                repeats=(1, 4) if n < 4_000_000 else (1, 2))
        else:
            from lssp_tpu import Solver
            s = Solver(method=cfg["method"], pc=cfg["pc"], options=opts,
                       pc_options=cfg.get("pc_opts"))
            t0 = time.perf_counter()
            s.assemble(A, b)                        # conversion + PC factor
            t_setup = time.perf_counter() - t0

            t0 = time.perf_counter()
            x = s.solve()
            float(s.info.residual)
            t_first = time.perf_counter() - t0      # compile + solve

            t0 = time.perf_counter()
            x = s.solve(x0=jnp.zeros(n, dtype=dtype))
            float(s.info.residual)                  # force completion
            t_solve = time.perf_counter() - t0      # warm solve
            info = s.info

        true_res = float(np.linalg.norm(
            np.ones(n) - A.to_scipy() @ np.asarray(x, np.float64)))
        rel_res = true_res / np.sqrt(float(n))       # ||b|| = sqrt(n)
        rec = dict(config=cfg["name"], n=n, nnz=A.nnz,
                   method=cfg["method"], pc=cfg["pc"],
                   **({"max_nits": cfg["max_nits"]} if "max_nits" in cfg
                      else {}),
                   backend=jax.default_backend(),
                   device=getattr(jax.devices()[0], "device_kind", "?"),
                   full=bool(full),
                   nits=int(info.nits), residual=float(info.residual),
                   true_residual=true_res,
                   rel_residual=float(f"{rel_res:.3e}"),
                   converged=bool(info.converged),
                   setup_s=round(t_setup, 3),
                   git_sha=git_sha, git_dirty=dirty,
                   **({"setup_split": setup_split} if setup_split else {}),
                   **({"setup_bytes": setup_bytes,
                       "upload_probe_mbps": upload_mbps}
                      if setup_bytes else {}),
                   compile_s=round(t_first - t_solve, 3),
                   solve_s=round(t_solve, 4),
                   mnnz_per_s=round(A.nnz * max(int(info.nits), 1)
                                    / max(t_solve, 1e-9) / 1e6, 1),
                   **({"solve_device_s": round(t_dev, 5),
                       "device_mnnz_per_s": round(
                           A.nnz * max(int(info.nits), 1)
                           / max(t_dev, 1e-9) / 1e6, 1),
                       "dispatch_floor_s": round(floor, 4)}
                      if t_dev is not None else {}))
        results.append(rec)
        if out_f:
            out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
        if args.json:
            print(json.dumps(rec))
        else:
            print(f"{rec['config']:32s} n={n:8d} nits={rec['nits']:5d} "
                  f"rel={rel_res:9.2e} conv={rec['converged']} "
                  f"solve={rec['solve_s']:8.3f}s "
                  f"({rec['mnnz_per_s']:8.1f} Mnnz/s)")

    if out_f:
        out_f.close()
    ok = all(r["converged"] and r["rel_residual"] <= 1.1e-8
             and r["nits"] <= r.get("max_nits", MAXIT) for r in results)
    if not args.json:
        print("ALL CONVERGED to rel 1e-8" if ok else "SOME CONFIGS FAILED",
              file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
