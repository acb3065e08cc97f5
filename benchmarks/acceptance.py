"""Acceptance-config benchmark harness (BASELINE.md / BASELINE.json).

Runs the five acceptance configurations and reports per-config iteration
count, true residual, setup/solve wall time, and SpMV-equivalent throughput.
Usage:
    python benchmarks/acceptance.py [--full] [--cpu] [--json]

Configs (BASELINE.json):
  1. CG, no PC, 2-D 5-point Poisson 128²
  2. CG + ILU(0), 3-D 7-point Poisson 64³  (triangular-solve path)
  3. GMRES(30) + ILUT, nonsymmetric convection–diffusion
  4. BiCGSTAB(l) + block-ILUK, elasticity BSR (block path)
  5. GMRES + AMG V-cycle, anisotropic Poisson (1M rows with --full)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full problem sizes (config 5 at 1M rows)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--json", action="store_true", help="JSON-lines output")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from lssp_tpu import solve, SolverOptions, PCOptions
    from lssp_tpu.sparse import (
        laplacian_2d, laplacian_3d, convection_diffusion_2d, elasticity_2d,
        anisotropic_poisson_2d,
    )

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # fp64 outer residuals for iterative refinement
        jax.config.update("jax_enable_x64", True)
    # TPU: fp32 inner iterations + fp64 refinement (no native fp64 on TPU);
    # CPU: plain fp64 at reference precision
    dtype = np.float64
    tol = None

    configs = [
        dict(name="cg_poisson2d_128", method="cg", pc="none",
             gen=lambda: laplacian_2d(128, dtype=dtype)),
        dict(name="cg_ilu0_poisson3d_64", method="cg", pc="ilu0",
             gen=lambda: laplacian_3d(64 if args.full else 32, dtype=dtype)),
        dict(name="gmres30_ilut_convdiff", method="gmres", pc="ilut",
             opts=SolverOptions(restart=30),
             gen=lambda: convection_diffusion_2d(128, dtype=dtype)),
        dict(name="bicgstabl_biluk_elasticity", method="bicgstabl",
             pc="biluk", pc_opts=PCOptions(block_size=2),
             gen=lambda: elasticity_2d(48, dtype=dtype)),
        # TPU uses the gather-free structured-SA multigrid (amg/sa.py);
        # classical AMG remains the CPU-parity path
        dict(name="gmres_amg_aniso",
             method="gmres", pc="saamg" if on_tpu else "amg",
             opts=SolverOptions(restart=30),
             gen=lambda: anisotropic_poisson_2d(
                 1024 if args.full else 256, dtype=dtype)),
    ]

    results = []
    for cfg in configs:
        t0 = time.perf_counter()
        A = cfg["gen"]()
        t_gen = time.perf_counter() - t0
        n = A.shape[0]
        b = jnp.ones(n, dtype=dtype)
        opts = cfg.get("opts") or SolverOptions()
        if tol is not None:
            import dataclasses
            opts = dataclasses.replace(opts, rtol=tol, atol=tol, rbtol=tol)

        if on_tpu:
            from lssp_tpu import solve_ir
            t_setup = 0.0
            t0 = time.perf_counter()
            x, info = solve_ir(A, b, method=cfg["method"], pc=cfg["pc"],
                               options=opts, pc_options=cfg.get("pc_opts"))
            t_first = time.perf_counter() - t0      # setup + compile + solve
            t0 = time.perf_counter()
            x, info = solve_ir(A, b, method=cfg["method"], pc=cfg["pc"],
                               options=opts, pc_options=cfg.get("pc_opts"))
            t_solve = time.perf_counter() - t0      # warm (incl. PC refactor)
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
        rec = dict(config=cfg["name"], n=n, nnz=A.nnz,
                   method=cfg["method"], pc=cfg["pc"],
                   nits=int(info.nits), residual=float(info.residual),
                   true_residual=true_res,
                   converged=bool(info.converged),
                   setup_s=round(t_setup, 3),
                   compile_s=round(t_first - t_solve, 3),
                   solve_s=round(t_solve, 4),
                   mnnz_per_s=round(A.nnz * max(int(info.nits), 1)
                                    / max(t_solve, 1e-9) / 1e6, 1))
        results.append(rec)
        if args.json:
            print(json.dumps(rec))
        else:
            print(f"{rec['config']:32s} n={n:8d} nits={rec['nits']:5d} "
                  f"res={true_res:9.2e} conv={rec['converged']} "
                  f"solve={rec['solve_s']:8.3f}s "
                  f"({rec['mnnz_per_s']:8.1f} Mnnz/s)")

    ok = all(r["converged"] for r in results)
    if not args.json:
        print("ALL CONVERGED" if ok else "SOME CONFIGS FAILED", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
