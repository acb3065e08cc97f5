"""Regenerate tests/golden/ratchet.json — OUR iteration counts for every
golden config, recorded as a regression ratchet (run_config asserts later
rounds stay within recorded + max(2, 5%)).

Run after an intentional convergence-affecting change:
    python tests/golden/record_ratchet.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import test_solvers as ts

    # regeneration must not enforce the STALE ratchet: an intentionally
    # regressed config would assert inside run_config, be swallowed as
    # "not parity-clean", and silently vanish from the new file — the
    # opposite of the ratchet's purpose
    ts.RATCHET = {}

    from lssp_tpu import PCOptions

    out = {}
    for golden, N in ((ts.GOLDEN32, 32), (ts.GOLDEN100, 100)):
        for (method, pc), rec in sorted(golden.items()):
            import numpy as np
            if rec["nits"] >= rec["maxit"]:
                continue   # stall class: asserted in-test, nothing to ratchet
            po = PCOptions(num_blocks=N * N // 4) if pc == "biluk" else None
            try:
                # nan_x-class configs (finite recursive residual, nan true
                # residual: reference x overflowed) go through run_config's
                # strictly-better path and still return nits — record them
                nits, _ = ts.run_config(method, pc, N=N, golden=golden,
                                        maxit=3000 if N == 100 else 2000,
                                        pc_options=po)
            except Exception as e:        # config not parity-clean: skip
                print(f"skip {method}+{pc}@{N}: {e}")
                continue
            out[f"{method}+{pc}@{N}"] = int(nits)
            print(f"{method}+{pc}@{N}: {nits}")

    # vendored general-matrix goldens (tests/golden/vendored.jsonl)
    import jax.numpy as jnp
    import numpy as np
    from lssp_tpu import solve, SolverOptions
    from lssp_tpu.sparse.io import read_matrix_market
    for (matrix, method, pc), rec in sorted(ts.GOLDEN_VENDORED.items()):
        A = read_matrix_market(os.path.join(ts.MATDIR, matrix + ".mtx.gz"))
        n = A.shape[0]
        opts = SolverOptions(restart=rec["restart"], maxit=rec["maxit"])
        x, info = solve(A, jnp.ones(n, dtype=jnp.float64), method=method,
                        pc=pc, options=opts)
        if not bool(info.converged):
            print(f"skip {method}+{pc}@{matrix}: did not converge")
            continue
        out[f"{method}+{pc}@{matrix}"] = int(info.nits)
        print(f"{method}+{pc}@{matrix}: {int(info.nits)}")

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "ratchet.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print(f"wrote {len(out)} entries to {path}")


if __name__ == "__main__":
    main()
