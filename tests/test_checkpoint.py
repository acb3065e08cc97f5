"""Checkpoint/resume tests (new subsystem — SURVEY §5: the reference has
none; warm restart + cached factorizations made durable)."""
import os

import jax.numpy as jnp
import numpy as np

from lssp_tpu import solve, SolverOptions, PCOptions
from lssp_tpu import pc as pc_mod
from lssp_tpu.sparse.generators import laplacian_2d
from lssp_tpu.utils.checkpoint import (
    save_checkpoint, load_checkpoint, checkpointed_solve)


def test_roundtrip_solution_and_pc(tmp_path):
    A = laplacian_2d(16)
    b = jnp.ones(A.shape[0], dtype=jnp.float64)
    M = pc_mod.setup(A, "iluk", PCOptions(iluk_level=1))
    x, info = solve(A, b, method="cg", M=M)
    p = str(tmp_path / "ck.pkl")
    save_checkpoint(p, x=x, M=M, info=info, note="hello")
    ck = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(ck["x"]), np.asarray(x))
    assert ck["note"] == "hello"
    assert int(ck["info"].nits) == int(info.nits)
    # the restored PC must apply identically (factors survived)
    r = jnp.asarray(np.linspace(1.0, 2.0, A.shape[0]))
    np.testing.assert_array_equal(np.asarray(ck["M"](r)), np.asarray(M(r)))


def test_checkpointed_solve_resumes(tmp_path):
    A = laplacian_2d(24)
    b = jnp.ones(A.shape[0], dtype=jnp.float64)
    p = str(tmp_path / "run.pkl")
    # run in 10-iteration rounds until converged
    x, info = checkpointed_solve(A, b, p, every=10, method="cg", pc="iluk")
    assert bool(info.converged)
    res = float(np.linalg.norm(np.asarray(b) - A.to_scipy() @ np.asarray(x)))
    assert res < 1e-5
    assert os.path.exists(p)
    # resuming a converged run does nothing more
    x2, info2 = checkpointed_solve(A, b, p, every=10, method="cg", pc="iluk")
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=1e-12)


def test_checkpointed_solve_interrupted(tmp_path):
    """Simulate an interruption: run a few rounds with a tiny budget, then
    resume — total work matches an uninterrupted solve."""
    A = laplacian_2d(24)
    b = jnp.ones(A.shape[0], dtype=jnp.float64)
    p = str(tmp_path / "int.pkl")
    # "crash" after 2 rounds of 5 iterations
    x1, info1 = checkpointed_solve(A, b, p, every=5, method="cg", pc="iluk",
                                   max_rounds=2)
    assert not bool(info1.converged)
    # resume to convergence
    x2, info2 = checkpointed_solve(A, b, p, every=5, method="cg", pc="iluk")
    assert bool(info2.converged)
    res = float(np.linalg.norm(np.asarray(b) - A.to_scipy() @ np.asarray(x2)))
    assert res < 1e-5
