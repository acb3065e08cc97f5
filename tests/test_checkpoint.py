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


def test_corrupt_checkpoint_rejected(tmp_path):
    """crc/magic/version gates (round-1 advisor: bare pickle had no
    integrity or version check)."""
    import pytest
    from lssp_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                           _MAGIC)
    import jax.numpy as jnp
    p = tmp_path / "c.ckpt"
    save_checkpoint(str(p), x=jnp.ones(4))
    raw = p.read_bytes()

    (tmp_path / "bad_magic.ckpt").write_bytes(b"NOTACKPT" + raw[8:])
    with pytest.raises(ValueError, match="magic"):
        load_checkpoint(str(tmp_path / "bad_magic.ckpt"))

    (tmp_path / "trunc.ckpt").write_bytes(raw[:-3])
    with pytest.raises(ValueError, match="integrity"):
        load_checkpoint(str(tmp_path / "trunc.ckpt"))

    flipped = bytearray(raw)
    flipped[-1] ^= 0xFF
    (tmp_path / "flip.ckpt").write_bytes(bytes(flipped))
    with pytest.raises(ValueError, match="integrity"):
        load_checkpoint(str(tmp_path / "flip.ckpt"))

    bumped = bytearray(raw)
    bumped[len(_MAGIC)] = 99
    (tmp_path / "ver.ckpt").write_bytes(bytes(bumped))
    with pytest.raises(ValueError, match="version"):
        load_checkpoint(str(tmp_path / "ver.ckpt"))


def test_legacy_pre_v1_checkpoint_loads(tmp_path):
    """Bare-pickle round-1 checkpoints still resume (with a warning)."""
    import pickle
    import numpy as np
    from lssp_tpu.utils.checkpoint import load_checkpoint
    p = tmp_path / "legacy.ckpt"
    payload = {"x": np.ones(4), "M": None, "info": None,
               "extra": {"nits_done": 7}}
    with open(p, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    out = load_checkpoint(str(p))
    assert np.allclose(np.asarray(out["x"]), 1.0)
    assert out["nits_done"] == 7
