"""Inside-shard_map device ops: halo-exchange SpMV and psum reductions.

These run *per shard* under ``shard_map`` over a 1-D mesh axis.  The halo
exchange is two ``lax.ppermute`` shifts over ICI (left and right neighbour),
which XLA overlaps with the local gather; dots/norms are a local dot +
``lax.psum`` — the only cross-chip synchronisation points in a Krylov
iteration (SURVEY §3.3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lssp_tpu.parallel.partition import DistELL


def make_dist_spmv(M: DistELL, axis: str):
    """Return op(x_local) -> y_local for a row-partitioned matrix.

    ``x_local``: (R,) this shard's slice.  The returned closure must be
    called inside shard_map over ``axis``.
    """
    P = M.nshards
    h = M.halo

    if M.mode == "halo":
        def op(cols, data, x):
            if h > 0:
                right = [(i, (i + 1) % P) for i in range(P)]
                left = [(i, (i - 1) % P) for i in range(P)]
                # my last h values go right; neighbour's arrive as my left halo
                from_left = lax.ppermute(x[-h:], axis, right)
                from_right = lax.ppermute(x[:h], axis, left)
                # ring wrap-around delivers garbage at the ends; rows never
                # reference those slots (halo feasibility guaranteed at
                # partition time for interior reaches only)
                pidx = lax.axis_index(axis)
                from_left = jnp.where(pidx == 0, jnp.zeros_like(from_left),
                                      from_left)
                from_right = jnp.where(pidx == P - 1,
                                       jnp.zeros_like(from_right), from_right)
                x_ext = jnp.concatenate([from_left, x, from_right])
            else:
                x_ext = x
            return jnp.sum(data * x_ext[cols], axis=1)
    else:
        def op(cols, data, x):
            x_full = lax.all_gather(x, axis, tiled=True)
            return jnp.sum(data * x_full[cols], axis=1)

    return op


def make_dist_spmv_t(M: DistELL, axis: str):
    """Return op_t(x_local) -> (Aᵀx)_local — the reverse of the halo
    exchange: each shard accumulates its rows' contributions into the
    extended vector [halo_l | local | halo_r] with a segment sum, keeps the
    local part, and ships the halo accumulations to the owning neighbours
    (the mirror image of the forward ppermute shifts).  All-gather mode
    reduces the per-shard full-length accumulations with a psum_scatter.
    """
    import numpy as np

    P = M.nshards
    h = M.halo
    R = M.rows_per_shard

    if M.mode == "halo":
        def op_t(cols, data, x):
            prod = (data * x[:, None]).ravel()
            z_ext = jax.ops.segment_sum(prod, cols.ravel(),
                                        num_segments=R + 2 * h)
            y = z_ext[h:h + R]
            if h > 0:
                left = [(i, (i - 1) % P) for i in range(P)]
                right = [(i, (i + 1) % P) for i in range(P)]
                # my left-halo accumulation belongs to my LEFT neighbour's
                # last h rows; my right-halo to my RIGHT neighbour's first h
                from_right = lax.ppermute(z_ext[:h], axis, left)
                from_left = lax.ppermute(z_ext[-h:], axis, right)
                pidx = lax.axis_index(axis)
                from_right = jnp.where(pidx == P - 1,
                                       jnp.zeros_like(from_right), from_right)
                from_left = jnp.where(pidx == 0,
                                      jnp.zeros_like(from_left), from_left)
                y = y.at[-h:].add(from_right).at[:h].add(from_left)
            return y
    else:
        def op_t(cols, data, x):
            prod = (data * x[:, None]).ravel()
            z_full = jax.ops.segment_sum(prod, cols.ravel(),
                                         num_segments=M.n)
            return lax.psum_scatter(z_full, axis, scatter_dimension=0,
                                    tiled=True)

    return op_t


class OpWithTranspose:
    """A matrix-free operator carrying its transpose — recognised by
    lssp_tpu.solvers.base.operator_t, so transpose-based Krylov methods
    (BiCG/QMR/CGNR/LSQR) work on callables that provide one."""

    def __init__(self, op, op_t):
        self._op = op
        self.t_op = op_t

    def __call__(self, x):
        return self._op(x)


def make_psum_dot(axis: str):
    """Distributed ⟨x,y⟩: local dot + psum over the mesh axis.

    Local part is multiply+sum, not jnp.dot — the TPU fp64 vector
    dot_general path loses ~1e-6 relative accuracy (see
    lssp_tpu.solvers.base.vdot)."""
    def dot(x, y):
        return lax.psum(jnp.sum(x * y), axis)
    return dot
