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


def make_psum_dot(axis: str):
    """Distributed ⟨x,y⟩: local dot + psum over the mesh axis.

    Local part is multiply+sum, not jnp.dot — the TPU fp64 vector
    dot_general path loses ~1e-6 relative accuracy (see
    lssp_tpu.solvers.base.vdot)."""
    def dot(x, y):
        return lax.psum(jnp.sum(x * y), axis)
    return dot
