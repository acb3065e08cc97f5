"""ORTHOMIN(k) (reference lssp_solver_orthomin,
/root/reference/src/solver-orthomin.cxx:12-180): truncated direction history
of k = restart vectors (:70-75) with ring indexing (:102,138); every
iteration recomputes the true residual (:140)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("orthomin")
def orthomin(A, b, x0=None, M=None, opts=None, dot=vdot):
    k = opts.restart
    op, pc, x, z0 = init_state(A, b, x0, M)
    dtype = b.dtype
    n = b.shape[0]
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(z0, z0))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    r0 = pc(z0)
    P = jnp.zeros((k, n), dtype=dtype).at[0].set(r0)
    Q = jnp.zeros((k, n), dtype=dtype)
    C = jnp.ones(k, dtype=dtype)

    def cond(carry):
        it, x, r, sd, P, Q, C, res, done, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, x, r, sd, P, Q, C, res, done, hist = carry
        s = op(sd)
        j = jnp.mod(it, k)
        qj = pc(s)
        a = dot(r, qj)
        cj = dot(qj, qj)
        brk = jnp.abs(cj) <= opts.breakdown
        C = C.at[j].set(jnp.where(brk, 1.0, cj))
        Q = Q.at[j].set(qj)
        a = a / jnp.where(brk, 1.0, cj)
        x = jnp.where(brk, x, x + a * P[j])
        r = jnp.where(brk, r, r - a * qj)
        sd = r
        snew = op(r)
        z = pc(snew)
        # project against the active directions (ring of size min(it+1, k))
        nact = jnp.minimum(it + 1, k)
        def proj(i, sd_):
            beta = dot(z, Q[i]) / C[i]
            return jnp.where(i < nact, sd_ - beta * P[i], sd_)
        sd = jax.lax.fori_loop(0, k, proj, sd)
        jn = jnp.mod(it + 1, k)
        P = P.at[jn].set(sd)
        rg = b - op(x)
        res = jnp.sqrt(dot(rg, rg))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        return (it, x, r, sd, P, Q, C, res, brk, hist)

    init = (jnp.int32(0), x, r0, r0, P, Q, C, r0norm, jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, res, hist = out[0], out[1], out[7], out[9]
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
