"""CRS — Conjugate Residual Squared (reference lssp_solver_crs,
/root/reference/src/solver-crs.cxx:4-109): shadow r̃ = A·r0 (:45)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("crs")
def crs(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    rtld = op(r)                           # shadow = A·r0

    def cond(carry):
        it, x, r, p, q, rho_old, res, done, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, x, r, p, q, rho_old, res, done, hist = carry
        z = pc(r)
        rho = dot(rtld, z)
        fail = rho == 0.0
        beta = rho / jnp.where(rho_old == 0.0, 1.0, rho_old)
        u = z + beta * q
        p = u + beta * (q + beta * p)
        ap = op(p)
        map_ = pc(ap)
        tdot = dot(rtld, map_)
        fail = fail | (tdot == 0.0)
        alpha = rho / jnp.where(tdot == 0.0, 1.0, tdot)
        q = u - alpha * map_
        uq = u + q
        auq = op(uq)
        x = jnp.where(fail, x, x + alpha * uq)
        r = jnp.where(fail, r, r - alpha * auq)
        res = jnp.sqrt(dot(r, r))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        return (it, x, r, p, q, rho, res, fail, hist)

    init = (jnp.int32(0), x, r, jnp.zeros_like(r), jnp.zeros_like(r),
            jnp.ones((), dtype), r0norm, jnp.bool_(False), hist)
    it, x, r, p, q, rho, res, done, hist = jax.lax.while_loop(cond, body, init)
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
