"""CGS — Conjugate Gradient Squared (reference lssp_solver_cgs,
/root/reference/src/solver-cgs.cxx:4-133).  Shadow r̃ = r0; ρ==0 and
⟨r̃,v̂⟩==0 breakdown exits."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("cgs")
def cgs(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    rtld = r

    def cond(carry):
        it, x, r, p, q, rho_old, res, done, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, x, r, p, q, rho_old, res, done, hist = carry
        rho = dot(rtld, r)
        fail = rho == 0.0
        beta = rho / jnp.where(rho_old == 0.0, 1.0, rho_old)
        u = r + beta * q
        p = u + beta * (q + beta * p)
        phat = pc(p)
        vhat = op(phat)
        tdot = dot(rtld, vhat)
        fail = fail | (tdot == 0.0)
        alpha = rho / jnp.where(tdot == 0.0, 1.0, tdot)
        q = u - alpha * vhat
        uhat = pc(u + q)
        x_new = x + alpha * uhat
        r_new = r - alpha * op(uhat)
        x = jnp.where(fail, x, x_new)
        r = jnp.where(fail, r, r_new)
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
