"""CR — Conjugate Residual (reference lssp_solver_cr,
/root/reference/src/solver-cr.cxx:4-115): preconditioned via q̃ = M⁻¹q."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("cr")
def cr(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    p0 = pc(r)
    q0 = op(p0)
    z0 = p0

    def cond(carry):
        it, x, r, z, p, q, res, done, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, x, r, z, p, q, res, done, hist = carry
        qtld = pc(q)
        rho = dot(qtld, q)
        fail = rho == 0.0
        alpha = dot(r, qtld) / jnp.where(rho == 0.0, 1.0, rho)
        x = jnp.where(fail, x, x + alpha * p)
        r = jnp.where(fail, r, r - alpha * q)
        res = jnp.sqrt(dot(r, r))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        conv = res <= tol
        z = z - alpha * qtld
        az = op(z)
        beta = -dot(az, qtld) / jnp.where(rho == 0.0, 1.0, rho)
        p = jnp.where(fail | conv, p, z + beta * p)
        q = jnp.where(fail | conv, q, az + beta * q)
        return (it, x, r, z, p, q, res, fail, hist)

    init = (jnp.int32(0), x, r, z0, p0, q0, r0norm, jnp.bool_(False), hist)
    it, x, r, z, p, q, res, done, hist = jax.lax.while_loop(cond, body, init)
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
