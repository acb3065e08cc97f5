"""BiCRSTAB (reference lssp_solver_bicrstab,
/root/reference/src/solver-bicrstab.cxx:4-114): CR-analog of BiCGSTAB with
shadow r̃ = A·r0 (:44) and early ‖s‖ convergence exit."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("bicrstab")
def bicrstab(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    rtld = op(r)
    z0 = pc(r)
    p0 = z0
    rho0 = dot(rtld, z0)

    def cond(carry):
        it, x, r, z, p, map_, rho_old, res, done, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, x, r, z, p, map_prev, rho_old, res, done, hist = carry
        ap = op(p)
        map_ = pc(ap)
        tdot = dot(rtld, map_)
        alpha = rho_old / jnp.where(tdot == 0.0, 1.0, tdot)
        s = r - alpha * ap
        snorm = jnp.sqrt(dot(s, s))
        early = snorm <= tol
        # early exit path: x += alpha p only (:61-64)
        ms = z - alpha * map_
        ams = op(ms)
        omega = dot(ams, s) / jnp.where(dot(ams, ams) == 0.0, 1.0,
                                        dot(ams, ams))
        x_new = jnp.where(early, x + alpha * p, x + alpha * p + omega * ms)
        r_new = jnp.where(early, s, s - omega * ams)
        res = jnp.where(early, snorm, jnp.sqrt(dot(r_new, r_new)))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        conv = res <= tol
        z_new = pc(r_new)
        rho = dot(rtld, z_new)
        fail = rho == 0.0
        beta = (rho / jnp.where(rho_old == 0.0, 1.0, rho_old)) \
            * (alpha / jnp.where(omega == 0.0, 1.0, omega))
        p_new = jnp.where(conv | fail, p, z_new + beta * (p - omega * map_))
        return (it, x_new, r_new, z_new, p_new, map_, rho,
                res, fail, hist)

    init = (jnp.int32(0), x, r, z0, p0, jnp.zeros_like(r), rho0,
            r0norm, jnp.bool_(False), hist)
    it, x, r, z, p, map_, rho, res, done, hist = (
        jax.lax.while_loop(cond, body, init))
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
