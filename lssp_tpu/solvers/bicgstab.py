"""BiCGSTAB (reference lssp_solver_bicgstab,
/root/reference/src/solver-bicgstab.cxx:10-175): preconditioner applied to
the direction vectors p and s; ρ==0 failure exit (:89-92) and the ‖s‖≤1e-40
early-update breakdown path (:117-128) reproduced."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("bicgstab")
def bicgstab(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    rh = r                                   # shadow residual r̂ = r0

    def cond(carry):
        it, x, r, p, v, rho0, alpha, omega, res, done, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, x, r, p, v, rho0, alpha, omega, res, done, hist = carry
        rho1 = dot(r, rh)
        fail = rho1 == 0.0
        beta = jnp.where(it == 0, 0.0,
                         (rho1 * alpha) / jnp.where(rho0 * omega == 0.0, 1.0,
                                                    rho0 * omega))
        p = jnp.where(it == 0, r, r + beta * (p - omega * v))
        ph = pc(p)
        v = op(ph)
        denom = dot(rh, v)
        alpha = rho1 / jnp.where(denom == 0.0, 1.0, denom)
        s = r - alpha * v
        snorm = jnp.sqrt(dot(s, s))
        s_small = snorm <= opts.breakdown
        # ‖s‖-breakdown: final half-update then exit (:117-128)
        x_bd = x + alpha * ph
        r_bd = b - op(x_bd)
        sh = pc(s)
        t = op(sh)
        omega_new = dot(t, s) / jnp.where(dot(t, t) == 0.0, 1.0, dot(t, t))
        x_new = x + alpha * ph + omega_new * sh
        r_new = s - omega_new * t
        x = jnp.where(fail, x, jnp.where(s_small, x_bd, x_new))
        r = jnp.where(fail, r, jnp.where(s_small, r_bd, r_new))
        omega = jnp.where(s_small | fail, omega, omega_new)
        res = jnp.sqrt(dot(r, r))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        return (it, x, r, p, v, rho1, alpha, omega, res, fail | s_small, hist)

    init = (jnp.int32(0), x, r, jnp.zeros_like(r), jnp.zeros_like(r),
            jnp.ones((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype),
            r0norm, jnp.bool_(False), hist)
    it, x, r, p, v, rho0, alpha, omega, res, done, hist = (
        jax.lax.while_loop(cond, body, init))
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
