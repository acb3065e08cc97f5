"""TFQMR — Transpose-Free QMR (reference lssp_solver_tfqmr,
/root/reference/src/solver-tfqmr.cxx:4-149): the inner m=0,1 half-steps
(:84-113) with τ/θ/η recurrence and residual estimate τ·√(m+1) (:104)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("tfqmr")
def tfqmr(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    rtld = r
    p0 = r
    u0 = r
    v0 = op(pc(p0))
    rho0 = dot(r, rtld)

    def cond(carry):
        (it, x, r, u, p, d, v, tau, theta, eta, rho_old, w_old,
         res, done, hist) = carry
        return (it <= opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        (it, x, r, u, p, d, v, tau, theta, eta, rho_old, w_old,
         res, done, hist) = carry
        s = dot(v, rtld)
        fail = s == 0.0
        alpha = rho_old / jnp.where(s == 0.0, 1.0, s)
        q = u - alpha * v
        v_upd = op(pc(u + q))
        r = r - alpha * v_upd
        w = jnp.sqrt(dot(r, r))

        # two quasi-minimization half-steps (m = 0, 1; static unroll)
        def half(m, state):
            x, d, tau, theta, eta, res, stop = state
            ww = jnp.sqrt(w * w_old) if m == 0 else w
            yv = u if m == 0 else q
            coef = theta * theta * eta / jnp.where(alpha == 0.0, 1.0, alpha)
            d = yv + coef * d
            theta = ww / jnp.where(tau == 0.0, 1.0, tau)
            c = 1.0 / jnp.sqrt(1.0 + theta * theta)
            eta = c * c * alpha
            tau = tau * theta * c
            x = x + eta * pc(d)
            res_new = tau * jnp.sqrt(1.0 + m)
            stop_new = stop | (res_new <= tol)
            res = jnp.where(stop, res, res_new)
            return (x, d, tau, theta, eta, res, stop_new)

        st = half(0, (x, d, tau, theta, eta, res, jnp.bool_(False)))
        stop1 = st[6]
        st2 = half(1, st)
        x, d, tau, theta, eta, res, stop = jax.lax.cond(
            stop1, lambda: st, lambda: st2)

        rho = dot(r, rtld)
        fail2 = rho == 0.0
        beta = rho / jnp.where(rho_old == 0.0, 1.0, rho_old)
        u_new = r + beta * q
        p_new = u_new + beta * (q + beta * p)
        v_new = op(pc(p_new))
        go = jnp.logical_not(stop | fail | fail2)
        u = jnp.where(go, u_new, u)
        p = jnp.where(go, p_new, p)
        v = jnp.where(go, v_new, v)
        it = it + 1
        hist = history_update(opts, hist, it, res)
        return (it, x, r, u, p, d, v, tau, theta, eta, rho, w,
                res, fail | fail2 | stop, hist)

    init = (jnp.int32(1), x, r, u0, p0, jnp.zeros_like(r), v0,
            r0norm, jnp.zeros((), dtype), jnp.zeros((), dtype), rho0,
            r0norm, r0norm, jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, res, hist = out[0], out[1], out[12], out[14]
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
