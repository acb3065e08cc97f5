"""QMR — quasi-minimal residual (Freund–Nachtigal, no look-ahead).

Capability parity with the reference's LASPACK adapter, whose solver table
exposes QMR (/root/reference/src/solver-laspack.cxx:29-34); the reference has
no native QMR.  This is the classic coupled two-term recurrence with the
preconditioner split M1 = M (left), M2 = I, using ``spmv_t`` / the PC's
transpose apply for the shadow sequence.  All the textbook breakdown tests
(rho, xi, delta, eps, beta, gamma) exit the loop like the reference's
rho==0 guard (solver-bicgstab.cxx:89-92).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, operator_t, pc_transpose, stopping_tol,
    history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("qmr")
def qmr(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    opt = operator_t(A)
    pct = pc_transpose(M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    tiny = jnp.finfo(dtype).tiny

    vt = r
    y0 = pc(vt)
    rho0 = jnp.sqrt(dot(y0, y0))
    wt = r
    z0 = wt                                    # M2 = I ⇒ z = M2⁻ᵀ wt = wt
    xi0 = jnp.sqrt(dot(z0, z0))

    def cond(carry):
        (it, x, r, vt, wt, y, z, p, q, d, s, rho, xi, gamma, eta, theta,
         eps, res, brk, hist) = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(brk)

    def body(carry):
        (it, x, r, vt, wt, y, z, p, q, d, s, rho, xi, gamma, eta, theta,
         eps, res, brk, hist) = carry
        bd = opts.breakdown
        brk_now = (jnp.abs(rho) <= bd) | (jnp.abs(xi) <= bd)
        v = vt / jnp.where(rho == 0, 1.0, rho)
        yv = y / jnp.where(rho == 0, 1.0, rho)
        w = wt / jnp.where(xi == 0, 1.0, xi)
        zv = z / jnp.where(xi == 0, 1.0, xi)
        delta = dot(zv, yv)
        brk_now = brk_now | (jnp.abs(delta) <= bd)
        yt = yv                                # M2⁻¹ y = y
        zt = pct(zv)                           # M1⁻ᵀ z
        safe_eps = jnp.where(eps == 0, 1.0, eps)
        p = jnp.where(it == 0, yt, yt - (xi * delta / safe_eps) * p)
        q = jnp.where(it == 0, zt, zt - (rho * delta / safe_eps) * q)
        pt = op(p)
        eps_n = dot(q, pt)
        brk_now = brk_now | (jnp.abs(eps_n) <= bd)
        beta = eps_n / jnp.where(delta == 0, 1.0, delta)
        brk_now = brk_now | (jnp.abs(beta) <= bd)
        safe_beta = jnp.where(beta == 0, 1.0, beta)
        vt_n = pt - safe_beta * v
        y_n = pc(vt_n)
        rho_n = jnp.sqrt(dot(y_n, y_n))
        wt_n = opt(q) - safe_beta * w
        z_n = wt_n                             # M2 = I
        xi_n = jnp.sqrt(dot(z_n, z_n))
        theta_n = rho_n / jnp.maximum(gamma * jnp.abs(safe_beta), tiny)
        gamma_n = 1.0 / jnp.sqrt(1.0 + theta_n * theta_n)
        brk_now = brk_now | (jnp.abs(gamma_n) <= bd)
        eta_n = (-eta * rho * gamma_n * gamma_n /
                 (safe_beta * jnp.maximum(gamma * gamma, tiny)))
        tg2 = (theta * gamma_n) ** 2
        d_n = jnp.where(it == 0, eta_n * p, eta_n * p + tg2 * d)
        s_n = jnp.where(it == 0, eta_n * pt, eta_n * pt + tg2 * s)
        x_n = jnp.where(brk_now, x, x + d_n)
        r_n = jnp.where(brk_now, r, r - s_n)
        res_n = jnp.sqrt(dot(r_n, r_n))
        hist2 = history_update(opts, hist, it + 1, res_n, r0norm, bnorm)
        return (it + 1, x_n, r_n, vt_n, wt_n, y_n, z_n, p, q, d_n, s_n,
                rho_n, xi_n, gamma_n, eta_n, theta_n, eps_n, res_n,
                brk | brk_now, hist2)

    zvec = jnp.zeros_like(b)
    init = (jnp.int32(0), x, r, vt, wt, y0, z0, zvec, zvec, zvec, zvec,
            rho0, xi0, jnp.ones((), dtype), jnp.array(-1.0, dtype),
            jnp.zeros((), dtype), jnp.ones((), dtype), r0norm,
            jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, res = out[0], out[1], out[17]
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=out[19] if opts.record_history else None)
