"""GPBiCG (reference lssp_solver_gpbicg,
/root/reference/src/solver-gpbicg.cxx:4-163): product-type with the same
ξ/η 5-dot machinery (:85-98) plus the mid-step residual-estimate check on
t = r − α·Ap (:70-79)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("gpbicg")
def gpbicg(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    rtld = r
    p0 = pc(r)
    mr0 = p0           # mr = M⁻¹r (the reference leaves mr uninitialized on
                       # iteration 1 — fresh-malloc zero in practice; we use
                       # the mathematically intended value)
    rho0 = dot(rtld, r)

    def cond(carry):
        (it, x, r, mr, p, t, w, z, u, mt_old, rho_old, beta,
         res, done, hist) = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        (it, x, r, mr, p, t, w, z, u, mt_old, rho_old, beta,
         res, done, hist) = carry
        ap = op(p)
        map_ = pc(ap)
        d0 = dot(rtld, ap)
        fail = d0 == 0.0
        alpha = rho_old / jnp.where(d0 == 0.0, 1.0, d0)
        y = t - r + alpha * (ap - w)
        t_new = r - alpha * ap
        tnorm = jnp.sqrt(dot(t_new, t_new))
        early = tnorm <= tol
        # early exit: x += alpha p, residual = t (:76-79)
        mt = mr - alpha * map_
        amt = op(mt)
        t0 = dot(y, y)
        t1 = dot(amt, t_new)
        t2 = dot(y, t_new)
        t3 = dot(amt, y)
        t4 = dot(amt, amt)
        tmp = t4 * t0 - t3 * t3
        tmp = jnp.where(tmp == 0.0, 1.0, tmp)
        qsi = jnp.where(it == 0, t1 / jnp.where(t4 == 0.0, 1.0, t4),
                        (t0 * t1 - t2 * t3) / tmp)
        eta = jnp.where(it == 0, 0.0, (t4 * t2 - t3 * t1) / tmp)
        # u = eta*(beta*u + mt_old - mr) + qsi*map  (:103-106)
        u_new = eta * (beta * u + mt_old - mr) + qsi * map_
        z_new = eta * z + qsi * mr - alpha * u_new
        x_full = x + alpha * p + z_new
        r_full = t_new - qsi * amt - eta * y
        x = jnp.where(fail, x, jnp.where(early, x + alpha * p, x_full))
        r = jnp.where(fail, r, jnp.where(early, t_new, r_full))
        res = jnp.where(early, tnorm, jnp.sqrt(dot(r, r)))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        conv = res <= tol
        mr_new = pc(r)
        rho = dot(rtld, r)
        fail2 = rho == 0.0
        beta_new = (rho / jnp.where(rho_old == 0.0, 1.0, rho_old)) \
            * (alpha / jnp.where(qsi == 0.0, 1.0, qsi))
        w_new = amt + beta_new * ap
        p_new = mr_new + beta_new * (p - u_new)
        stop = fail | fail2 | conv | early
        p = jnp.where(stop, p, p_new)
        w = jnp.where(stop, w, w_new)
        mr = jnp.where(stop, mr, mr_new)
        return (it, x, r, mr, p, t_new, w, z_new, u_new, mt,
                rho, beta_new, res, fail | fail2 | early, hist)

    init = (jnp.int32(0), x, r, mr0, p0, jnp.zeros_like(r),
            jnp.zeros_like(r), jnp.zeros_like(r), jnp.zeros_like(r),
            jnp.zeros_like(r), rho0, jnp.zeros((), dtype),
            r0norm, jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, res, hist = out[0], out[1], out[12], out[14]
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
