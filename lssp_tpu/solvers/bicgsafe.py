"""BiCGSafe (reference lssp_solver_bicgsafe,
/root/reference/src/solver-bicgsafe.cxx:4-155): product-type method with the
5-dot (ξ,η) minimization block (:64-77)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("bicgsafe")
def bicgsafe(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    rtld = r
    mr0 = pc(r)
    amr0 = op(mr0)
    rho0 = dot(rtld, r)
    z = jnp.zeros_like(r)

    def cond(carry):
        (it, x, r, mr, amr, p, ap, y, u, z, rho_old, beta,
         res, done, hist) = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        (it, x, r, mr, amr, p, ap, y, u, z, rho_old, beta,
         res, done, hist) = carry
        d0 = dot(rtld, ap)
        alpha = rho_old / jnp.where(d0 == 0.0, 1.0, d0)
        t0 = dot(y, y)
        t1 = dot(amr, r)
        t2 = dot(y, r)
        t3 = dot(amr, y)
        t4 = dot(amr, amr)
        tmp = t4 * t0 - t3 * t3
        tmp = jnp.where(tmp == 0.0, 1.0, tmp)
        qsi = jnp.where(it == 0, t1 / jnp.where(t4 == 0.0, 1.0, t4),
                        (t0 * t1 - t2 * t3) / tmp)
        eta = jnp.where(it == 0, 0.0, (t4 * t2 - t3 * t1) / tmp)
        t = eta * y + qsi * ap
        mt = pc(t)
        u = mt + (eta * beta) * u
        au = op(u)
        z = qsi * mr + eta * z - alpha * u
        y = qsi * amr + eta * y - alpha * au
        x = x + alpha * p + z
        r = r - alpha * ap - y
        res = jnp.sqrt(dot(r, r))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        conv = res <= tol
        rho = dot(rtld, r)
        fail = rho == 0.0
        beta_new = (rho / jnp.where(rho_old == 0.0, 1.0, rho_old)) \
            * (alpha / jnp.where(qsi == 0.0, 1.0, qsi))
        mr_new = pc(r)
        amr_new = op(mr_new)
        p_new = jnp.where(conv | fail, p, mr_new + beta_new * (p - u))
        ap_new = jnp.where(conv | fail, ap, amr_new + beta_new * (ap - au))
        mr = jnp.where(conv | fail, mr, mr_new)
        amr = jnp.where(conv | fail, amr, amr_new)
        return (it, x, r, mr, amr, p_new, ap_new, y, u, z, rho,
                beta_new, res, fail, hist)

    init = (jnp.int32(0), x, r, mr0, amr0, mr0, amr0, jnp.zeros_like(r),
            jnp.zeros_like(r), z, rho0, jnp.zeros((), dtype),
            r0norm, jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, r = out[0], out[1], out[2]
    res, hist = out[12], out[14]
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
