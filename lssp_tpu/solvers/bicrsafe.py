"""BiCRSafe (reference lssp_solver_bicrsafe,
/root/reference/src/solver-bicrsafe.cxx:4-151): CR-analog of BiCGSafe with
the extra shadow ar̃ = A·r̃ (:52) and ρ = ⟨r̃, A·M⁻¹r⟩."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("bicrsafe")
def bicrsafe(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    rtld = r
    artld = op(rtld)
    mr0 = pc(r)
    amr0 = op(mr0)
    rho0 = dot(rtld, amr0)

    def cond(carry):
        (it, x, r, mr, amr, p, ap, y, my, u, z, rho_old, beta,
         res, done, hist) = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        (it, x, r, mr, amr, p, ap, y, my, u, z, rho_old, beta,
         res, done, hist) = carry
        map_ = pc(ap)
        d0 = dot(artld, map_)
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
        # u = eta*beta*u + qsi*map + eta*my  (:82-85)
        u = (eta * beta) * u + qsi * map_ + eta * my
        au = op(u)
        z = eta * z + qsi * mr - alpha * u
        y = eta * y + qsi * amr - alpha * au
        my = pc(y)
        x = x + alpha * p + z
        r = r - alpha * ap - y
        res = jnp.sqrt(dot(r, r))
        it = it + 1
        hist = history_update(opts, hist, it, res)
        conv = res <= tol
        mr_new = mr - alpha * map_ - my
        amr_new = op(mr_new)
        rho = dot(rtld, amr_new)
        fail = rho == 0.0
        beta_new = (rho / jnp.where(rho_old == 0.0, 1.0, rho_old)) \
            * (alpha / jnp.where(qsi == 0.0, 1.0, qsi))
        p_new = jnp.where(conv | fail, p, mr_new + beta_new * (p - u))
        ap_new = jnp.where(conv | fail, ap, amr_new + beta_new * (ap - au))
        mr = jnp.where(conv | fail, mr, mr_new)
        amr = jnp.where(conv | fail, amr, amr_new)
        return (it, x, r, mr, amr, p_new, ap_new, y, my, u, z, rho,
                beta_new, res, fail, hist)

    init = (jnp.int32(0), x, r, mr0, amr0, mr0, amr0, jnp.zeros_like(r),
            jnp.zeros_like(r), jnp.zeros_like(r), jnp.zeros_like(r),
            rho0, jnp.zeros((), dtype), r0norm, jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, res, hist = out[0], out[1], out[13], out[15]
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
