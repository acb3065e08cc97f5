"""QMRCGSTAB (reference lssp_solver_qmrcgstab,
/root/reference/src/solver-qmrcgstab.cxx:9-186): iterates on the fully
preconditioned system (initial r = M⁻¹(b−Ax), :84), two quasi-minimization
sweeps per iteration (:111-121, :135-145), convergence on the preconditioned
relative residual with a true-residual recompute at exit (:153-157)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("qmrcgstab")
def qmrcgstab(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, t0 = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(t0, t0))
    tol_abs_ = stopping_tol(r0norm, bnorm, opts)
    # relative threshold on the *preconditioned* residual (:80 tol/=residual)
    rtol = tol_abs_ / jnp.maximum(r0norm, jnp.finfo(dtype).tiny)
    hist = history_init(opts, r0norm)

    rk0 = pc(t0)
    br0 = rk0
    ires = jnp.sqrt(dot(rk0, rk0))

    def cond(carry):
        (it, x, rk, pk, vk, dk, rho, alpha, omega, theta, eta, tau,
         rerror, res, done, hist) = carry
        return (it < opts.maxit) & (rerror > rtol) & jnp.logical_not(done)

    def body(carry):
        (it, x, rk, pk, vk, dk, prho, alpha, omega, theta, eta, tau,
         rerror, res, done, hist) = carry
        rho = dot(br0, rk)
        denom = prho * omega
        beta = rho * alpha / jnp.where(denom == 0.0, 1.0, denom)
        pk = rk + beta * (pk - omega * vk)
        vk = pc(op(pk))
        d = dot(br0, vk)
        alpha = rho / jnp.where(d == 0.0, 1.0, d)
        sk = rk - alpha * vk
        # first quasi-minimization
        btheta = jnp.sqrt(dot(sk, sk)) / jnp.where(tau == 0.0, 1.0, tau)
        c = 1.0 / jnp.sqrt(1.0 + btheta * btheta)
        btau = tau * btheta * c
        b_eta = c * c * alpha
        coef = theta * theta * eta / jnp.where(alpha == 0.0, 1.0, alpha)
        bdk = pk + coef * dk
        bxk = x + b_eta * bdk
        tk = pc(op(sk))
        omega = dot(sk, tk) / jnp.where(dot(tk, tk) == 0.0, 1.0, dot(tk, tk))
        rk = sk - omega * tk
        # second quasi-minimization
        theta = jnp.sqrt(dot(rk, rk)) / jnp.where(btau == 0.0, 1.0, btau)
        c = 1.0 / jnp.sqrt(1.0 + theta * theta)
        tau = btau * theta * c
        eta = c * c * omega
        coef2 = btheta * btheta * b_eta / jnp.where(omega == 0.0, 1.0, omega)
        dk = sk + coef2 * bdk
        x = bxk + eta * dk
        rerror = jnp.sqrt(dot(rk, rk)) / jnp.maximum(ires,
                                                     jnp.finfo(dtype).tiny)
        it = it + 1
        hist = history_update(opts, hist, it, rerror * ires)
        return (it, x, rk, pk, vk, dk, rho, alpha, omega, theta, eta, tau,
                rerror, res, done, hist)

    init = (jnp.int32(0), x, rk0, jnp.zeros_like(b), jnp.zeros_like(b),
            jnp.zeros_like(b), jnp.ones((), dtype), jnp.ones((), dtype),
            jnp.ones((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype),
            ires, jnp.array(jnp.inf, dtype), r0norm, jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, x, rerror, hist = out[0], out[1], out[12], out[15]
    # true residual at exit (:153-157)
    res = jnp.sqrt(dot(b - op(x), b - op(x)))
    return x, SolveInfo(nits=it, residual=res, converged=rerror <= rtol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
