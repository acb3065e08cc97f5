"""LSQR — Paige–Saunders bidiagonalization least-squares / linear solver.

Capability parity with the reference's PETSc adapter, which exposes LSQR in
its solver table (/root/reference/src/solver-petsc.cxx:23-32); the reference
has no native implementation.  Golub–Kahan bidiagonalization with the QR
update recurrence (damp = 0): one SpMV + one Aᵀ·v per iteration.  For square
nonsingular A this solves Ax = b; for inconsistent systems it converges to
the least-squares solution (then ``residual`` plateaus at min‖b−Ax‖).

Like MINRES, convergence is monitored on ``phibar`` (= exact ‖b − Ax‖ in
exact arithmetic) and the true residual is recomputed at exit.  A given M is
used as a right preconditioner via its transpose apply.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, identity_pc, operator, operator_t, pc_transpose, stopping_tol,
    history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("lsqr")
def lsqr(A, b, x0=None, M=None, opts=None, dot=vdot):
    a_op, a_opt = operator(A), operator_t(A)
    if M is None:
        op, opt = a_op, a_opt
    else:
        pct = pc_transpose(M)
        op = lambda v: a_op(M(v))                  # A M⁻¹
        opt = lambda v: pct(a_opt(v))              # M⁻ᵀ Aᵀ
    dtype = b.dtype
    tiny = jnp.finfo(dtype).tiny
    r0 = b - (a_op(x0) if x0 is not None else 0.0 * b)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r0, r0))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    beta0 = r0norm
    u = r0 / jnp.maximum(beta0, tiny)
    v = opt(u)
    alfa0 = jnp.sqrt(dot(v, v))
    v = v / jnp.maximum(alfa0, tiny)

    def cond(carry):
        it, y, u, v, w, alfa, rhobar, phibar, hist = carry
        return (it < opts.maxit) & (jnp.abs(phibar) > tol) & (alfa > opts.breakdown)

    def body(carry):
        it, y, u, v, w, alfa, rhobar, phibar, hist = carry
        # bidiagonalization step
        u = op(v) - alfa * u
        beta = jnp.sqrt(dot(u, u))
        u = u / jnp.maximum(beta, tiny)
        v_n = opt(u) - beta * v
        alfa_n = jnp.sqrt(dot(v_n, v_n))
        v_n = v_n / jnp.maximum(alfa_n, tiny)
        # plane rotation
        rho = jnp.sqrt(rhobar * rhobar + beta * beta)
        rho = jnp.maximum(rho, tiny)
        c = rhobar / rho
        s = beta / rho
        theta = s * alfa_n
        rhobar_n = -c * alfa_n
        phi = c * phibar
        phibar_n = s * phibar
        y = y + (phi / rho) * w
        w = v_n - (theta / rho) * w
        res = jnp.abs(phibar_n)
        hist = history_update(opts, hist, it + 1, res, r0norm, bnorm)
        return (it + 1, y, u, v_n, w, alfa_n, rhobar_n, phibar_n, hist)

    # the iterate lives in the COLUMN space (length ncols): zeros_like(b)
    # only coincided for square systems and broke rectangular LSQR
    y0 = jnp.zeros_like(v)
    init = (jnp.int32(0), y0, u, v, v, alfa0, alfa0, beta0, hist)
    it, y, u, v, w, alfa, rhobar, phibar, hist = (
        jax.lax.while_loop(cond, body, init))
    if M is not None:
        x = M(y) if x0 is None else x0 + M(y)
    else:
        x = y if x0 is None else x0 + y
    rt = b - a_op(x)
    res = jnp.sqrt(dot(rt, rt))
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
