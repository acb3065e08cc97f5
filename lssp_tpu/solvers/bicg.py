"""BiCG — biconjugate gradients (Lanczos two-sided).

Capability parity with the reference's external solver tables: BiCG appears
in its LASPACK adapter (/root/reference/src/solver-laspack.cxx:29-34) and
PETSc adapter (/root/reference/src/solver-petsc.cxx:23-32); the reference
ships no native implementation.  Standard preconditioned BiCG: one SpMV, one
Aᵀ·v, one M⁻¹ and one M⁻ᵀ apply per iteration (``spmv_t``/``pc_transpose``
provide the transpose paths without materializing Aᵀ).  Breakdown guards
follow the reference's BiCGSTAB conventions (rho == 0 exit,
solver-bicgstab.cxx:89-92).
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


@register_solver("bicg")
def bicg(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    opt = operator_t(A)
    pct = pc_transpose(M)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    rt = r                                       # shadow residual r̃0 = r0

    def cond(carry):
        it, x, r, rt, p, pt, rho_old, res, brk, hist = carry
        return (it < opts.maxit) & (res > tol) & jnp.logical_not(brk)

    def body(carry):
        it, x, r, rt, p, pt, rho_old, res, brk, hist = carry
        z = pc(r)
        zt = pct(rt)
        rho = dot(zt, r)
        brk_now = jnp.abs(rho) <= opts.breakdown
        beta = jnp.where(it == 0, 0.0,
                         rho / jnp.where(rho_old == 0, 1.0, rho_old))
        p = z + beta * p
        pt = zt + beta * pt
        q = op(p)
        qt = opt(pt)
        sigma = dot(pt, q)
        alpha = rho / jnp.where(sigma == 0, 1.0, sigma)
        brk_now = brk_now | (jnp.abs(sigma) <= opts.breakdown)
        x = jnp.where(brk_now, x, x + alpha * p)
        r = jnp.where(brk_now, r, r - alpha * q)
        rt = jnp.where(brk_now, rt, rt - alpha * qt)
        res = jnp.sqrt(dot(r, r))
        hist = history_update(opts, hist, it + 1, res, r0norm, bnorm)
        return (it + 1, x, r, rt, p, pt, rho, res, brk | brk_now, hist)

    z0 = jnp.zeros_like(b)
    init = (jnp.int32(0), x, r, rt, z0, z0, jnp.ones((), b.dtype),
            r0norm, jnp.bool_(False), hist)
    it, x, r, rt, p, pt, rho, res, brk, hist = (
        jax.lax.while_loop(cond, body, init))
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
