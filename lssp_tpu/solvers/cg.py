"""Conjugate Gradient (reference lssp_solver_cg,
/root/reference/src/solver-cg.cxx:8-136).

Left-preconditioned Hestenes–Stiefel CG.  Per-iteration kernel census matches
the reference (SURVEY §3.3): 1 SpMV, 1 PC apply, 2 dots, 1 norm, 2 fused
axpys — the dots/norm are the only cross-chip sync points in the distributed
path.  Iteration structure mirrors the reference loop exactly (z = M⁻¹r →
ρ = ⟨z,r⟩ → β-update of p → q = Ap → α = ρ/⟨q,p⟩ → x,r update → ‖r‖ check)
so iteration counts are comparable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("cg")
def cg(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r = init_state(A, b, x0, M)
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    def cond(carry):
        it, x, r, p, rho_old, res, hist = carry
        return (it < opts.maxit) & (res > tol)

    def body(carry):
        it, x, r, p, rho_old, res, hist = carry
        z = pc(r)
        rho = dot(z, r)
        beta = jnp.where(it == 0, 0.0, rho / rho_old)
        p = z + beta * p
        q = op(p)
        alpha = rho / dot(q, p)
        x = x + alpha * p
        r = r - alpha * q
        res = jnp.sqrt(dot(r, r))
        hist = history_update(opts, hist, it + 1, res, r0norm, bnorm)
        return (it + 1, x, r, p, rho, res, hist)

    # the reference loop always runs ≥1 iteration when ‖r0‖ > tol; when the
    # initial guess already satisfies tol we skip entirely (matching the
    # tol-check shape used by solvers with an upfront guard).
    init = (jnp.int32(0), x, r, jnp.zeros_like(r), jnp.ones((), b.dtype),
            r0norm, hist)
    it, x, r, p, rho, res, hist = jax.lax.while_loop(cond, body, init)
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
