"""CGNR / CGN — conjugate gradients on the normal equations AᵀA x = Aᵀb.

Capability parity with the reference's LASPACK adapter, which exposes CGN in
its solver table (/root/reference/src/solver-laspack.cxx:29-34); the
reference ships no native implementation.  One SpMV + one Aᵀ·v per
iteration; always applicable (A need only be nonsingular), converging in the
AᵀA-norm.  Convergence is tested on the true residual ‖b − Ax‖ with the
framework's standard stopping rule.  Preconditioning: a given M is used as a
*right* preconditioner (solve A M⁻¹ y = b via CGNR on (AM⁻¹)ᵀ(AM⁻¹), then
x = M⁻¹ y) using the PC's transpose apply.
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


@register_solver("cgnr", "cgn")
def cgnr(A, b, x0=None, M=None, opts=None, dot=vdot):
    a_op, a_opt = operator(A), operator_t(A)
    if M is None:
        op, opt = a_op, a_opt
        pc = identity_pc
    else:
        pct = pc_transpose(M)
        op = lambda v: a_op(M(v))                  # A M⁻¹
        opt = lambda v: pct(a_opt(v))              # M⁻ᵀ Aᵀ
        pc = M
    # iterate on y with x = M⁻¹y; x0 given ⇒ y0 would need M·x0, so the
    # preconditioned variant starts from y0 = 0 unless x0 is None.
    y = jnp.zeros_like(b)
    r = b - (a_op(x0) if x0 is not None else 0.0 * b)
    if x0 is not None and M is None:
        y = x0
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r, r))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    z0 = opt(r)

    def cond(carry):
        it, y, r, z, p, znorm2, res, hist = carry
        return (it < opts.maxit) & (res > tol) & (znorm2 > opts.breakdown)

    def body(carry):
        it, y, r, z, p, znorm2, res, hist = carry
        w = op(p)
        wnorm2 = dot(w, w)
        alpha = znorm2 / jnp.where(wnorm2 == 0, 1.0, wnorm2)
        y = y + alpha * p
        r = r - alpha * w
        z = opt(r)
        znorm2_n = dot(z, z)
        beta = znorm2_n / jnp.where(znorm2 == 0, 1.0, znorm2)
        p = z + beta * p
        res = jnp.sqrt(dot(r, r))
        hist = history_update(opts, hist, it + 1, res, r0norm, bnorm)
        return (it + 1, y, r, z, p, znorm2_n, res, hist)

    init = (jnp.int32(0), y, r, z0, z0, dot(z0, z0), r0norm, hist)
    it, y, r, z, p, znorm2, res, hist = jax.lax.while_loop(cond, body, init)
    if M is not None:
        # warm start: x = x0 + M⁻¹y, since y solves A M⁻¹ y = b − A x0
        x = pc(y) if x0 is None else x0 + pc(y)
    else:
        x = y
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
