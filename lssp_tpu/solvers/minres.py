"""MINRES — minimal residual for symmetric (possibly indefinite) systems.

Capability parity with the reference's PETSc adapter, which exposes MINRES
in its solver table (/root/reference/src/solver-petsc.cxx:23-32); the
reference has no native implementation, so this is a from-scratch
Paige–Saunders MINRES: preconditioned Lanczos three-term recurrence + Givens
QR of the tridiagonal, one SpMV and one PC apply per iteration, no long
recurrences to store — the same single-`lax.while_loop` device-program shape
as the rest of the suite.  Requires symmetric A and SPD M.

The Lanczos loop monitors ``phibar`` — the exact residual norm in the
M-inner product (the 2-norm when M is identity).  Because that can differ
from the 2-norm by a bounded factor under preconditioning, an outer restart
loop recomputes the true residual ‖b − Ax‖ and, if it still exceeds the
framework's stopping rule, warm-restarts the Lanczos process from the
current x with a 10× tighter inner tolerance (same convention as the
reference's true-residual recompute at GMRES restarts,
solver-gmres.cxx:206-215).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("minres")
def minres(A, b, x0=None, M=None, opts=None, dot=vdot):
    op, pc, x, r0 = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r0, r0))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)
    tiny = jnp.finfo(dtype).tiny

    def lanczos(x, it0, inner_tol, hist):
        """Run the Lanczos/Givens recurrence from the current x until the
        M-norm residual estimate drops below ``inner_tol``."""
        r1 = b - op(x)
        y = pc(r1)
        beta1 = jnp.sqrt(jnp.maximum(dot(r1, y), 0.0))

        def cond(carry):
            (it, x, y, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar,
             cs, sn, first, hist) = carry
            return ((it < opts.maxit) & (jnp.abs(phibar) > inner_tol)
                    & (beta > opts.breakdown))

        def body(carry):
            (it, x, y, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar,
             cs, sn, first, hist) = carry
            s = 1.0 / jnp.maximum(beta, tiny)
            v = s * y
            yn = op(v)
            # subtract the previous Lanczos direction (skipped on step 1)
            yn = yn - jnp.where(first, 0.0,
                                beta / jnp.maximum(oldb, tiny)) * r1
            alfa = dot(v, yn)
            yn = yn - (alfa / jnp.maximum(beta, tiny)) * r2
            r1n, r2n = r2, yn
            yn = pc(yn)
            oldb_n = beta
            beta_n = jnp.sqrt(jnp.maximum(dot(r2n, yn), 0.0))

            # plane rotation of the tridiagonal column
            oldeps = epsln
            delta = cs * dbar + sn * alfa
            gbar = sn * dbar - cs * alfa
            epsln_n = sn * beta_n
            dbar_n = -cs * beta_n
            gamma = jnp.maximum(jnp.sqrt(gbar * gbar + beta_n * beta_n), tiny)
            cs_n = gbar / gamma
            sn_n = beta_n / gamma
            phi = cs_n * phibar
            phibar_n = sn_n * phibar

            w1 = w2
            w2n = w
            wn = (v - oldeps * w1 - delta * w2n) / gamma
            xn = x + phi * wn

            hist2 = history_update(opts, hist, it + 1, jnp.abs(phibar_n),
                                   r0norm, bnorm)
            return (it + 1, xn, yn, r1n, r2n, wn, w2n, oldb_n, beta_n,
                    dbar_n, epsln_n, phibar_n, cs_n, sn_n,
                    jnp.bool_(False), hist2)

        z = jnp.zeros_like(b)
        init = (it0, x, y, r1, r1, z, z,
                jnp.zeros((), dtype), beta1, jnp.zeros((), dtype),
                jnp.zeros((), dtype), beta1,
                jnp.array(-1.0, dtype), jnp.zeros((), dtype),
                jnp.bool_(True), hist)
        out = jax.lax.while_loop(cond, body, init)
        return out[0], out[1], out[15], beta1

    def outer_cond(carry):
        it, x, res, inner_tol, hist, stalled = carry
        return (it < opts.maxit) & (res > tol) & ~stalled

    def outer_body(carry):
        it, x, res, inner_tol, hist, stalled = carry
        it_n, x, hist, beta1 = lanczos(x, it, inner_tol, hist)
        rt = b - op(x)
        res = jnp.sqrt(dot(rt, rt))
        # A zero-progress pass with TRUE Lanczos breakdown (the entry
        # M-norm beta1 vanished) can never make progress — exit instead of
        # spinning forever.  A zero-progress pass whose beta1 merely sits
        # below inner_tol (badly scaled systems) is recoverable: the
        # restart loop tightens inner_tol and retries.
        return (it_n, x, res, inner_tol * 0.1, hist,
                (it_n == it) & (beta1 <= opts.breakdown))

    init = (jnp.int32(0), x, r0norm, tol, hist, jnp.bool_(False))
    it, x, res, inner_tol, hist, _ = jax.lax.while_loop(
        outer_cond, outer_body, init)
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
