"""FGMRES(m) — flexible GMRES (Saad 1993).

Capability parity with the reference's PETSc adapter, which exposes FGMRES
in its solver table (/root/reference/src/solver-petsc.cxx:23-32); the
reference has no native implementation.  Right-preconditioned Arnoldi that
additionally stores Z[i] = M⁻¹(v_i) so the preconditioner may *change every
iteration* — this is the correct outer solver for nonlinear/iterative
preconditioners (e.g. the Neumann-sweep ILU apply or an AMG V-cycle whose
effective operator is not a fixed matrix).  Update x += Z·ym.

Structure mirrors the framework's GMRES (same MGS + Givens machinery, same
single-device-program shape); costs one extra (m, n) basis of storage.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, basis_combine,
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver
from lssp_tpu.solvers.gmres import _solve_ym


def _fgmres_cycle(op, pc, v0, beta_p, m, maxit, itr0, tol, dot, breakdown):
    """One flexible-Arnoldi restart cycle; returns (Z, H, gg, kk, itr, gs)."""
    n = v0.shape[0]
    dtype = v0.dtype
    V = jnp.zeros((m, n), dtype=dtype).at[0].set(v0)
    Z = jnp.zeros((m, n), dtype=dtype)
    H = jnp.zeros((m + 1, m), dtype=dtype)
    gg = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta_p)
    c = jnp.zeros(m, dtype=dtype)
    s = jnp.zeros(m, dtype=dtype)

    def cond(carry):
        i, itr, V, Z, H, gg, c, s, kk, gs_norm, brk, stop = carry
        return ((i < m) & (itr < maxit) & jnp.logical_not(brk)
                & jnp.logical_not(stop))

    def body(carry):
        i, itr, V, Z, H, gg, c, s, kk, gs_norm, brk, stop = carry
        itr = itr + 1
        zi = pc(V[i])
        Z = Z.at[i].set(zi)
        w = op(zi)

        def mgs(j, wh):
            w, hcol = wh
            hij = dot(w, V[j])
            return (w - hij * V[j], hcol.at[j].set(hij))
        w, hcol = jax.lax.fori_loop(0, i + 1, mgs,
                                    (w, jnp.zeros(m + 1, dtype=dtype)))
        hnorm = jnp.sqrt(dot(w, w))
        hcol = hcol.at[i + 1].set(hnorm)
        brk_now = jnp.abs(hnorm) <= breakdown
        vnext = w / jnp.where(brk_now, 1.0, hnorm)
        V = jnp.where(brk_now | (i + 1 >= m), V, V.at[(i + 1) % m].set(vnext))

        def rot(j, hc):
            h1 = c[j] * hc[j] + s[j] * hc[j + 1]
            h2 = -s[j] * hc[j] + c[j] * hc[j + 1]
            return hc.at[j].set(h1).at[j + 1].set(h2)
        hcol = jax.lax.fori_loop(0, i, rot, hcol)

        gma = jnp.sqrt(hcol[i] ** 2 + hcol[i + 1] ** 2)
        gma = jnp.where(gma == 0.0, 1e-20, gma)
        ci, si = hcol[i] / gma, hcol[i + 1] / gma
        gg_new = gg.at[i + 1].set(-si * gg[i]).at[i].set(ci * gg[i])
        hcol_new = hcol.at[i].set(ci * hcol[i] + si * hcol[i + 1])
        gs_new = jnp.abs(gg_new[i + 1])

        H = jnp.where(brk_now, H, H.at[:, i].set(hcol_new))
        gg = jnp.where(brk_now, gg, gg_new)
        c = jnp.where(brk_now, c, c.at[i].set(ci))
        s = jnp.where(brk_now, s, s.at[i].set(si))
        kk = jnp.where(brk_now, kk, i + 1)
        gs_norm = jnp.where(brk_now, gs_norm, gs_new)
        stop = jnp.logical_not(brk_now) & (gs_new <= tol)
        return (i + 1, itr, V, Z, H, gg, c, s, kk, gs_norm, brk | brk_now,
                stop)

    init = (jnp.int32(0), itr0, V, Z, H, gg, c, s, jnp.int32(0),
            jnp.array(jnp.inf, dtype=dtype), jnp.bool_(False),
            jnp.bool_(False))
    out = jax.lax.while_loop(cond, body, init)
    _, itr, V, Z, H, gg, _, _, kk, gs_norm, _, _ = out
    return Z, H, gg, kk, itr, gs_norm


@register_solver("fgmres")
def fgmres(A, b, x0=None, M=None, opts=None, dot=vdot):
    m = opts.restart
    maxit = opts.maxit
    op, pc, x, rg = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    beta0 = jnp.sqrt(dot(rg, rg))
    tol = stopping_tol(beta0, bnorm, opts)
    hist = history_init(opts, beta0)

    def cond(carry):
        itr, x, rg, beta, hist = carry
        return (itr < maxit) & (beta > tol)

    def body(carry):
        itr, x, rg, beta, hist = carry
        bp = jnp.sqrt(dot(rg, rg))
        v0 = rg / jnp.maximum(bp, jnp.finfo(dtype).tiny)
        Z, H, gg, kk, itr, gs_norm = _fgmres_cycle(
            op, pc, v0, bp, m, maxit, itr, tol, dot, opts.breakdown)
        ym = _solve_ym(H, gg, kk, m)
        x = x + basis_combine(ym, Z)
        rg = b - op(x)
        beta = jnp.sqrt(dot(rg, rg))       # true residual each restart
        hist = history_update(opts, hist, itr, beta)
        return (itr, x, rg, beta, hist)

    init = (jnp.int32(0), x, rg, beta0, hist)
    itr, x, rg, beta, hist = jax.lax.while_loop(cond, body, init)
    return x, SolveInfo(nits=itr, residual=beta, converged=beta <= tol,
                        r0norm=beta0, bnorm=bnorm,
                        history=hist if opts.record_history else None)
