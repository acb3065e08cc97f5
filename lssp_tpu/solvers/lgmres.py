"""LGMRES(m,k), left- and right-preconditioned (reference
lssp_solver_lgmres / lssp_solver_lgmres_r,
/root/reference/src/solver-lgmres.cxx:12-311 and :313-604).

"Loose" GMRES: the Krylov basis is augmented with the last k outer-cycle
correction vectors z (ring buffer).  During Arnoldi, position i ≥ mk
multiplies A against z[i−mk] instead of v[i] (:158-164); the basis size grows
m = mk + min(itr_outer, aug_k) (:128-134).  After each cycle the correction
Δx is stored into the ring (:225-256).  kk = i at the solve label (:205) —
the current column is discarded on early exit, reproduced here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    basis_combine,
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver
from lssp_tpu.solvers.gmres import _solve_ym


def _aug_cycle(op, pc, v0, beta_p, Z, mk, auk, m_dyn, m_max, maxit, itr0,
               gstol, right, dot, breakdown):
    n = v0.shape[0]
    dtype = v0.dtype
    V = jnp.zeros((m_max, n), dtype=dtype).at[0].set(v0)
    H = jnp.zeros((m_max + 1, m_max), dtype=dtype)
    gg = jnp.zeros(m_max + 1, dtype=dtype).at[0].set(beta_p)
    c = jnp.zeros(m_max, dtype=dtype)
    s = jnp.zeros(m_max, dtype=dtype)

    def cond(carry):
        i, itr, V, H, gg, c, s, kk, gs_norm, brk, stop = carry
        ok = (i < m_dyn) & jnp.logical_not(brk) & jnp.logical_not(stop)
        if right:
            ok = ok & (itr < maxit)
        return ok

    def body(carry):
        i, itr, V, H, gg, c, s, kk, gs_norm, brk, stop = carry
        itr = itr + 1
        operand = jnp.where(i < mk, V[i % m_max],
                            Z[jnp.maximum(i - mk, 0) % max(auk, 1)])
        if right:
            w = op(pc(operand))
        else:
            w = pc(op(operand))

        def mgs(j, wh):
            w, hcol = wh
            hij = dot(w, V[j])
            return (w - hij * V[j], hcol.at[j].set(hij))
        w, hcol = jax.lax.fori_loop(0, i + 1, mgs,
                                    (w, jnp.zeros(m_max + 1, dtype=dtype)))
        hnorm = jnp.sqrt(dot(w, w))
        hcol = hcol.at[i + 1].set(hnorm)
        brk_now = jnp.abs(hnorm) <= breakdown
        vnext = w / jnp.where(brk_now, 1.0, hnorm)
        V = jnp.where(brk_now | (i + 1 >= m_dyn), V,
                      V.at[(i + 1) % m_max].set(vnext))

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
        gs_norm = jnp.where(brk_now, gs_norm, gs_new)
        stop_now = jnp.logical_not(brk_now) & (gs_new <= gstol)
        # reference kk = i at the solve label: discard the current column
        kk = jnp.where(brk_now, jnp.maximum(i - 1, 0),
                       jnp.where(stop_now, i, i + 1))
        return (i + 1, itr, V, H, gg, c, s, kk, gs_norm,
                brk | brk_now, stop_now)

    init = (jnp.int32(0), itr0, V, H, gg, c, s, jnp.int32(0),
            jnp.array(jnp.inf, dtype=dtype), jnp.bool_(False),
            jnp.bool_(False))
    i, itr, V, H, gg, c, s, kk, gs_norm, brk, stop = (
        jax.lax.while_loop(cond, body, init))
    return V, H, gg, kk, itr, gs_norm


def _lgmres(A, b, x0, M, opts, dot, right):
    mk = opts.restart
    auk = max(opts.aug_k, 0)
    m_max = mk + auk
    maxit = opts.maxit
    op, pc, x, rg = init_state(A, b, x0, M)
    dtype = b.dtype
    n = b.shape[0]
    bnorm = jnp.sqrt(dot(b, b))
    beta0 = jnp.sqrt(dot(rg, rg))
    err_rel = beta0
    tol = stopping_tol(beta0, bnorm, opts)
    rtol = tol / jnp.maximum(beta0, jnp.finfo(dtype).tiny)
    hist = history_init(opts, beta0)
    Z0 = jnp.zeros((max(auk, 1), n), dtype=dtype)

    def cond(carry):
        itr, itr_outer, x, rg, beta, gstol, Z, hist = carry
        return (itr < maxit) & (beta > tol)

    def body(carry):
        itr, itr_outer, x, rg, beta, gstol, Z, hist = carry
        m_dyn = jnp.minimum(mk + jnp.minimum(itr_outer, auk), m_max)
        if right:
            bp = jnp.sqrt(dot(rg, rg))
            v0 = rg / bp
        else:
            z0 = pc(rg)
            bp = jnp.sqrt(dot(z0, z0))
            v0 = z0 / bp
            gstol = jnp.where(itr_outer == 0, rtol * bp * 0.5, gstol)
        V, H, gg, kk, itr, gs_norm = _aug_cycle(
            op, pc, v0, bp, Z, mk, auk, m_dyn, m_max, maxit, itr,
            gstol if not right else tol, right, dot, opts.breakdown)
        ym = _solve_ym(H, gg, kk, m_max)
        corr = basis_combine(ym[:mk], V[:mk]) + (basis_combine(ym[mk:], Z) if auk > 0 else 0.0)
        if right:
            x = x + pc(corr)
            beta = gs_norm
            rg = b - op(x)
        else:
            x = x + corr
            rg = b - op(x)
            beta = jnp.sqrt(dot(rg, rg))
            safe = jnp.maximum(beta / jnp.maximum(err_rel,
                                                  jnp.finfo(dtype).tiny),
                               jnp.finfo(dtype).tiny)
            gstol = rtol * gs_norm / safe * 0.5
        if auk > 0:
            Z = Z.at[jnp.mod(itr_outer, auk)].set(corr)
        hist = history_update(opts, hist, itr, beta)
        return (itr, itr_outer + 1, x, rg, beta, gstol, Z, hist)

    init = (jnp.int32(0), jnp.int32(0), x, rg, beta0,
            jnp.zeros((), dtype), Z0, hist)
    itr, itr_outer, x, rg, beta, gstol, Z, hist = (
        jax.lax.while_loop(cond, body, init))
    return x, SolveInfo(nits=itr, residual=beta, converged=beta <= tol,
                        r0norm=beta0, bnorm=bnorm,
                        history=hist if opts.record_history else None)


@register_solver("lgmres")
def lgmres(A, b, x0=None, M=None, opts=None, dot=vdot):
    """Left-preconditioned LGMRES(m,k) (reference LSSP_SOLVER_LGMRES)."""
    return _lgmres(A, b, x0, M, opts, dot, right=False)


@register_solver("rlgmres")
def lgmres_r(A, b, x0=None, M=None, opts=None, dot=vdot):
    """Right-preconditioned LGMRES(m,k) (reference LSSP_SOLVER_RLGMRES)."""
    return _lgmres(A, b, x0, M, opts, dot, right=True)
