"""GMRES(m), left- and right-preconditioned.

Left variant mirrors /root/reference/src/solver-gmres.cxx:12-255
(lssp_solver_gmres): preconditioned Arnoldi with MGS, Givens rotations, the
adaptive inner tolerance ``gstol`` re-estimated each restart (:220), a true
residual recompute at every restart (:206-215), and the h≤1e-40 breakdown
that discards the current column (:152, ``i--; break``).

Right variant mirrors lssp_solver_gmres_r (:257-479): PC applied before the
SpMV, convergence checked on the Givens residual estimate directly, update
``x += M⁻¹(V·y)`` (:429-438).

All control flow is a nested ``lax.while_loop`` so a full restart cycle —
and the entire solve — is one device program; the Givens/Hessenberg scalar
recurrences live in the loop carry as (m+1)-sized device arrays, never on
the host.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, basis_combine, dot_rows,
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


def _arnoldi_cycle(op, pc, v0, beta_p, m, maxit, itr0, gstol, right, dot,
                   breakdown, cgs2=False):
    """One restart cycle.  Returns (V, H_rot, gg, kk, itr, gs_norm).

    ``kk`` is the number of usable columns (excludes a broken-down column,
    matching the reference's ``i--; break`` + ``kk = i==m ? m : i+1``).
    ``cgs2``: orthogonalize by twice-iterated CLASSICAL Gram–Schmidt
    instead of MGS — all i+1 basis coefficients come from ONE batched
    reduction per pass (dot_rows), so the per-column cross-chip sync cost
    is 3 reductions regardless of i (MGS pays i+1 dependent dots).  CGS2
    is the standard low-sync choice with MGS-grade orthogonality.
    """
    n = v0.shape[0]
    dtype = v0.dtype
    V = jnp.zeros((m, n), dtype=dtype).at[0].set(v0)
    H = jnp.zeros((m + 1, m), dtype=dtype)
    gg = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta_p)
    c = jnp.zeros(m, dtype=dtype)
    s = jnp.zeros(m, dtype=dtype)

    def cond(carry):
        i, itr, V, H, gg, c, s, kk, gs_norm, brk, stop = carry
        ok = (i < m) & jnp.logical_not(brk) & jnp.logical_not(stop)
        if right:
            ok = ok & (itr < maxit)
        return ok

    def body(carry):
        i, itr, V, H, gg, c, s, kk, gs_norm, brk, stop = carry
        itr = itr + 1
        vi = V[i]
        if right:
            w = op(pc(vi))
        else:
            w = pc(op(vi))

        if cgs2:
            # twice-iterated classical Gram–Schmidt: rows of V beyond i are
            # zero within a cycle, so the batched reductions need no mask
            h1 = dot_rows(dot, V, w)
            w = w - basis_combine(h1, V)
            h2 = dot_rows(dot, V, w)
            w = w - basis_combine(h2, V)
            hcol = jnp.zeros(m + 1, dtype=dtype).at[:m].set(h1 + h2)
        else:
            # modified Gram–Schmidt against v[0..i]
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

        # apply accumulated Givens rotations to the new column
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

        # commit column i only when no breakdown (reference discards it)
        H = jnp.where(brk_now, H, H.at[:, i].set(hcol_new))
        gg = jnp.where(brk_now, gg, gg_new)
        c = jnp.where(brk_now, c, c.at[i].set(ci))
        s = jnp.where(brk_now, s, s.at[i].set(si))
        kk = jnp.where(brk_now, kk, i + 1)
        gs_norm = jnp.where(brk_now, gs_norm, gs_new)
        stop = jnp.logical_not(brk_now) & (gs_new <= gstol)
        return (i + 1, itr, V, H, gg, c, s, kk, gs_norm, brk | brk_now, stop)

    init = (jnp.int32(0), itr0, V, H, gg, c, s, jnp.int32(0),
            jnp.array(jnp.inf, dtype=dtype), jnp.bool_(False), jnp.bool_(False))
    i, itr, V, H, gg, c, s, kk, gs_norm, brk, stop = (
        jax.lax.while_loop(cond, body, init))
    return V, H, gg, kk, itr, gs_norm


def _solve_ym(H, gg, kk, m):
    """Back-substitute the kk×kk rotated Hessenberg system; ym[i]=0 for i≥kk."""
    dtype = gg.dtype
    jrange = jnp.arange(m + 1)

    def back(jj, state):
        gg, ym = state
        i = kk - 1 - jj
        denom = H[i, i]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        ymi = gg[i] / denom
        mask = (jrange < i).astype(dtype)
        gg = gg - ymi * mask * H[:, i]
        return (gg, ym.at[i].set(ymi))

    gg, ym = jax.lax.fori_loop(0, kk, back, (gg, jnp.zeros(m, dtype=dtype)))
    return ym


def _gmres(A, b, x0, M, opts, dot, right, cgs2=False):
    m = opts.restart
    maxit = opts.maxit
    op, pc, x, rg = init_state(A, b, x0, M)
    dtype = b.dtype
    bnorm = jnp.sqrt(dot(b, b))
    beta0 = jnp.sqrt(dot(rg, rg))
    err_rel = beta0
    tol = stopping_tol(beta0, bnorm, opts)
    rtol = tol / jnp.maximum(beta0, jnp.finfo(dtype).tiny)
    hist = history_init(opts, beta0)

    def cond(carry):
        itr, x, rg, beta, gstol, hist = carry
        return (itr < maxit) & (beta > tol)

    def body(carry):
        itr, x, rg, beta, gstol, hist = carry
        if right:
            bp = jnp.sqrt(dot(rg, rg))
            v0 = rg / bp
        else:
            z0 = pc(rg)
            bp = jnp.sqrt(dot(z0, z0))
            v0 = z0 / bp
            # first cycle seeds gstol from the preconditioned residual norm
            gstol = jnp.where(itr == 0, rtol * bp * 0.5, gstol)
        V, H, gg, kk, itr, gs_norm = _arnoldi_cycle(
            op, pc, v0, bp, m, maxit, itr, gstol if not right else tol,
            right, dot, opts.breakdown, cgs2=cgs2)
        ym = _solve_ym(H, gg, kk, m)
        vy = basis_combine(ym, V)
        if right:
            x = x + pc(vy)
            beta = gs_norm                     # Givens estimate is the residual
            rg = b - op(x)                     # recomputed for the next cycle
        else:
            x = x + vy
            rg = b - op(x)
            beta = jnp.sqrt(dot(rg, rg))       # true residual each restart
            safe = jnp.maximum(beta / jnp.maximum(err_rel, jnp.finfo(dtype).tiny),
                               jnp.finfo(dtype).tiny)
            gstol = rtol * gs_norm / safe * 0.5
        hist = history_update(opts, hist, itr, beta)
        return (itr, x, rg, beta, gstol, hist)

    init = (jnp.int32(0), x, rg, beta0, jnp.zeros((), dtype), hist)
    itr, x, rg, beta, gstol, hist = jax.lax.while_loop(cond, body, init)
    return x, SolveInfo(nits=itr, residual=beta, converged=beta <= tol,
                        r0norm=beta0, bnorm=bnorm,
                        history=hist if opts.record_history else None)


@register_solver("gmres")
def gmres(A, b, x0=None, M=None, opts=None, dot=vdot):
    """Left-preconditioned GMRES(m) (reference LSSP_SOLVER_GMRES)."""
    return _gmres(A, b, x0, M, opts, dot, right=False)


@register_solver("rgmres")
def gmres_r(A, b, x0=None, M=None, opts=None, dot=vdot):
    """Right-preconditioned GMRES(m) (reference LSSP_SOLVER_RGMRES)."""
    return _gmres(A, b, x0, M, opts, dot, right=True)


@register_solver("cagmres")
def cagmres(A, b, x0=None, M=None, opts=None, dot=vdot):
    """Communication-avoiding (merged-dot) GMRES(m): CGS2 orthogonalization
    — 3 batched reductions per Arnoldi column regardless of the column
    index, vs MGS's i+1 dependent dots.  The multi-chip latency answer for
    restarted GMRES; iteration counts match gmres (CGS2 ≈ MGS
    orthogonality).  No reference analog (the reference is serial)."""
    return _gmres(A, b, x0, M, opts, dot, right=False, cgs2=True)


@register_solver("cargmres")
def cargmres(A, b, x0=None, M=None, opts=None, dot=vdot):
    """Right-preconditioned merged-dot GMRES(m) (see cagmres) — the
    variant solve_ir uses for fp32 inner solves."""
    return _gmres(A, b, x0, M, opts, dot, right=True, cgs2=True)
