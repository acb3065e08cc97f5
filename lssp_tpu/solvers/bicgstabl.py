"""BiCGSTAB(l) (reference lssp_solver_bicgstabl,
/root/reference/src/solver-bicgstabl.cxx:4-217): right-preconditioning in
disguise — the recurrence runs on the operator A∘M⁻¹ (:99-100,138-139) with
the iterate accumulated in the preconditioned variable; on exit
x = M⁻¹x̂ + x0 (:130-134,189-194).  BiCG part builds l residual/direction
vectors, then the MR (minimal-residual) polynomial part combines them.

l = opts.bgsl (default 4, :29).  The l-step inner loop is a
``lax.fori_loop`` with masked early-exit; the MR triangular recurrences run
on (l+1)-sized carries.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lssp_tpu.solvers.base import (
    vdot, 
    SolveInfo, init_state, stopping_tol, history_init, history_update,
)
from lssp_tpu.solvers.registry import register_solver


@register_solver("bicgstabl")
def bicgstabl(A, b, x0=None, M=None, opts=None, dot=vdot):
    l = opts.bgsl
    op, pc, x_in, r0 = init_state(A, b, x0, M)
    dtype = b.dtype
    n = b.shape[0]
    bnorm = jnp.sqrt(dot(b, b))
    r0norm = jnp.sqrt(dot(r0, r0))
    tol = stopping_tol(r0norm, bnorm, opts)
    hist = history_init(opts, r0norm)

    rtld = r0
    xp = x_in
    # x̂ accumulates the correction in the preconditioned variable, starting
    # from 0 (the reference reuses x without zeroing — identical when x0=0,
    # and mathematically the correct shifted-system formulation otherwise)
    xh = jnp.zeros_like(b)
    R = jnp.zeros((l + 1, n), dtype=dtype).at[0].set(r0)
    U = jnp.zeros((l + 1, n), dtype=dtype)

    def cond(carry):
        it, xh, R, U, alpha, omega, rho0, res, done, hist = carry
        return (it <= opts.maxit) & (res > tol) & jnp.logical_not(done)

    def body(carry):
        it, xh, R, U, alpha, omega, rho0, res, done, hist = carry
        rho0 = -omega * rho0

        # ---- BiCG part: j = 0..l-1 with masked early exit ----
        def bicg_step(j, st):
            it, xh, R, U, alpha, rho0, res, stop, hist = st
            rho1 = dot(rtld, R[j])
            fail = rho1 == 0.0
            beta = alpha * (rho1 / jnp.where(rho0 == 0.0, 1.0, rho0))
            rho0_n = rho1
            jmask = (jnp.arange(l + 1) <= j)[:, None].astype(dtype)
            U_new = U * (1 - jmask) + jmask * (R - beta * U)
            t = pc(U_new[j])
            Uj1 = op(t)
            U_new = U_new.at[j + 1].set(Uj1)
            nu = dot(rtld, Uj1)
            fail = fail | (nu == 0.0)
            alpha_n = rho1 / jnp.where(nu == 0.0, 1.0, nu)
            xh_n = xh + alpha_n * U_new[0]
            R_new = R * (1 - jmask) + jmask * (
                R - alpha_n * jnp.roll(U_new, -1, axis=0))
            nrm = jnp.sqrt(dot(R_new[0], R_new[0]))
            conv = nrm <= tol
            t2 = pc(R_new[j])
            Rj1 = op(t2)
            R_new = R_new.at[j + 1].set(Rj1)
            go = jnp.logical_not(stop | fail)
            it = jnp.where(go, it + 1, it)
            xh = jnp.where(go, xh_n, xh)
            U = jnp.where(go, U_new, U)
            R = jnp.where(go, R_new, R)
            alpha = jnp.where(go, alpha_n, alpha)
            rho0 = jnp.where(go, rho0_n, rho0)
            res = jnp.where(go, nrm, res)
            hist = history_update(opts, hist, it, res)
            stop = stop | fail | conv
            return (it, xh, R, U, alpha, rho0, res, stop, hist)

        st = (it, xh, R, U, alpha, rho0, res, jnp.bool_(False), hist)
        it, xh, R, U, alpha, rho0, res, stop, hist = jax.lax.fori_loop(
            0, l, bicg_step, st)

        # ---- MR part (:143-171): modified Gram-Schmidt on R[1..l] ----
        def mr():
            tau = jnp.zeros((l + 1, l + 1), dtype=dtype)
            sigma = jnp.ones(l + 1, dtype=dtype)
            gamma1 = jnp.zeros(l + 1, dtype=dtype)
            Rm = R

            def outer(j, st):
                Rm, tau, sigma, gamma1 = st
                def inner(i, st2):
                    Rm, tau = st2
                    nu = dot(Rm[j], Rm[i]) / sigma[i]
                    tau = tau.at[i, j].set(nu)
                    Rm = jax.lax.cond(
                        (i >= 1) & (i <= j - 1),
                        lambda: Rm.at[j].set(Rm[j] - nu * Rm[i]),
                        lambda: Rm)
                    return (Rm, tau)
                Rm, tau = jax.lax.fori_loop(1, j, inner, (Rm, tau))
                sigma = sigma.at[j].set(dot(Rm[j], Rm[j]))
                gamma1 = gamma1.at[j].set(
                    dot(Rm[0], Rm[j]) / jnp.where(sigma[j] == 0.0, 1.0,
                                                  sigma[j]))
                return (Rm, tau, sigma, gamma1)

            Rm, tau, sigma, gamma1 = jax.lax.fori_loop(
                1, l + 1, outer, (Rm, tau, sigma, gamma1))

            gamma = jnp.zeros(l + 1, dtype=dtype).at[l].set(gamma1[l])
            omega_n = gamma1[l]

            def back(jj, gamma):
                j = l - 1 - jj
                acc = jnp.sum(jnp.where(jnp.arange(l + 1) > j,
                                        tau[j] * gamma, 0.0))
                return gamma.at[j].set(gamma1[j] - acc)
            gamma = jax.lax.fori_loop(0, l - 1, back, gamma)
            # guard j from reaching 0 (reference loops j = l-1 .. 1)
            gamma = gamma.at[0].set(0.0)

            gamma2 = jnp.zeros(l + 1, dtype=dtype)
            def g2(j, gamma2):
                acc = jnp.sum(jnp.where((jnp.arange(l + 1) > j)
                                        & (jnp.arange(l + 1) <= l - 1),
                                        tau[j] * jnp.roll(gamma, -1), 0.0))
                return gamma2.at[j].set(gamma[j + 1] + acc)
            gamma2 = jax.lax.fori_loop(1, l, g2, gamma2)

            # UPDATE (:174-186)
            xh_n = xh + gamma[1] * Rm[0]
            R0_n = Rm[0] - gamma1[l] * Rm[l]
            U0_n = U[0] - gamma[l] * U[l]

            def upd(j, st2):
                xh_n, R0_n, U0_n = st2
                U0_n = U0_n - gamma[j] * U[j]
                xh_n = xh_n + gamma2[j] * Rm[j]
                R0_n = R0_n - gamma1[j] * Rm[j]
                return (xh_n, R0_n, U0_n)
            xh_n, R0_n, U0_n = jax.lax.fori_loop(1, l, upd,
                                                 (xh_n, R0_n, U0_n))
            Rm = Rm.at[0].set(R0_n)
            Un = U.at[0].set(U0_n)
            return xh_n, Rm, Un, omega_n

        xh_n, R_n, U_n, omega_n = mr()
        go = jnp.logical_not(stop)
        xh = jnp.where(go, xh_n, xh)
        R = jnp.where(go, R_n, R)
        U = jnp.where(go, U_n, U)
        omega = jnp.where(go, omega_n, omega)
        res = jnp.where(go, jnp.sqrt(dot(R[0], R[0])), res)
        hist = history_update(opts, hist, it, res)
        return (it, xh, R, U, alpha, omega, rho0, res, stop, hist)

    init = (jnp.int32(0), xh, R, U, jnp.zeros((), dtype),
            jnp.ones((), dtype), jnp.ones((), dtype), r0norm,
            jnp.bool_(False), hist)
    out = jax.lax.while_loop(cond, body, init)
    it, xh, res, hist = out[0], out[1], out[7], out[9]
    x = pc(xh) + xp                        # un-precondition (:130-134)
    return x, SolveInfo(nits=it, residual=res, converged=res <= tol,
                        r0norm=r0norm, bnorm=bnorm,
                        history=hist if opts.record_history else None)
