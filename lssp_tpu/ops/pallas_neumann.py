"""Fused Pallas TPU kernel for the whole Neumann-ILU application.

The truncated-Neumann ILU apply (ops/trisolve.py: neumann_ilu_apply — the
TPU default, reference apply contract solver-tri.cxx:48-60) costs 2·k
factor SpMVs per preconditioner application.  As separate XLA ops each
sweep re-reads the factors and the iterate from HBM — and on small/medium
problems (the unstructured acceptance matrices are 15–16k rows) the whole
working set is a couple of MB, so the apply is pure per-op overhead: the
round-3 phase profile measured 1.9 ms per apply on coupled3d, ~30× the
bandwidth cost of the data touched (benchmarks/phase_profile.py).

This kernel runs the ENTIRE apply — k forward sweeps, the diagonal scale,
k backward sweeps — as ONE grid-(1,) Pallas program with both factors,
the iterate, and the scratch window resident in VMEM:

  * the dominant band of each strict factor is stored DIA-style
    (ndiag, P) and applied as static-offset shifted VPU multiply-adds
    against a margin-padded window (same geometry as ops/pallas_spmv.py);
  * the few off-band "stray" entries (general-pattern matrices: the
    RCM-resistant couplings of coupled3d_25) are applied EXACTLY with two
    small MXU matmuls per sweep via precomputed one-hot operands:
      gather   y[col_j]  = Σ_w onehot(col//128)[j,w] · y2[w, :] ⊙ onehot(col%128)
      scatter  acc2[w,:] += Σ_j onehot(row//128)ᵀ[w,j] · (c_j · onehot(row%128)[j,:])
    — no dynamic indexing, no serialization, cost K·(nwin+128) MACs.

Eligibility (plan_fused_neumann returns None otherwise): everything must
fit the VMEM budget and the factors must be band-dominated.  Precision:
TPU Pallas has no f64, so the fused apply runs in fp32 — the prepared
preconditioner becomes a (fixed) fp32 linear operator inside an fp64
Krylov iteration, the standard mixed-precision PC trade; acceptance
iteration counts are the guard (benchmarks/acceptance.py ratchet).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 1024           # 1-D VMEM slice alignment (matches pallas_spmv)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class _Factor:
    """One strict triangular factor, split band + one-hot remainder."""

    band: Any           # (ndiag, P) fp32
    offsets: tuple      # static diagonal offsets
    gt: Any             # (K, nwin) one-hot col//128, or None
    gl: Any             # (K, 128)  vals ⊙ one-hot col%128
    rl: Any             # (K, 128)  one-hot row%128
    rtT: Any            # (nwin, K) one-hot row//128, transposed


@dataclasses.dataclass(frozen=True)
class FusedNeumann:
    """Device state for the fused apply.  ``lo``/``hi`` are the margin
    sizes (aligned), ``sweeps`` the truncation order, ``n`` the true and
    ``P`` the padded row count."""

    L: _Factor
    U: _Factor          # strict upper, rows pre-scaled by 1/diag
    invdiag: Any        # (P,) fp32, zero on padding rows
    n: int
    P: int
    lo: int
    hi: int
    sweeps: int


def _flatten(s):
    leaves = (s.L.band, s.L.gt, s.L.gl, s.L.rl, s.L.rtT,
              s.U.band, s.U.gt, s.U.gl, s.U.rl, s.U.rtT, s.invdiag)
    aux = (s.L.offsets, s.U.offsets, s.n, s.P, s.lo, s.hi, s.sweeps)
    return leaves, aux


def _unflatten(aux, leaves):
    loff, uoff, n, P, lo, hi, sweeps = aux
    L = _Factor(leaves[0], loff, *leaves[1:5])
    U = _Factor(leaves[5], uoff, *leaves[6:10])
    return FusedNeumann(L=L, U=U, invdiag=leaves[10], n=n, P=P, lo=lo,
                        hi=hi, sweeps=sweeps)


jax.tree_util.register_pytree_node(FusedNeumann, _flatten, _unflatten)


def _split_band(S, n, P, max_diags, min_occ):
    """Band/stray split of a strict factor (host, numpy).  Returns
    (band (nd, P) fp32, offsets tuple, stray (rows, cols, vals))."""
    ip = np.asarray(S.indptr)
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(S.indices, dtype=np.int64)
    vals = np.asarray(S.data, dtype=np.float64)
    d = cols - rows
    offs, inv, counts = np.unique(d, return_inverse=True,
                                  return_counts=True)
    take = np.argsort(-counts, kind="stable")[:max_diags]
    take = take[counts[take] >= max(1, int(min_occ * n))]
    keep = np.zeros(len(offs), dtype=bool)
    keep[take] = True
    in_band = keep[inv]
    kept = np.sort(offs[keep])
    band = np.zeros((max(len(kept), 1), P), dtype=np.float32)
    if len(kept):
        didx = np.searchsorted(kept, d[in_band])
        band[didx, rows[in_band]] = vals[in_band].astype(np.float32)
    offsets = tuple(int(o) for o in kept) if len(kept) else (0,)
    stray = (rows[~in_band], cols[~in_band], vals[~in_band])
    return band, offsets, stray


def _onehot_ops(rows, cols, vals, P):
    """One-hot gather/scatter operands for K stray entries (host)."""
    K = len(rows)
    if K == 0:
        return None, None, None, None
    nwin = P // _LANE
    Kp = _round_up(K, 8)
    gt = np.zeros((Kp, nwin), dtype=np.float32)
    gl = np.zeros((Kp, _LANE), dtype=np.float32)
    rl = np.zeros((Kp, _LANE), dtype=np.float32)
    rtT = np.zeros((nwin, Kp), dtype=np.float32)
    k = np.arange(K)
    gt[k, cols // _LANE] = 1.0
    gl[k, cols % _LANE] = vals.astype(np.float32)   # value folded in
    rl[k, rows % _LANE] = 1.0
    rtT[rows // _LANE, k] = 1.0
    return gt, gl, rl, rtT


def plan_fused_neumann(L, U, sweeps: int, max_diags: int = 48,
                       min_occ: float = 0.02,
                       vmem_budget: int = 11 * 1024 * 1024
                       ) -> Optional[FusedNeumann]:
    """Build the fused-apply state from host CSR factors L (strict lower +
    unit diag implied) and U (upper, holds the diagonal), or return None
    when the problem doesn't fit the kernel's VMEM-resident model."""
    from lssp_tpu.sparse.utils import split_ldu

    n = L.shape[0]
    if n < _ALIGN:
        return None
    P = _round_up(n, _ALIGN)
    Ls, _, _ = split_ldu(L)
    _, dU, Us = split_ldu(U)
    dU = np.asarray(dU, dtype=np.float64)
    dU = np.where(dU == 0, 1.0, dU)
    inv = 1.0 / dU
    # U⁻¹ = (I + D⁻¹Us)⁻¹ D⁻¹ — scale strict-upper rows once (same
    # identity as ops/trisolve.py: make_neumann_tri)
    ipu = np.asarray(Us.indptr)
    urows = np.repeat(np.arange(n), ipu[1:] - ipu[:-1])
    import dataclasses as _dc
    Us = _dc.replace(Us, data=np.asarray(Us.data) * inv[urows])

    lband, loff, lstray = _split_band(Ls, n, P, max_diags, min_occ)
    uband, uoff, ustray = _split_band(Us, n, P, max_diags, min_occ)
    # band-dominated check: stray one-hots cost 2K(nwin+128) floats each
    nwin = P // _LANE
    foot = (lband.size + uband.size + 4 * P)
    for rows, cols, vals in (lstray, ustray):
        Kp = _round_up(max(len(rows), 1), 8)
        if len(rows):
            foot += 2 * Kp * (nwin + 2 * _LANE)
    lo = _round_up(max(1, -min(loff)), _ALIGN)
    hi = _round_up(max(1, max(uoff)), _ALIGN)
    foot += lo + hi + P        # scratch window
    if foot * 4 > vmem_budget:
        return None

    invd = np.zeros(P, dtype=np.float32)
    invd[:n] = inv.astype(np.float32)
    Lf = _Factor(jnp.asarray(lband), loff, *map(_j, _onehot_ops(*lstray, P)))
    Uf = _Factor(jnp.asarray(uband), uoff, *map(_j, _onehot_ops(*ustray, P)))
    return FusedNeumann(L=Lf, U=Uf, invdiag=jnp.asarray(invd), n=n, P=P,
                        lo=lo, hi=hi, sweeps=int(sweeps))


def _j(a):
    return None if a is None else jnp.asarray(a)


@functools.lru_cache(maxsize=None)
def _build_call(loff, uoff, n, P, lo, hi, sweeps, has_lrem, has_urem,
                interpret):
    """Construct the pallas_call for one static geometry (cached)."""
    nwin = P // _LANE
    W = lo + P + hi

    def band_acc(bref, offsets, yw):
        acc = bref[0, :] * yw[pl.ds(lo + offsets[0], P)]
        for d in range(1, bref.shape[0]):
            acc = acc + bref[d, :] * yw[pl.ds(lo + offsets[d], P)]
        return acc

    def rem_acc(yc, gt, gl, rl, rtT):
        y2 = yc.reshape(nwin, _LANE)
        # HIGHEST: the MXU's default fp32 path rounds through bf16 passes
        # (~5e-6 relative); exact fp32 keeps the fused apply within fp32
        # round-off of the XLA Neumann oracle (tests/test_pallas_neumann)
        hp = jax.lax.Precision.HIGHEST
        rows = jnp.dot(gt[:], y2, preferred_element_type=jnp.float32,
                       precision=hp)
        c = jnp.sum(rows * gl[:], axis=1)               # (K,) = v·y[col]
        upd = jnp.dot(rtT[:], c[:, None] * rl[:],
                      preferred_element_type=jnp.float32, precision=hp)
        return upd.reshape(P)

    def kernel(*refs):
        i = 0
        r_ref = refs[i]; i += 1
        lb = refs[i]; i += 1
        lrem = refs[i:i + 4] if has_lrem else None
        i += 4 if has_lrem else 0
        ub = refs[i]; i += 1
        urem = refs[i:i + 4] if has_urem else None
        i += 4 if has_urem else 0
        invd = refs[i]; i += 1
        out_ref = refs[i]; i += 1
        yw, zr = refs[i], refs[i + 1]

        yw[pl.ds(0, lo)] = jnp.zeros((lo,), jnp.float32)
        yw[pl.ds(lo + P, hi)] = jnp.zeros((hi,), jnp.float32)
        r = r_ref[:]
        yw[pl.ds(lo, P)] = r
        for _ in range(sweeps):
            yc = yw[pl.ds(lo, P)]
            acc = band_acc(lb, loff, yw)
            if has_lrem:
                acc = acc + rem_acc(yc, *lrem)
            yw[pl.ds(lo, P)] = r - acc
        z0 = invd[:] * yw[pl.ds(lo, P)]
        zr[:] = z0
        yw[pl.ds(lo, P)] = z0
        for _ in range(sweeps):
            yc = yw[pl.ds(lo, P)]
            acc = band_acc(ub, uoff, yw)
            if has_urem:
                acc = acc + rem_acc(yc, *urem)
            yw[pl.ds(lo, P)] = zr[:] - acc
        out_ref[:] = yw[pl.ds(lo, P)]

    nin = 4 + (4 if has_lrem else 0) + (4 if has_urem else 0)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nin,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P,), jnp.float32),
        scratch_shapes=[pltpu.VMEM((W,), jnp.float32),
                        pltpu.VMEM((P,), jnp.float32)],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _vmap_safe_apply(interpret):
    """custom_vmap wrapper (same reason as pallas_spmv._vmap_safe_kernel):
    Mosaic's automatic batching rejects the whole-array VMEM operands.
    Batched rhs (solve_ir_multi's vmapped per-column inner applies) run
    per-column kernel calls under ``lax.map`` — each call is the fast
    VMEM-resident program, and the factor operands are shared."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(state, r):
        return _apply_impl(state, r, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, state, r):
        state_b, r_b = in_batched
        if any(jax.tree_util.tree_leaves(state_b)):
            raise NotImplementedError(
                "vmap over stacked fused-ILU factor states is unsupported; "
                "vmap over the rhs only")
        if state.L.gt is None and state.U.gt is None:
            # pure-band factors (stencil ILU — the common case): run the
            # sweeps as XLA shifted-stream SpMMs so the factor diagonals
            # stream ONCE for all k rhs — per-column kernel calls re-read
            # them k times (multi-rhs serving regressed 8→21 ms at k=8
            # before this rule)
            return _batched_band_apply(state, r), True
        y = jax.lax.map(lambda rr: _apply_impl(state, rr, interpret), r)
        return y, True

    return f


def _batched_band_apply(state: FusedNeumann, R):
    """(k, n) Neumann-ILU apply for pure-band factors: every sweep is one
    shifted-stream SpMM over the whole rhs block (fp32, same math as the
    fused kernel's band path)."""
    n, P = state.n, state.P
    R32 = R.astype(jnp.float32)
    if P != n:
        R32 = jnp.pad(R32, ((0, 0), (0, P - n)))

    def band_mm(band, offsets, Y):
        lo = max(0, -min(offsets))
        hi = max(0, max(offsets))
        Yp = jnp.pad(Y, ((0, 0), (lo, hi)))
        acc = jnp.zeros_like(Y)
        for d, off in enumerate(offsets):
            acc = acc + band[d] * jax.lax.slice_in_dim(
                Yp, lo + off, lo + off + P, axis=1)
        return acc

    Y = R32
    for _ in range(state.sweeps):
        Y = R32 - band_mm(state.L.band, state.L.offsets, Y)
    Zr = state.invdiag[None, :] * Y
    Z = Zr
    for _ in range(state.sweeps):
        Z = Zr - band_mm(state.U.band, state.U.offsets, Z)
    return Z[:, :n].astype(R.dtype)


def fused_neumann_apply(state: FusedNeumann, r, interpret: bool = False):
    """z ≈ U⁻¹L⁻¹ r — the whole truncated-Neumann ILU apply in ONE
    fp32 Pallas program (cast in/out when the outer iteration is fp64).
    vmap-safe: batched rhs run per-column kernel calls."""
    return _vmap_safe_apply(bool(interpret))(state, r)


def _apply_impl(state: FusedNeumann, r, interpret: bool = False):
    n, P = state.n, state.P
    r32 = r.astype(jnp.float32)
    if P != n:
        r32 = jnp.pad(r32, (0, P - n))
    has_lrem = state.L.gt is not None
    has_urem = state.U.gt is not None
    call = _build_call(state.L.offsets, state.U.offsets, n, P,
                       state.lo, state.hi, state.sweeps,
                       has_lrem, has_urem, bool(interpret))
    args = [r32, state.L.band]
    if has_lrem:
        args += [state.L.gt, state.L.gl, state.L.rl, state.L.rtT]
    args.append(state.U.band)
    if has_urem:
        args += [state.U.gt, state.U.gl, state.U.rl, state.U.rtT]
    args.append(state.invdiag)
    z = call(*args)
    return z[:n].astype(r.dtype)
