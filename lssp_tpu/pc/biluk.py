"""Block-ILU(k) on uniform BSR (reference pc-biluk.cxx).

Host factorization reproduces the reference's math with row-major blocks:

- block symbolic = scalar ILU(k) on the block sparsity pattern
  (lssp_pc_biluk_symbolic__, pc-biluk.cxx:328-386)
- block ILU(0) numeric (lssp_pc_bilu0_fac, :198-277):
  ``A_ik ← A_ik · inv(A_kk)`` then Schur updates ``A_ij −= A_ik · A_kj``;
  diagonal blocks inverted explicitly (LAPACK dgetrf/dgetri there,
  ``np.linalg.inv`` here); a missing diagonal block becomes identity
  (:265-276)
- emit (lssp_pc_bilu_bcsr_to_lu, :104-196): unit-block-diagonal L holding
  the multipliers, unit-block-diagonal Û holding ``inv(A_ii)·A_ij``, and
  the block-diagonal D = inv(A_ii)

Apply (lssp_pc_bilu_solve, :22-60): z = Û⁻¹ · D · L⁻¹ · r.  On TPU each
piece is block-granular: level-scheduled block sweeps (einsum batched GEMM)
plus one batched block-diagonal GEMV — all MXU work, no scalar expansion.
"""
from __future__ import annotations

import numpy as np

from lssp_tpu.ops.block_trisolve import (
    BlockTriSchedule, block_level_schedule, block_trisweep, block_diag_apply,
)
from lssp_tpu.pc.base import Preconditioner, register_pc
from lssp_tpu.pc.ilu_host import iluk_symbolic
from lssp_tpu.sparse.types import CSR, BSR
from lssp_tpu.sparse.convert import csr_to_bsr


def _block_symbolic(A: BSR, level: int) -> BSR:
    """Scalar ILU(k) symbolic on the block pattern; original blocks scattered
    onto the grown pattern, fill blocks zero."""
    nrowb = A.nrowb
    bs = A.blocksize
    if level <= 0:
        return A
    pat = CSR(A.indptr, A.indices,
              np.zeros(A.nnzb, dtype=A.blocks.dtype), (nrowb, nrowb))
    grown = iluk_symbolic(pat, level)
    gip = np.asarray(grown.indptr).astype(np.int64)
    gidx = np.asarray(grown.indices).astype(np.int64)
    blocks = np.zeros((len(gidx), bs, bs), dtype=A.blocks.dtype)
    aip = np.asarray(A.indptr).astype(np.int64)
    aidx = np.asarray(A.indices).astype(np.int64)
    for i in range(nrowb):
        loc = np.searchsorted(gidx[gip[i]:gip[i + 1]], aidx[aip[i]:aip[i + 1]])
        blocks[gip[i] + loc] = np.asarray(A.blocks)[aip[i]:aip[i + 1]]
    return BSR(gip.astype(np.int32), gidx.astype(np.int32), blocks,
               A.shape, bs)


def bilu0_factor_bsr(T: BSR):
    """Block ILU(0) on the fixed block pattern of ``T`` (in place on a copy).
    Returns (blocks, inv) — the combined factor blocks and the per-row
    inverted diagonal blocks."""
    nrowb, bs = T.nrowb, T.blocksize
    ip = np.asarray(T.indptr).astype(np.int64)
    idx = np.asarray(T.indices).astype(np.int64)
    blocks = np.asarray(T.blocks).copy()
    inv = np.zeros((nrowb, bs, bs), dtype=blocks.dtype)
    eye = np.eye(bs, dtype=blocks.dtype)

    posmap = np.full(nrowb, -1, dtype=np.int64)
    for i in range(nrowb):
        s, e = ip[i], ip[i + 1]
        posmap[idx[s:e]] = np.arange(s, e)
        kpos = s
        while kpos < e and idx[kpos] < i:
            k = idx[kpos]
            a_ik = blocks[kpos] @ inv[k]
            blocks[kpos] = a_ik
            ks, ke = ip[k], ip[k + 1]
            tp = posmap[idx[ks:ke]]
            mask = tp > kpos
            if mask.any():
                # Schur updates: A_ij −= A_ik · A_kj  (batched)
                blocks[tp[mask]] -= a_ik @ blocks[ks:ke][mask]
            kpos += 1
        posmap[idx[s:e]] = -1
        if kpos < e and idx[kpos] == i:
            inv[i] = np.linalg.inv(blocks[kpos])
        else:
            inv[i] = eye           # missing diagonal block (:265-276)
    return blocks, inv


def biluk_factor_bsr(A: BSR, level: int = 1):
    """Returns (L_sched, Dinv, U_sched) device-ready pieces."""
    T = _block_symbolic(A, level)
    blocks, inv = bilu0_factor_bsr(T)
    nrowb, bs = T.nrowb, T.blocksize
    ip = np.asarray(T.indptr).astype(np.int64)
    idx = np.asarray(T.indices).astype(np.int64)
    rows = np.repeat(np.arange(nrowb, dtype=np.int64), ip[1:] - ip[:-1])

    def strict(mask, transform=None):
        r, c = rows[mask], idx[mask]
        blk = blocks[mask]
        if transform is not None:
            blk = transform(r, blk)
        p = np.zeros(nrowb + 1, dtype=np.int64)
        np.add.at(p, r + 1, 1)
        p = np.cumsum(p)
        order = np.lexsort((c, r))
        return p, c[order], blk[order]

    lp, lc, lb = strict(idx < rows)
    # Û blocks are premultiplied by inv(A_ii) (pc-biluk.cxx:162)
    up, uc, ub = strict(idx > rows, transform=lambda r, blk: inv[r] @ blk)
    sched_l = block_level_schedule(lp, lc, lb, nrowb, bs, lower=True)
    sched_u = block_level_schedule(up, uc, ub, nrowb, bs, lower=False)
    return sched_l, inv, sched_u


def _bilu_apply(state, r):
    sched_l, dinv, sched_u = state
    y = block_trisweep(sched_l, r)
    z = block_diag_apply(dinv, y)
    return block_trisweep(sched_u, z)


@register_pc("biluk")
def setup_biluk(A, opts):
    """Reference lssp_pc_biluk_assemble (pc-biluk.cxx:418-431):
    bs = n / num_blocks; requires num_blocks (or an explicit block_size)."""
    if isinstance(A, BSR):
        B = A
    else:
        n = A.shape[0]
        if opts.block_size:
            bs = int(opts.block_size)
        elif opts.num_blocks:
            bs = n // int(opts.num_blocks)
        else:
            raise ValueError("biluk needs PCOptions.num_blocks or .block_size "
                             "(reference requires s.num_blks, pc-biluk.cxx:424)")
        B = csr_to_bsr(A, bs)
    sched_l, inv, sched_u = biluk_factor_bsr(B, level=opts.iluk_level)
    return Preconditioner(_bilu_apply, state=(sched_l, inv, sched_u),
                          name=f"biluk({opts.iluk_level})")
