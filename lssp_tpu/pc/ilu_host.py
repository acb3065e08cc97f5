"""Host-side ILU factorizations (numpy/Python; a C++ fast path can override).

Algorithms reproduce the reference exactly:

- ``iluk_symbolic``: level-of-fill pattern growth
  (/root/reference/src/pc-iluk.cxx:22-135).  Note the reference's level
  update for an *existing* entry takes the MAX of old and candidate level
  (:103 ``if (levls[ip] < it) levls[ip] = it``) — not the textbook min — and
  original entries enter at level 0.  Reproduced as-is for pattern parity.
- ``ilu0_numeric``: IKJ Gaussian elimination on a fixed sorted pattern
  (pc-iluk.cxx:347-409), pivots clamped: row 0 sign-preserving ±1e-3 when
  |d|<1e-10, later rows clamped to +1e-3, missing diagonal ⇒ 1e-3
  (:367-374, :399-404).
- ``ilut_factor``: Saad dual-threshold ILUT (pc-ilut.cxx:51-286): drop new
  fill when |fill| < tol·(mean |row|), keep the p largest-|·| entries per
  L/U row part (quickselect :7-49), diagonal always kept and clamped
  sign-preserving; row 0 copied verbatim (:89-98); p defaults to
  ceil(nnz/n) (:436-438).

Both entry points first run ``adjust_zero_diag`` (pc-iluk.cxx:573,
pc-ilut.cxx:448) so a structural diagonal always exists.
"""
from __future__ import annotations

import bisect

import numpy as np

from lssp_tpu.config import Defaults
from lssp_tpu.sparse.types import CSR
from lssp_tpu.sparse.utils import adjust_zero_diag, sort_columns, split_lu
from lssp_tpu import native


def iluk_symbolic(A: CSR, level: int) -> CSR:
    """Level-of-fill symbolic phase: returns the combined L+U pattern as a
    sorted CSR with data slots zeroed (values set separately)."""
    n = A.shape[0]
    ip = np.asarray(A.indptr).astype(np.int64)
    idx = np.asarray(A.indices).astype(np.int64)

    if native.available():
        nip, nidx = native.iluk_symbolic(ip, idx, n, level)
        return CSR(nip.astype(np.int32), nidx.astype(np.int32),
                   np.zeros(len(nidx), dtype=A.data.dtype), A.shape)

    u_cols = [None] * n     # strict-upper pattern per factored row
    u_lev = [None] * n      # matching fill levels
    out_rows = [None] * n

    for i in range(n):
        s, e = ip[i], ip[i + 1]
        cols_i = idx[s:e]
        lev = {}
        for c in cols_i:
            if c != i:
                lev[int(c)] = 0
        # process lower columns in ascending order, merging factored U rows
        lower = sorted(c for c in lev if c < i)
        pos = 0
        while pos < len(lower):
            k = lower[pos]
            lk = lev[k]
            uk_cols, uk_lev = u_cols[k], u_lev[k]
            for c, lc in zip(uk_cols, uk_lev):
                it = lc + lk + 1
                if it > level:
                    continue
                if c == i:
                    continue
                if c not in lev:
                    lev[c] = it
                    if c < i:
                        # fills from U-row k always satisfy c > k, so the
                        # ascending scan stays complete after insertion
                        bisect.insort(lower, c)
                else:
                    if lev[c] < it:
                        lev[c] = it        # reference's max-update rule
            pos += 1
        cols = sorted(lev.keys() | {i})
        out_rows[i] = cols
        up = [c for c in cols if c > i]
        u_cols[i] = up
        u_lev[i] = [lev[c] for c in up]

    counts = np.fromiter((len(r) for r in out_rows), dtype=np.int64, count=n)
    new_ip = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_ip[1:])
    new_idx = np.concatenate([np.asarray(r, dtype=np.int64) for r in out_rows])
    return CSR(new_ip.astype(np.int32), new_idx.astype(np.int32),
               np.zeros(len(new_idx), dtype=A.data.dtype), A.shape)


def _set_values_from(pattern: CSR, A: CSR) -> CSR:
    """Scatter A's values onto the (superset) pattern; fill slots get 0
    (reference lssp_pc_iluk_csr_set_value_by_mat)."""
    n = A.shape[0]
    pip = np.asarray(pattern.indptr).astype(np.int64)
    pidx = np.asarray(pattern.indices).astype(np.int64)
    aip = np.asarray(A.indptr).astype(np.int64)
    aidx = np.asarray(A.indices).astype(np.int64)
    adat = np.asarray(A.data)
    data = np.zeros(len(pidx), dtype=adat.dtype)
    # both CSRs are row-sorted with ascending columns, so the global key
    # row·n + col is strictly increasing in each — ONE searchsorted over
    # the flattened keys replaces the former per-row Python loop (O(n)
    # interpreter iterations at 262k+ rows)
    arows = np.repeat(np.arange(n, dtype=np.int64), np.diff(aip))
    prows = np.repeat(np.arange(n, dtype=np.int64), np.diff(pip))
    loc = np.searchsorted(prows * n + pidx, arows * n + aidx)
    data[loc] = adat
    return CSR(pattern.indptr, pattern.indices, data, pattern.shape)


def ilu0_numeric(M: CSR) -> CSR:
    """IKJ ILU(0) on the fixed sorted pattern of ``M`` (values in place);
    returns the combined factor (L multipliers strictly below, U incl. diag).
    Reference lssp_pc_ilu0_fac, pc-iluk.cxx:347-409."""
    n = M.shape[0]
    ip = np.asarray(M.indptr).astype(np.int64)
    idx = np.asarray(M.indices).astype(np.int64)
    out_dtype = np.asarray(M.data).dtype
    # fp32 inputs (the solve_ir fp32-inner PC build) are factored in fp64
    # and rounded ONCE at the end: strictly more accurate than per-step
    # fp32 rounding, and it keeps the native/Python outputs bit-identical
    # for every input dtype (both compute in fp64).  Without this the
    # float64-only native gate silently fell back to the Python loop —
    # 11.9 s of the 13.1 s cg+ilu0 64³ prepare_ir (round-4 item 3).
    data = np.asarray(M.data).astype(np.float64, copy=True)
    ztol, zval = Defaults.ZERO_DIAG_TOL, Defaults.ZERO_DIAG_VALUE

    if native.available():
        out = native.ilu0(ip, idx, data, ztol, zval)
        return CSR(M.indptr, M.indices, out.astype(out_dtype, copy=False),
                   M.shape)

    invd = np.zeros(n, dtype=data.dtype)
    d0 = data[0] if idx[0] == 0 else 0.0   # row 0 first entry is the diag
    if abs(d0) < ztol:
        d0 = zval if d0 > 0 else -zval
        # (value in the matrix itself stays as stored — reference keeps the
        #  clamp only in the diag[] workspace for row 0)
    invd[0] = 1.0 / d0

    posmap = np.full(n, -1, dtype=np.int64)
    for i in range(1, n):
        s, e = ip[i], ip[i + 1]
        cols_i = idx[s:e]
        posmap[cols_i] = np.arange(s, e)
        kpos = s
        while kpos < e and idx[kpos] < i:
            k = idx[kpos]
            a_ik = data[kpos] * invd[k]
            data[kpos] = a_ik
            ks, ke = ip[k], ip[k + 1]
            tp = posmap[idx[ks:ke]]
            mask = tp > kpos
            if mask.any():
                data[tp[mask]] -= a_ik * data[ks:ke][mask]
            kpos += 1
        posmap[cols_i] = -1
        di = zval
        if kpos < e and idx[kpos] == i:
            if abs(data[kpos]) < ztol:
                data[kpos] = zval          # reference: unsigned clamp here
            di = data[kpos]
        invd[i] = 1.0 / di
    return CSR(M.indptr, M.indices, data.astype(out_dtype, copy=False),
               M.shape)


def iluk_factor(A: CSR, level: int = 1, num_blocks: int = 1):
    """Full ILU(k): zero-diag repair → symbolic (level>0) → numeric → L,U
    split.  ``num_blocks > 1`` factors each uniform diagonal block
    independently (reference lssp_pc_iluk_assemble_matrix, pc-iluk.cxx:411-552
    — the block-Jacobi-ILU path, also what the distributed PC uses per shard).
    Returns (L strict-lower unit CSR, U upper-with-diag CSR)."""
    if num_blocks > 1:
        return _factor_block_diag(A, num_blocks, lambda B: iluk_factor(B, level))
    A = adjust_zero_diag(A, Defaults.ZERO_DIAG_TOL)
    A = sort_columns(A)
    if level <= 0:
        M = CSR(A.indptr, A.indices, np.asarray(A.data).copy(), A.shape)
    else:
        pattern = iluk_symbolic(A, level)
        M = _set_values_from(pattern, A)
    F = ilu0_numeric(M)
    return split_lu(F)


def ilut_factor(A: CSR, tol: float = None, p: int = None, num_blocks: int = 1):
    """Dual-threshold ILUT (reference lssp_pc_ilut_fac, pc-ilut.cxx:51-286).
    Returns (L strict-lower unit CSR, U upper-with-diag CSR)."""
    if num_blocks > 1:
        return _factor_block_diag(A, num_blocks, lambda B: ilut_factor(B, tol, p))
    n = A.shape[0]
    if tol is None or tol < 0:
        tol = Defaults.ILUT_TOL
    if p is None or p <= 0:
        p = (A.nnz + n - 1) // n
    A = adjust_zero_diag(A, Defaults.ZERO_DIAG_TOL)
    A = sort_columns(A)
    ip = np.asarray(A.indptr).astype(np.int64)
    idx = np.asarray(A.indices).astype(np.int64)
    out_dtype = np.asarray(A.data).dtype
    # factor in fp64, round once (same rationale + parity contract as
    # ilu0_numeric): drop decisions and values are identical between the
    # native and Python paths for every input dtype
    dat = np.asarray(A.data).astype(np.float64, copy=False)
    ztol, zval = Defaults.ZERO_DIAG_TOL, Defaults.ZERO_DIAG_VALUE

    if native.available():
        nip, nidx, ndat = native.ilut(ip, idx, dat, n, float(tol), int(p),
                                      ztol, zval)
        F = CSR(nip.astype(np.int32), nidx.astype(np.int32),
                ndat.astype(out_dtype, copy=False), A.shape)
        return split_lu(F)

    out_cols = [None] * n
    out_vals = [None] * n
    # row 0 verbatim
    out_cols[0] = idx[ip[0]:ip[1]].tolist()
    out_vals[0] = dat[ip[0]:ip[1]].tolist()
    diag = np.zeros(n, dtype=dat.dtype)
    d0 = dat[ip[0]] if len(idx) and idx[ip[0]] == 0 else 0.0
    if abs(d0) < ztol:
        d0 = zval if d0 > 0 else -zval
    diag[0] = d0
    # factored strict-upper parts for elimination
    u_cols = [None] * n
    u_vals = [None] * n
    r0 = idx[ip[0]:ip[1]]
    u_mask = r0 > 0
    u_cols[0] = r0[u_mask].tolist()
    u_vals[0] = dat[ip[0]:ip[1]][u_mask].tolist()

    for i in range(1, n):
        s, e = ip[i], ip[i + 1]
        row_cols = idx[s:e]
        row_vals = dat[s:e]
        rel_tol = tol * np.abs(row_vals).mean()

        w = {}              # col -> value (lower + upper, diag separate)
        wdiag = 0.0
        for c, v in zip(row_cols, row_vals):
            if c == i:
                wdiag = v
            else:
                w[int(c)] = v
        lower = sorted(c for c in w if c < i)
        pos = 0
        while pos < len(lower):
            k = lower[pos]
            a_ik = w[k] / diag[k]
            w[k] = a_ik
            for c, ukv in zip(u_cols[k], u_vals[k]):
                mx = -a_ik * ukv
                if c == i:
                    wdiag += mx
                elif c in w:
                    w[c] += mx
                else:
                    if abs(mx) < rel_tol:
                        continue
                    w[c] = mx
                    if c < i:
                        bisect.insort(lower, c)
            pos += 1

        if abs(wdiag) < ztol:
            wdiag = zval if wdiag > 0 else -zval
        diag[i] = wdiag

        lvals = np.array([w[c] for c in lower], dtype=dat.dtype)
        ucols_i = [c for c in w if c > i]
        uvals_i = np.array([w[c] for c in ucols_i], dtype=dat.dtype)
        ucols_i = np.array(ucols_i, dtype=np.int64)

        def keep_top(cols_arr, vals_arr, limit):
            if len(vals_arr) <= limit:
                return cols_arr, vals_arr
            sel = np.argpartition(-np.abs(vals_arr), limit - 1)[:limit]
            return cols_arr[sel], vals_arr[sel]

        lc, lv = keep_top(np.array(lower, dtype=np.int64), lvals, p)
        uc, uv = keep_top(ucols_i, uvals_i, p)
        order_l, order_u = np.argsort(lc), np.argsort(uc)
        cols_row = np.concatenate([lc[order_l], [i], uc[order_u]])
        vals_row = np.concatenate([lv[order_l], [wdiag], uv[order_u]])
        out_cols[i] = cols_row.tolist()
        out_vals[i] = vals_row.tolist()
        um = cols_row > i
        u_cols[i] = cols_row[um].tolist()
        u_vals[i] = vals_row[um].tolist()

    counts = np.fromiter((len(r) for r in out_cols), dtype=np.int64, count=n)
    new_ip = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=new_ip[1:])
    new_idx = np.concatenate([np.asarray(r, dtype=np.int64) for r in out_cols])
    new_dat = np.concatenate([np.asarray(r, dtype=dat.dtype) for r in out_vals])
    F = CSR(new_ip.astype(np.int32), new_idx.astype(np.int32),
            new_dat.astype(out_dtype, copy=False), A.shape)
    return split_lu(F)


def _factor_block_diag(A: CSR, num_blocks: int, factor_fn):
    """Factor each uniform diagonal block independently and reassemble global
    L/U (reference block driver pc-iluk.cxx:411-552)."""
    n = A.shape[0]
    bs = n // num_blocks
    if bs * num_blocks != n:
        raise ValueError(f"n={n} not divisible into {num_blocks} blocks")
    ip = np.asarray(A.indptr).astype(np.int64)
    idx = np.asarray(A.indices).astype(np.int64)
    dat = np.asarray(A.data)
    Ls, Us = [], []
    for b in range(num_blocks):
        lo, hi = b * bs, (b + 1) * bs
        rows = slice(ip[lo], ip[hi])
        keep = (idx[rows] >= lo) & (idx[rows] < hi)
        sub_counts = np.zeros(bs + 1, dtype=np.int64)
        row_of = np.repeat(np.arange(bs), (ip[lo + 1:hi + 1] - ip[lo:hi]))
        kept_rows = row_of[keep]
        np.add.at(sub_counts, kept_rows + 1, 1)
        sub_ip = np.cumsum(sub_counts)
        sub = CSR(sub_ip.astype(np.int32),
                  (idx[rows][keep] - lo).astype(np.int32),
                  dat[rows][keep], (bs, bs))
        Ls_b, Us_b = factor_fn(sub)
        Ls.append(Ls_b)
        Us.append(Us_b)
    return _stack_block_diag(Ls, n), _stack_block_diag(Us, n)


def _stack_block_diag(blocks, n):
    """Assemble block-diagonal CSR from per-block CSR factors."""
    bs = blocks[0].shape[0]
    ips, idxs, dats = [np.zeros(1, dtype=np.int64)], [], []
    off_ptr = 0
    for b, B in enumerate(blocks):
        bip = np.asarray(B.indptr).astype(np.int64)
        ips.append(bip[1:] + off_ptr)
        idxs.append(np.asarray(B.indices).astype(np.int64) + b * bs)
        dats.append(np.asarray(B.data))
        off_ptr += bip[-1]
    return CSR(np.concatenate(ips).astype(np.int32),
               np.concatenate(idxs).astype(np.int32),
               np.concatenate(dats), (n, n))


def ilutp_factor(A: CSR, tol: float = None, p: int = None,
                 permtol: float = 0.1):
    """ILUTP — dual-threshold ILU with column pivoting (Saad; the LIS
    adapter's ``ilutp`` capability, /root/reference/src/solver-lis.cxx:8-41).

    Row-wise ILUT elimination with a column permutation: after eliminating
    row i, if the diagonal candidate is smaller than ``permtol`` times the
    largest upper-part entry, the diagonal column is swapped with that
    entry's column.  Robust on matrices with small/zero diagonals where
    plain ILUT must clamp pivots.

    Returns (L, U, perm): strict-lower L and upper U (both in the pivot
    position space) with L·U ≈ A[:, perm].  The PC apply is
    z[c] = (U⁻¹L⁻¹ r)[iperm[c]] (see lssp_tpu/pc/ilu.py: setup_ilutp).
    """
    from lssp_tpu.config import Defaults

    n = A.shape[0]
    tol = Defaults.ILUT_TOL if tol is None else tol
    ip = np.asarray(A.indptr).astype(np.int64)
    idx = np.asarray(A.indices).astype(np.int64)
    dat = np.asarray(A.data).astype(np.float64)
    if p is None or p <= 0:
        p = max(1, int(np.ceil(A.nnz / max(1, n))))

    perm = np.arange(n, dtype=np.int64)       # position -> original column
    iperm = np.arange(n, dtype=np.int64)      # original column -> position
    Lrows = []                                # [(positions, vals)]
    Udiag = np.zeros(n)
    Urows = []                                # [(orig cols, vals)] strict

    import heapq
    for i in range(n):
        s, e = ip[i], ip[i + 1]
        w = {int(c): float(v) for c, v in zip(idx[s:e], dat[s:e])}
        orig = set(w)                         # original pattern: never
        rnorm = float(np.mean(np.abs(dat[s:e]))) if e > s else 1.0
        droptol = tol * rnorm                 # tolerance-gated (fills only)

        pending = [int(iperm[c]) for c in w if iperm[c] < i]
        heapq.heapify(pending)
        done = set()
        while pending:
            k = heapq.heappop(pending)
            if k in done:
                continue
            done.add(k)
            c_k = int(perm[k])
            if c_k not in w:
                continue
            lik = w[c_k] / Udiag[k]
            if abs(lik) < droptol and c_k not in orig:
                del w[c_k]
                continue
            w[c_k] = lik
            ucols, uvals = Urows[k]
            for c_j, u in zip(ucols, uvals):
                c_j = int(c_j)
                upd = lik * u
                if c_j in w:
                    w[c_j] -= upd
                elif abs(upd) >= droptol:
                    w[c_j] = -upd
                    if iperm[c_j] < i:
                        heapq.heappush(pending, int(iperm[c_j]))

        lpart = [(int(iperm[c]), v) for c, v in w.items() if iperm[c] < i]
        upart = [(int(c), v) for c, v in w.items() if iperm[c] >= i]
        # keep-p largest (diagonal handled after the pivot decision)
        lpart.sort(key=lambda kv: -abs(kv[1]))
        lpart = lpart[:p]

        # pivot: prefer the current diagonal column unless it is permtol-
        # dominated by another upper-part entry
        c_diag = int(perm[i])
        best_c, best_v = c_diag, abs(w.get(c_diag, 0.0))
        for c, v in upart:
            if abs(v) > best_v:
                best_c, best_v = c, abs(v)
        if best_c != c_diag and \
                abs(w.get(c_diag, 0.0)) < permtol * best_v:
            # swap positions of c_diag and best_c
            pi, pj = int(iperm[c_diag]), int(iperm[best_c])
            perm[pi], perm[pj] = perm[pj], perm[pi]
            iperm[c_diag], iperm[best_c] = pj, pi
            c_diag = best_c
        dval = w.pop(c_diag, 0.0)
        if abs(dval) <= Defaults.ZERO_DIAG_TOL:
            dval = Defaults.ZERO_DIAG_VALUE if dval >= 0 \
                else -Defaults.ZERO_DIAG_VALUE
        upart = [(c, v) for c, v in w.items() if iperm[c] > i]
        upart.sort(key=lambda kv: -abs(kv[1]))
        upart = [(c, v) for c, v in upart[:p]
                 if abs(v) >= droptol or c in orig]

        Lrows.append((np.array([k for k, _ in sorted(lpart)], np.int64),
                      np.array([v for _, v in sorted(lpart)])))
        Udiag[i] = dval
        Urows.append((np.array([c for c, _ in upart], np.int64),
                      np.array([v for _, v in upart])))

    def build(rows_list, diag=None, map_cols=False):
        ptr = np.zeros(n + 1, dtype=np.int64)
        cols_all, vals_all = [], []
        for i, (cs, vs) in enumerate(rows_list):
            cs = iperm[cs] if map_cols else cs
            if diag is not None:
                cs = np.concatenate([[i], cs])
                vs = np.concatenate([[diag[i]], vs])
            order = np.argsort(cs, kind="stable")
            cols_all.append(cs[order])
            vals_all.append(vs[order])
            ptr[i + 1] = ptr[i] + len(cs)
        return CSR(ptr,
                   (np.concatenate(cols_all) if cols_all else
                    np.zeros(0, np.int64)).astype(np.int64),
                   np.concatenate(vals_all) if vals_all else np.zeros(0),
                   (n, n))

    L = build(Lrows)
    U = build(Urows, diag=Udiag, map_cols=True)
    return L, U, perm
