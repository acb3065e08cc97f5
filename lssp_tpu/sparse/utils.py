"""Host-side CSR structural utilities.

Semantics parity with /root/reference/src/matrix-utils.cxx: column sort
(:387-481), transpose (:700-765), zero-diagonal repair (:483-587), block
diagonal extraction (:589-698).  All numpy, run once at assembly time.
"""
from __future__ import annotations

import numpy as np

from lssp_tpu.sparse.types import CSR


def is_sorted(A: CSR) -> bool:
    """True iff column indices are ascending within every row."""
    ip = np.asarray(A.indptr)
    idx = np.asarray(A.indices)
    if len(idx) == 0:
        return True
    rising = np.ones(len(idx), dtype=bool)
    rising[1:] = idx[1:] > idx[:-1]
    # row starts may go backwards; trailing empty rows make ip[1:-1] hit nnz
    starts = ip[1:-1]
    rising[starts[starts < len(idx)]] = True
    return bool(rising.all())


def sort_columns(A: CSR) -> CSR:
    """Sort column indices within each row (reference lssp_mat_sort_column,
    matrix-utils.cxx:387-481)."""
    if is_sorted(A):
        return A
    ip = np.asarray(A.indptr).astype(np.int64)
    n = A.shape[0]
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    order = np.lexsort((np.asarray(A.indices), rows))
    return CSR(A.indptr, np.asarray(A.indices)[order], np.asarray(A.data)[order], A.shape)


def transpose(A: CSR) -> CSR:
    """CSR transpose via counting sort (reference lssp_mat_transpose,
    matrix-utils.cxx:700-765)."""
    n, m = A.shape
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(A.indices).astype(np.int64)
    order = np.lexsort((rows, cols))
    new_ptr = np.zeros(m + 1, dtype=np.int64)
    np.add.at(new_ptr, cols + 1, 1)
    new_ptr = np.cumsum(new_ptr)
    return CSR(new_ptr.astype(np.int32), rows[order].astype(np.int32),
               np.asarray(A.data)[order], (m, n))


def diagonal(A: CSR) -> np.ndarray:
    """Extract the main diagonal (missing entries → 0)."""
    n = min(A.shape)
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(A.shape[0], dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(A.indices).astype(np.int64)
    d = np.zeros(n, dtype=A.data.dtype)
    hit = rows == cols
    d[rows[hit]] = np.asarray(A.data)[hit]
    return d


def adjust_zero_diag(A: CSR, tol: float = 1e-10) -> CSR:
    """Insert a diagonal entry (value ``tol``) into rows that lack one
    (reference lssp_mat_adjust_zero_diag, matrix-utils.cxx:483-587 — note the
    inserted value is the *tol* argument, `*Ax = 1 * tol` at :564)."""
    n = A.shape[0]
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(A.indices).astype(np.int64)
    has_diag = np.zeros(n, dtype=bool)
    has_diag[rows[rows == cols]] = True
    missing = np.nonzero(~has_diag)[0]
    if len(missing) == 0:
        return A
    add_rows = missing
    all_rows = np.concatenate([rows, add_rows])
    all_cols = np.concatenate([cols, add_rows])
    all_data = np.concatenate([np.asarray(A.data),
                               np.full(len(missing), tol, dtype=A.data.dtype)])
    order = np.lexsort((all_cols, all_rows))
    new_ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(new_ptr, all_rows + 1, 1)
    new_ptr = np.cumsum(new_ptr)
    return CSR(new_ptr.astype(np.int32), all_cols[order].astype(np.int32),
               all_data[order], A.shape)


def block_diag_extract(A: CSR, num_blocks: int) -> CSR:
    """Keep only entries inside the block-diagonal partition of ``num_blocks``
    uniform row blocks; rows whose diagonal block is empty get an identity
    entry (reference lssp_mat_get_block_diag, matrix-utils.cxx:589-698, empty
    rows padded with identity at :680-685)."""
    n = A.shape[0]
    bs = n // num_blocks
    if bs * num_blocks != n:
        raise ValueError(f"n={n} not divisible into {num_blocks} blocks")
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(A.indices).astype(np.int64)
    keep = (rows // bs) == (cols // bs)
    rows, cols = rows[keep], cols[keep]
    dat = np.asarray(A.data)[keep]
    # pad rows that became empty with a unit diagonal
    counts = np.bincount(rows, minlength=n)
    empty = np.nonzero(counts == 0)[0]
    if len(empty):
        rows = np.concatenate([rows, empty])
        cols = np.concatenate([cols, empty])
        dat = np.concatenate([dat, np.ones(len(empty), dtype=dat.dtype)])
    order = np.lexsort((cols, rows))
    new_ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(new_ptr, rows + 1, 1)
    new_ptr = np.cumsum(new_ptr)
    return CSR(new_ptr.astype(np.int32), cols[order].astype(np.int32),
               dat[order], A.shape)


def split_lu(F: CSR):
    """Split a combined LU factor (as produced by ILU numeric phases) into a
    unit-lower L (diagonal of 1 stored implicitly dropped) and upper U
    including the diagonal (reference split at pc-iluk.cxx:501-532: L stores
    unit diag last-in-row, U stores diag first-in-row; we store L strictly
    lower and U with diagonal, same math)."""
    n = F.shape[0]
    ip = np.asarray(F.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(F.indices).astype(np.int64)
    dat = np.asarray(F.data)
    lower = cols < rows
    upper = ~lower
    def build(r, c, v):
        p = np.zeros(n + 1, dtype=np.int64)
        np.add.at(p, r + 1, 1)
        p = np.cumsum(p)
        order = np.lexsort((c, r))
        return CSR(p.astype(np.int32), c[order].astype(np.int32), v[order], F.shape)
    L = build(rows[lower], cols[lower], dat[lower])
    U = build(rows[upper], cols[upper], dat[upper])
    return L, U


def split_ldu(A: CSR):
    """Split into strict lower L, diagonal vector d, strict upper U."""
    n = A.shape[0]
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), ip[1:] - ip[:-1])
    cols = np.asarray(A.indices).astype(np.int64)
    dat = np.asarray(A.data)
    d = np.zeros(n, dtype=dat.dtype)
    on = rows == cols
    d[rows[on]] = dat[on]
    def build(mask):
        r, c, v = rows[mask], cols[mask], dat[mask]
        p = np.zeros(n + 1, dtype=np.int64)
        np.add.at(p, r + 1, 1)
        p = np.cumsum(p)
        order = np.lexsort((c, r))
        return CSR(p.astype(np.int32), c[order].astype(np.int32), v[order], A.shape)
    return build(cols < rows), d, build(cols > rows)
