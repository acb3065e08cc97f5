"""Bandwidth-reducing reordering (RCM) for the TPU execution path.

TPU has no hardware gather: XLA's gather-based SpMV runs at a flat
~16 Mrow/s regardless of size (measured on v5e), while diagonal-streaming
DIA SpMV runs at ~600 GB/s.  For unstructured matrices the winning move is
a reverse-Cuthill–McKee symmetric permutation to crush the bandwidth, then
DIA storage even at considerable zero-fill — streaming ndiag·n values beats
element gathers by orders of magnitude up to hundreds of diagonals.

The facade applies this transparently: the system P·A·Pᵀ (P·x) = P·b is
solved and x is permuted back.  ILU quality typically improves under RCM.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from lssp_tpu.sparse.types import CSR


def rcm_permutation(A: CSR) -> np.ndarray:
    """Reverse-Cuthill–McKee ordering (symmetrized graph)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    S = A.to_scipy()
    perm = reverse_cuthill_mckee(((S + S.T) != 0).tocsr(), symmetric_mode=True)
    return np.asarray(perm, dtype=np.int64)


def permute_symmetric(A: CSR, perm: np.ndarray) -> CSR:
    """B = P A Pᵀ with B[i, j] = A[perm[i], perm[j]]."""
    n = A.shape[0]
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    S = A.to_scipy().tocoo()
    import scipy.sparse as sp
    B = sp.coo_matrix((S.data, (inv[S.row], inv[S.col])), shape=A.shape)
    return CSR.from_scipy(B.tocsr())


def bandwidth(A: CSR) -> int:
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(A.shape[0], dtype=np.int64), ip[1:] - ip[:-1])
    if len(rows) == 0:
        return 0
    return int(np.abs(np.asarray(A.indices).astype(np.int64) - rows).max())


def num_diagonals(A: CSR) -> int:
    ip = np.asarray(A.indptr).astype(np.int64)
    rows = np.repeat(np.arange(A.shape[0], dtype=np.int64), ip[1:] - ip[:-1])
    return len(np.unique(np.asarray(A.indices).astype(np.int64) - rows))


def band_coverage(A: CSR, max_diags: int = 256,
                  min_occ: float = 0.02) -> float:
    """Fraction of nnz a HYB split would stream — delegates to the single
    shared band-selection rule (sparse/convert.py: _select_band) so the
    RCM acceptance criterion and the actual csr_to_hyb split cannot
    diverge."""
    from lssp_tpu.sparse.convert import band_occupancy
    return band_occupancy(A, max_diags=max_diags, min_occ=min_occ)


def maybe_rcm(A: CSR, max_diags: int = 256,
              dia_fill: float = 50.0) -> Tuple[CSR, Optional[np.ndarray]]:
    """Return (possibly reordered A, perm or None).

    Reorders when A is not already DIA-friendly but becomes so under RCM
    (diagonal count within ``max_diags`` and zero-fill within ``dia_fill``×
    nnz — generous because streaming zeros beats gathering), or — the HYB
    criterion — when RCM materially concentrates the nnz onto a streamable
    band (coverage ≥ 0.5 and clearly better than the original ordering).
    """
    n = A.shape[0]
    nd = num_diagonals(A)
    if nd <= max_diags and nd * n <= dia_fill * max(A.nnz, 1):
        return A, None
    perm = rcm_permutation(A)
    B = permute_symmetric(A, perm)
    ndb = num_diagonals(B)
    if ndb < nd and ndb <= max_diags and ndb * n <= dia_fill * max(A.nnz, 1):
        return B, perm
    cov_a = band_coverage(A, max_diags=max_diags)
    cov_b = band_coverage(B, max_diags=max_diags)
    if cov_b >= 0.5 and cov_b > cov_a + 0.05:
        return B, perm
    return A, None
