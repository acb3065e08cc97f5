"""Hierarchical strength aggregation ordering — TPU-fast AMG for matrices
the grid detector cannot handle.

The structured-SA machinery (amg/sa.py) needs aggregates that are
CONTIGUOUS index ranges so prolongation is a reshape (TPU has no hardware
gather).  For grid operators the facade's ordering already delivers that;
for genuinely unstructured sparsity the flat path falls back to *blind*
ranges, which may group weakly-coupled rows.

This module closes the gap the aggregate-then-renumber way: build the FULL
aggregation hierarchy on the host (greedy strength-graph aggregation with
exact size ``g`` per level, recursing on Galerkin coarse graphs), then
order the fine rows lexicographically by their aggregate chain (coarsest
id first).  In that ordering every level's true strength-based aggregates
are exactly the contiguous g-ranges the reshape machinery uses — the
quality of algebraic aggregation with zero device gathers, at every level.
The permutation is applied ONCE at setup by the facade (host side), like
RCM.

Capability match: AMG on any CSR (/root/reference/src/pc-amg.cxx:21-134,
/root/reference/src/solver-amg.cxx:64-130 — the reference gets this from
FASP); the realization is TPU-first, no structural analog in the reference.
"""
from __future__ import annotations

import numpy as np

__all__ = ["hierarchy_perm", "greedy_aggregate_exact"]


def _sym_strength(A, theta: float):
    """Symmetrized relative-strength graph: keep |a_ij| >= theta *
    sqrt(|a_ii a_jj|) (the same rule as sa.py's filters), OR its
    transpose — aggregation wants undirected connectivity."""
    import scipy.sparse as sp
    A = A.tocsr()
    n = A.shape[0]
    d = np.abs(A.diagonal())
    d[d == 0] = 1.0
    rows = np.repeat(np.arange(n), np.diff(A.indptr))
    cols = A.indices
    keep = (np.abs(A.data) >= theta * np.sqrt(d[rows] * d[cols])) \
        & (rows != cols)
    S = sp.csr_matrix((np.ones(int(keep.sum()), np.int8),
                       (rows[keep], cols[keep])), shape=A.shape)
    S = ((S + S.T) != 0).tocsr()
    return S


def _bfs_ids(S, g: int, virt) -> np.ndarray:
    """Raw greedy strength-BFS ids (short aggregates left short, virtuals
    left -1) — Python oracle for native/src/aggregate.cpp."""
    n = S.shape[0]
    indptr, indices = S.indptr, S.indices
    ids = np.full(n, -1, dtype=np.int64)
    nxt = 0
    for v in range(n):
        if ids[v] >= 0 or virt[v]:
            continue
        members = [v]
        ids[v] = nxt
        frontier = [v]
        while len(members) < g and frontier:
            new = []
            for u in frontier:
                for w in indices[indptr[u]:indptr[u + 1]]:
                    if ids[w] < 0 and not virt[w]:
                        ids[w] = nxt
                        members.append(w)
                        new.append(w)
                        if len(members) >= g:
                            break
                if len(members) >= g:
                    break
            frontier = new
        nxt += 1
    return ids


def _fixup_exact(ids: np.ndarray, g: int, virt) -> np.ndarray:
    """Exactness fix-up shared by the Python and native BFS paths: pull the
    members of undersized aggregates plus all virtual vertices and re-chunk
    them in (id, index) order — real leftovers first, virtuals last, so at
    most one mixed group sits at the real/virtual boundary and every later
    group is pure virtual (the alignment invariant with sa_setup's
    end-of-vector padding)."""
    nxt = int(ids.max()) + 1 if (ids >= 0).any() else 0
    sizes = np.bincount(ids[ids >= 0], minlength=max(nxt, 1))
    short = sizes < g
    keep_ids = np.where(~short)[0] if nxt else np.empty(0, np.int64)
    remap = np.full(max(nxt, 1), -1, dtype=np.int64)
    remap[keep_ids] = np.arange(len(keep_ids))
    out = np.where(ids >= 0, remap[np.maximum(ids, 0)], -1)
    order = np.argsort(ids, kind="stable")       # -1 (virt) sorts first
    loose_real = order[(ids[order] >= 0) & short[np.maximum(ids[order], 0)]]
    loose = np.concatenate([loose_real, np.where(virt)[0]])
    k = len(keep_ids)
    out[loose] = k + np.arange(len(loose)) // g
    return out


def greedy_aggregate_exact(S, g: int, virt=None) -> np.ndarray:
    """Aggregate the (symmetric, boolean, no-diagonal) graph S into groups
    of EXACTLY ``g`` vertices: greedy BFS over strength edges in natural
    vertex order (post-RCM that is a locality order), then leftover
    members of short aggregates are re-chunked in id order.  Requires
    n % g == 0.  Returns ids (n,).

    ``virt`` (bool mask): vertices carrying virtual padding mass are kept
    OUT of real aggregates and chunked LAST (one mixed boundary group at
    most, then pure-virtual groups) — the hierarchy ordering's alignment
    with sa_setup's end-of-vector padding depends on this invariant at
    every level."""
    n = S.shape[0]
    assert n % g == 0, (n, g)
    if virt is None:
        virt = np.zeros(n, dtype=bool)
    return _fixup_exact(_bfs_ids(S, g, virt), g, virt)


def hierarchy_perm(A, g: int = 4, coarse_size: int = 256,
                   max_levels: int = 12, theta: float = 0.08) -> np.ndarray:
    """Permutation (n,) ordering A's rows so that the greedy strength
    aggregates of every hierarchy level are contiguous g-ranges.

    The planned padded size (the P=1 fixed point of dist_sa's plan) keeps
    every level's size divisible by g; virtual padding vertices are
    isolated, processed last by the greedy pass, and dropped from the
    returned permutation — they occupy exactly the trailing slots that
    sa_setup's flat pre-padding appends.

    Host cost: O(nnz) python BFS per level — fine for the unstructured
    midsize matrices this path serves (15k rows ≈ 60 ms); large banded or
    grid matrices never reach it (the grid/band paths win those).
    """
    import scipy.sparse as sp
    from lssp_tpu.parallel.dist_sa import planned_padded_size

    n = A.shape[0]
    n_pad = planned_padded_size(n, 1, g, coarse_size, max_levels)
    if hasattr(A, "to_scipy"):              # lssp CSR container
        A = A.to_scipy()
    Al = A.tocsr().astype(np.float64)
    if n_pad != n:
        Al = sp.bmat([[Al, None],
                      [None, sp.eye(n_pad - n, format="csr")]],
                     format="csr")
    from lssp_tpu import native
    use_native = native.available()
    virt = np.zeros(n_pad, dtype=bool)
    virt[n:] = True
    keys = []          # per level: fine-vertex -> level aggregate id
    cur = np.arange(n_pad)
    levels = 0
    while Al.shape[0] > coarse_size and levels < max_levels:
        if use_native:
            # C++ merge-walks A and A^T rows, evaluating the strength
            # predicate on the fly — identical ids to the Python oracle
            # without materialising the symmetrised graph (the measured
            # bottleneck: 16 of 23 s at 1M rows was the scipy build)
            raw = native.greedy_aggregate(Al, Al.T.tocsr(), g, theta, virt)
            ids = _fixup_exact(raw, g, virt)
        else:
            ids = greedy_aggregate_exact(_sym_strength(Al, theta), g, virt)
        keys.append(ids[cur])
        cur = ids[cur]
        P0 = sp.csr_matrix((np.ones(Al.shape[0]), ids,
                            np.arange(Al.shape[0] + 1)),
                           shape=(Al.shape[0], Al.shape[0] // g))
        Al = (P0.T @ Al @ P0).tocsr()
        # a coarse vertex is virtual iff its whole fine group was virtual
        # (the at-most-one mixed boundary group counts as real; its
        # identity mass just rides along) — the invariant that keeps
        # virtuals in the trailing slots of every level
        sizes = np.bincount(ids, minlength=Al.shape[0])
        virt = np.bincount(ids, weights=virt.astype(np.float64),
                           minlength=Al.shape[0]) >= np.maximum(sizes, 1)
        levels += 1
    if not keys:
        return np.arange(n, dtype=np.int64)
    # lexicographic: coarsest id is the primary key (np.lexsort uses the
    # LAST key as primary), natural index breaks ties
    order = np.lexsort(tuple([np.arange(n_pad)] + keys))
    return order[order < n].astype(np.int64) if n_pad != n \
        else order.astype(np.int64)
