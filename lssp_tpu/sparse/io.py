"""MatrixMarket I/O for SuiteSparse test matrices.

The reference has no matrix I/O (its only matrix source is the built-in
Laplacian generator, example/exam.cxx:4-59); SuiteSparse matrices are part of
the BASELINE acceptance configs, so a reader is provided here.  Uses
scipy.io when available, with a pure-python fallback.
"""
from __future__ import annotations

import numpy as np

from lssp_tpu.sparse.types import COO, CSR
from lssp_tpu.sparse.convert import coo_to_csr


def read_matrix_market(path: str) -> CSR:
    try:
        import scipy.io as sio
        m = sio.mmread(path)
        return CSR.from_scipy(m.tocsr())
    except ImportError:
        pass
    rows, cols, vals = [], [], []
    symmetric = False
    shape = None
    if str(path).endswith(".gz"):
        import gzip
        opener = lambda p: gzip.open(p, "rt")
    else:
        opener = open
    with opener(path) as f:
        header = f.readline()
        symmetric = "symmetric" in header
        for line in f:
            if line.startswith("%"):
                continue
            parts = line.split()
            if shape is None:
                shape = (int(parts[0]), int(parts[1]))
                continue
            r, c = int(parts[0]) - 1, int(parts[1]) - 1
            v = float(parts[2]) if len(parts) > 2 else 1.0
            rows.append(r); cols.append(c); vals.append(v)
            if symmetric and r != c:
                rows.append(c); cols.append(r); vals.append(v)
    coo = COO(np.array(rows, np.int32), np.array(cols, np.int32),
              np.array(vals), shape)
    return coo_to_csr(coo)


def write_matrix_market(path: str, A: CSR, comment: str = "") -> None:
    """Write CSR as a MatrixMarket coordinate file; ``.gz`` paths are
    gzip-compressed (SuiteSparse distributes matrices the same way)."""
    ip = np.asarray(A.indptr)
    rows = np.repeat(np.arange(A.shape[0]), ip[1:] - ip[:-1])
    if str(path).endswith(".gz"):
        import gzip
        opener = lambda p: gzip.open(p, "wt")
    else:
        opener = lambda p: open(p, "w")
    with opener(path) as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            f.write(f"% {comment}\n")
        f.write(f"{A.shape[0]} {A.shape[1]} {A.nnz}\n")
        for r, c, v in zip(rows, np.asarray(A.indices), np.asarray(A.data)):
            f.write(f"{r + 1} {c + 1} {v:.17g}\n")
