"""Generate the vendored acceptance matrices in benchmarks/matrices/.

This environment has no network access, so genuine SuiteSparse downloads
are impossible; these are offline stand-ins for the SuiteSparse *classes*
the BASELINE configs name, built with discretizations that are distinct
from the library's own lssp_tpu.sparse.generators (the harness must
exercise the MatrixMarket I/O path with matrices the solver has never seen
as first-class generators):

- ``convdiff_rot_128.mtx.gz`` — nonsymmetric convection–diffusion with a
  *recirculating* (rotating) wind and variable diffusivity on a 128x128
  grid, first-order upwind.  SuiteSparse class: the convection–diffusion
  matrices BASELINE config #3 names.
- ``coupled3d_25.mtx.gz`` — 3-D 7-pt Poisson on 25^3 plus 400 random
  long-range couplings (well-to-well style): RCM cannot fully band it, so
  it lands on the HYB band+remainder execution path.  SuiteSparse class:
  irregular coupled-physics patterns (west0989-like resistance to RCM).

Run:  python benchmarks/gen_vendored.py
"""
import os
import sys

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lssp_tpu.sparse.io import write_matrix_market   # noqa: E402
from lssp_tpu.sparse.types import CSR                # noqa: E402

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "matrices")


def convdiff_rot(N=128):
    """-div(kappa grad u) + w . grad u with rotating wind
    w = (y - 1/2, 1/2 - x) and kappa(x,y) = 1 + 10*x*y; upwind FD."""
    h = 1.0 / (N + 1)
    idx = np.arange(N * N).reshape(N, N)
    xs = (np.arange(N) + 1) * h
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    kap = 1.0 + 10.0 * X * Y
    wx = Y - 0.5
    wy = 0.5 - X

    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r.ravel())
        cols.append(c.ravel())
        vals.append(v.ravel())

    # diffusion: standard 5-pt with harmonic-mean-free simple kappa at the
    # cell centre (kept simple; the point is the matrix class, not the PDE)
    diag = 4.0 * kap / h**2
    # upwind convection adds |w|/h to the diagonal and -|w|/h upstream
    diag = diag + (np.abs(wx) + np.abs(wy)) / h
    add(idx, idx, diag)

    def neighbor(mask, shift_i, shift_j, v):
        ii, jj = np.where(mask)
        add(idx[ii, jj], idx[ii + shift_i, jj + shift_j], v[mask])

    interior_w = np.zeros((N, N), bool); interior_w[1:, :] = True
    interior_e = np.zeros((N, N), bool); interior_e[:-1, :] = True
    interior_s = np.zeros((N, N), bool); interior_s[:, 1:] = True
    interior_n = np.zeros((N, N), bool); interior_n[:, :-1] = True

    neighbor(interior_w, -1, 0, -kap / h**2 - np.maximum(wx, 0) / h)
    neighbor(interior_e, +1, 0, -kap / h**2 + np.minimum(wx, 0) / h)
    neighbor(interior_s, 0, -1, -kap / h**2 - np.maximum(wy, 0) / h)
    neighbor(interior_n, 0, +1, -kap / h**2 + np.minimum(wy, 0) / h)

    A = sp.coo_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(N * N, N * N)).tocsr()
    return CSR.from_scipy(A)


def coupled3d(N=25, n_couple=400, seed=11):
    """3-D 7-pt Poisson plus random symmetric long-range couplings with
    nonsymmetric values — an RCM-resistant general pattern."""
    n = N ** 3
    from lssp_tpu.sparse import laplacian_3d
    S = laplacian_3d(N).to_scipy().tolil()
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n, n_couple)
    b = rng.integers(0, n, n_couple)
    w = rng.uniform(0.05, 0.3, n_couple)
    for i, j, v in zip(a, b, w):
        if i == j:
            continue
        S[i, j] = S[i, j] - v
        S[j, i] = S[j, i] - 0.7 * v         # nonsymmetric coupling
        S[i, i] = S[i, i] + v
        S[j, j] = S[j, j] + 0.7 * v
    return CSR.from_scipy(S.tocsr())


def main():
    os.makedirs(HERE, exist_ok=True)
    A = convdiff_rot(128)
    write_matrix_market(
        os.path.join(HERE, "convdiff_rot_128.mtx.gz"), A,
        comment=("recirculating-wind variable-kappa convection-diffusion, "
                 "128x128 upwind FD (offline stand-in for the SuiteSparse "
                 "convection-diffusion class, BASELINE config #3)"))
    print("convdiff_rot_128:", A.shape, A.nnz)
    B = coupled3d(25)
    write_matrix_market(
        os.path.join(HERE, "coupled3d_25.mtx.gz"), B,
        comment=("3-D Poisson 25^3 + 400 random long-range couplings "
                 "(RCM-resistant general pattern, HYB execution path)"))
    print("coupled3d_25:", B.shape, B.nnz)


if __name__ == "__main__":
    main()
