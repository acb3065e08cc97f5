"""Pallas TPU kernel for DIA (stencil) SpMV — the #1 hot loop (SURVEY §2.2).

Design: 1-D row tiling.  Each grid program
  1. DMAs its x window ``x_pad[i·T : i·T + T + lo + hi]`` HBM→VMEM once
     (halo included, so every diagonal's shifted read hits VMEM),
  2. accumulates ``y_tile = Σ_d data[d, tile] · x_window[off_d + lo : +T]``
     as pure VPU multiply-adds,
  3. writes the y tile.

Memory traffic is exactly the model optimum (ndiag·n values + n x-reads +
n y-writes); measured ~610 GB/s on a v5e chip (~75% of the 819 GB/s HBM
roofline) at fp32 on a 4.2M-row 5-point Poisson — 4.7× the best
XLA-composed formulation.  The kernel is offset-generic: any static
diagonal set with bounded reach works.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lssp_tpu.sparse.types import DIA

_LANE = 128
_DMA_ALIGN = 1024       # Mosaic 1-D memref tiling: DMA slice lengths must be
                        # multiples of this


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_tile(n: int, halo: int, ndiag: int, itemsize: int) -> int:
    """Largest tile T fitting in VMEM.  The pipeline double-buffers the
    (ndiag, T) diagonal block and the (T,) output automatically, and the
    kernel holds one (W≈T+halo,) x window — so the live footprint is about
    (2·ndiag + 3)·T + halo elements; budget at 12 MB of the 16 MB VMEM."""
    budget = 12 * 1024 * 1024 // itemsize
    t = 64 * 1024
    while t > _DMA_ALIGN and (2 * ndiag + 3) * t + 2 * halo > budget:
        t //= 2
    return min(max(t, _DMA_ALIGN), _round_up(n, _DMA_ALIGN))


def _padfree_plan(n, T, lo, hi):
    """Geometry for the pad-free DMA plan, or None when the padded
    fallback must be used.

    The padded path's ``jnp.pad(x, (lo, …))`` copies ALL of x every call
    — 2n of extra HBM traffic, a TPU-measured 27% tax on the 7n-traffic
    5-diagonal kernel (186 µs vs the 145 µs roofline at 4.2M rows).  The
    pad-free plan instead DMAs straight from the caller's x with an
    M-element aligned left margin in the VMEM window:

      window i covers positions [i·T − M, i·T + T + HIA)  (WM elements)
      diag-d read = xw[M + off_d : M + off_d + T]          (STATIC slice)

    Boundary tiles clamp the copy to x's bounds and zero-fill the
    uncovered margin; every contribution whose true position falls
    outside [0, n) multiplies a structurally-zero diagonal slot (the DIA
    converter zeroes out-of-range entries), so a zero x value there is
    exact — the fill only exists so 0·garbage can't produce NaN.
    Constraints (else None → padded fallback): n must be DMA-aligned
    (slice lengths must be _DMA_ALIGN multiples and x has exactly n
    elements), ≥2 tiles, and the halos must fit inside one tile."""
    M = _round_up(lo, _DMA_ALIGN)
    HIA = _round_up(hi, _DMA_ALIGN)
    pad_n = (-n) % T
    nb = (n + pad_n) // T
    if (n % _DMA_ALIGN or nb < 2 or M > T or HIA + pad_n > T):
        return None
    WM = M + T + HIA
    return M, HIA, pad_n, nb, WM


def hyb_tile_rows(n: int, offsets, itemsize: int = 4) -> int:
    """The row-tile size the HYB kernels use — ONE definition shared with
    the converter (csr_to_hyb lays the tile-compact remainder out per
    tile, so its grouping must match the kernel's grid exactly)."""
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    return _pick_tile(n, lo + hi, len(offsets) + 2, itemsize)


@functools.partial(jax.jit, static_argnames=("offsets", "interpret",
                                             "prepadded", "scale"))
def _dia_spmv_pallas(data, x, offsets, interpret=False, prepadded=False,
                     scale=1.0):
    """``prepadded=True``: ``x`` already carries its ``lo`` left and ``hi``
    right halo elements (length n + lo + hi) — the distributed per-shard
    case, where the halos arrive via ppermute exchange instead of zero
    padding.  ``data`` is always (ndiag, n)."""
    n = data.shape[1]
    ndiag = data.shape[0]
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    dtype = jnp.result_type(data.dtype, x.dtype)
    T = _pick_tile(n, lo + hi, ndiag, dtype.itemsize if hasattr(dtype, "itemsize") else 4)

    plan = None if prepadded else _padfree_plan(n, T, lo, hi)
    if plan is not None:
        M, HIA, pad_n, nb, WM = plan
        dp = jnp.pad(data.astype(dtype), ((0, 0), (0, pad_n)))
        xc = x.astype(dtype)

        def kernel(x_hbm, d_ref, y_ref):
            i = pl.program_id(0)

            def inner(xw, sem):
                @pl.when(i == 0)
                def _first():
                    # positions [−M, 0) don't exist: zero margin, then
                    # copy [0, T + HIA) to xw[M:]
                    if M:
                        xw[pl.ds(0, M)] = jnp.zeros((M,), dtype)
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(0, T + HIA)], xw.at[pl.ds(M, T + HIA)],
                        sem)
                    cp.start()
                    cp.wait()

                @pl.when((i > 0) & (i < nb - 1))
                def _interior():
                    # T and M are _DMA_ALIGN multiples; assert it so
                    # Mosaic accepts the dynamic slice start
                    start = pl.multiple_of(i * T - M, _DMA_ALIGN)
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(start, WM)], xw, sem)
                    cp.start()
                    cp.wait()

                @pl.when((i == nb - 1) & (i > 0))
                def _last():
                    # positions [n, n + pad_n + HIA) don't exist: copy
                    # the L in-bounds elements, zero the tail
                    L = T + M - pad_n     # in-bounds window prefix; the
                    # src start n − L equals the tile's virtual start
                    # (nb−1)·T − M, and both are _DMA_ALIGN-aligned
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(n - L, L)], xw.at[pl.ds(0, L)], sem)
                    cp.start()
                    cp.wait()
                    if WM - L:
                        xw[pl.ds(L, WM - L)] = jnp.zeros((WM - L,), dtype)

                acc = d_ref[0, :] * xw[pl.ds(M + offsets[0], T)]
                for d in range(1, ndiag):
                    acc += d_ref[d, :] * xw[pl.ds(M + offsets[d], T)]
                y_ref[:] = acc * scale if scale != 1.0 else acc

            pl.run_scoped(inner, pltpu.VMEM((WM,), dtype),
                          pltpu.SemaphoreType.DMA)

        y = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # x in HBM, DMA'd raw
                pl.BlockSpec((ndiag, T), lambda i: (np.int32(0), i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n + pad_n,), dtype),
            interpret=interpret,
        )(xc, dp)
        return y[:n] if pad_n else y

    pad_n = (-n) % T
    W = _round_up(T + lo + hi, _DMA_ALIGN)   # DMA window, tile-aligned
    # x padded so every tile's [i·T, i·T + W) window stays in bounds
    if prepadded:
        xp = jnp.pad(x.astype(dtype), (0, (W - lo - hi - T) + pad_n))
    else:
        xp = jnp.pad(x.astype(dtype), (lo, (W - lo - T) + pad_n))
    dp = jnp.pad(data.astype(dtype), ((0, 0), (0, pad_n)))
    nb = (n + pad_n) // T

    def kernel(x_hbm, d_ref, y_ref):
        i = pl.program_id(0)

        def inner(xw, sem):
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * T, W)], xw, sem)
            cp.start()
            cp.wait()
            acc = d_ref[0, :] * xw[pl.ds(lo + offsets[0], T)]
            for d in range(1, ndiag):
                acc += d_ref[d, :] * xw[pl.ds(lo + offsets[d], T)]
            # y = alpha*A@x folded into the epilogue (mv_amxy): a separate
            # XLA scale op would re-read and re-write y — +2n of the 7n
            # model traffic, a 22% bandwidth tax on a 5-diagonal stencil
            y_ref[:] = acc * scale if scale != 1.0 else acc

        pl.run_scoped(inner, pltpu.VMEM((W,), dtype), pltpu.SemaphoreType.DMA)

    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # x stays in HBM, DMA'd
            # np.int32(0): under jax_enable_x64 a bare Python 0 traces as
            # int64, which Mosaic cannot return from the index map
            pl.BlockSpec((ndiag, T), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad_n,), dtype),
        interpret=interpret,
    )(xp, dp)
    return y[:n] if pad_n else y


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def _dia_spmv_hyb_pallas(data, x, contrib, lane, offsets, interpret=False):
    """DIA stencil SpMV with the HYB remainder fused as a WINDOW epilogue.

    ``contrib``/``lane`` are (S, ceil(n/128)): slot s of window w holds a
    remainder contribution ``v·x[col]`` (precomputed by XLA via the
    lane-wide gather) targeting lane ``lane[s, w]`` of y's 128-row window
    w.  While the y tile is still in VMEM the kernel adds each slot with a
    one-hot lane select — S·(T/128, 128) VPU compare+selects, zero dynamic
    indexing, zero extra HBM traffic over the plain DIA kernel beyond the
    (S, nwin) slot arrays themselves.  Replaces the XLA scatter-add, which
    serializes per element (TPU-measured 149 µs for 21k updates at 4.2M
    rows — more than the whole 5-diagonal band product)."""
    n = data.shape[1]
    ndiag = data.shape[0]
    S = contrib.shape[0]
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    dtype = jnp.result_type(data.dtype, x.dtype)
    T = _pick_tile(n, lo + hi, ndiag + 2, dtype.itemsize if hasattr(dtype, "itemsize") else 4)

    def epilogue(acc, c_ref, l_ref, TW):
        """Window-slot remainder: one-hot lane select per slot while the
        y tile is still in VMEM (no dynamic indexing, no HBM traffic)."""
        acc2 = acc.reshape(TW, 128)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TW, 128), 1)
        for s in range(S):
            acc2 = acc2 + jnp.where(l_ref[s, :][:, None] == iota,
                                    c_ref[s, :][:, None],
                                    jnp.zeros((), dtype))
        return acc2.reshape(acc.shape[0])

    plan = _padfree_plan(n, T, lo, hi)
    if plan is not None:
        # pad-free margin-window DMA plan (same geometry and boundary
        # handling as _dia_spmv_pallas above): the padded path's
        # jnp.pad(x) copies all of x every call — 2n extra HBM traffic,
        # a TPU-measured ~27% tax on a 5-diagonal band
        M, HIA, pad_n, nb, WM = plan
        dp = jnp.pad(data.astype(dtype), ((0, 0), (0, pad_n)))
        nwin_pad = (n + pad_n) // 128
        cp_ = jnp.pad(contrib.astype(dtype),
                      ((0, 0), (0, nwin_pad - contrib.shape[1])))
        lp_ = jnp.pad(lane.astype(jnp.int32),
                      ((0, 0), (0, nwin_pad - lane.shape[1])))
        TW = T // 128
        xc = x.astype(dtype)

        def kernel(x_hbm, d_ref, c_ref, l_ref, y_ref):
            i = pl.program_id(0)

            def inner(xw, sem):
                @pl.when(i == 0)
                def _first():
                    if M:
                        xw[pl.ds(0, M)] = jnp.zeros((M,), dtype)
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(0, T + HIA)],
                        xw.at[pl.ds(M, T + HIA)], sem)
                    cp.start()
                    cp.wait()

                @pl.when((i > 0) & (i < nb - 1))
                def _interior():
                    start = pl.multiple_of(i * T - M, _DMA_ALIGN)
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(start, WM)], xw, sem)
                    cp.start()
                    cp.wait()

                @pl.when((i == nb - 1) & (i > 0))
                def _last():
                    L = T + M - pad_n
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(n - L, L)], xw.at[pl.ds(0, L)], sem)
                    cp.start()
                    cp.wait()
                    if WM - L:
                        xw[pl.ds(L, WM - L)] = jnp.zeros((WM - L,), dtype)

                acc = d_ref[0, :] * xw[pl.ds(M + offsets[0], T)]
                for d in range(1, ndiag):
                    acc += d_ref[d, :] * xw[pl.ds(M + offsets[d], T)]
                y_ref[:] = epilogue(acc, c_ref, l_ref, TW)

            pl.run_scoped(inner, pltpu.VMEM((WM,), dtype),
                          pltpu.SemaphoreType.DMA)

        y = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((ndiag, T), lambda i: (np.int32(0), i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, TW), lambda i: (np.int32(0), i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((S, TW), lambda i: (np.int32(0), i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n + pad_n,), dtype),
            interpret=interpret,
        )(xc, dp, cp_, lp_)
        return y[:n] if pad_n else y

    pad_n = (-n) % T
    W = _round_up(T + lo + hi, _DMA_ALIGN)
    xp = jnp.pad(x.astype(dtype), (lo, (W - lo - T) + pad_n))
    dp = jnp.pad(data.astype(dtype), ((0, 0), (0, pad_n)))
    nwin_pad = (n + pad_n) // 128
    cp_ = jnp.pad(contrib.astype(dtype),
                  ((0, 0), (0, nwin_pad - contrib.shape[1])))
    lp_ = jnp.pad(lane.astype(jnp.int32),
                  ((0, 0), (0, nwin_pad - lane.shape[1])))
    nb = (n + pad_n) // T
    TW = T // 128

    def kernel(x_hbm, d_ref, c_ref, l_ref, y_ref):
        i = pl.program_id(0)

        def inner(xw, sem):
            cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * T, W)], xw, sem)
            cp.start()
            cp.wait()
            acc = d_ref[0, :] * xw[pl.ds(lo + offsets[0], T)]
            for d in range(1, ndiag):
                acc += d_ref[d, :] * xw[pl.ds(lo + offsets[d], T)]
            y_ref[:] = epilogue(acc, c_ref, l_ref, TW)

        pl.run_scoped(inner, pltpu.VMEM((W,), dtype), pltpu.SemaphoreType.DMA)

    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ndiag, T), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TW), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, TW), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad_n,), dtype),
        interpret=interpret,
    )(xp, dp, cp_, lp_)
    return y[:n] if pad_n else y


@functools.partial(jax.jit, static_argnames=("offsets", "interpret"))
def _dia_spmv_hyb_tc_pallas(data, x, contrib, win, lane, offsets,
                            interpret=False):
    """DIA stencil SpMV with a TILE-COMPACT remainder fused as an MXU
    epilogue.

    ``contrib``/``win``/``lane`` are (nb, TS): slot s of row-tile b holds
    a remainder contribution ``v·x[col]`` (precomputed by XLA via the
    lane-wide gather over the COMPACT slot list — ~3× fewer gather rows
    than the dense per-window layout) targeting window ``win[b, s]`` and
    lane ``lane[b, s]`` of the tile's (TW, 128) y block.  The kernel
    scatters a whole tile's slots with TWO iota-compare one-hots built
    on the fly in VMEM and ONE (TW, TS)×(TS, 128) MXU matmul:

        RtT[w, s] = (win[s] == w);  W[s, :] = contrib[s] · onehot(lane[s])
        acc2 += RtT @ W

    — zero dynamic indexing, no scatter, and the only extra HBM traffic
    is the three (nb, TS) slot arrays.  The dense window layout's cost
    was the XLA-side gather over S·nwin ≈ 3× the entry count (TPU:
    119 µs vs 39 µs compact at 21k strays / 4.2M rows); the per-entry
    scalar ovr path is gone entirely (TS is sized to the max tile).
    Padded slots carry contrib 0 → a zero row of W → no contribution."""
    n = data.shape[1]
    ndiag = data.shape[0]
    TS = contrib.shape[1]
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    dtype = jnp.result_type(data.dtype, x.dtype)
    T = _pick_tile(n, lo + hi, ndiag + 2, dtype.itemsize if hasattr(dtype, "itemsize") else 4)
    TW = T // 128

    def epilogue(acc, c_ref, w_ref, l_ref, i):
        # the (nb, TS) slot arrays ride whole in VMEM (tens of KB, constant
        # index map — no per-step refetch); each tile reads its row i.
        # A (1, TS) blocked spec would violate Mosaic's sublane-divisibility
        # rule, full-array blocks are always legal.
        acc2 = acc.reshape(TW, 128)
        c = c_ref[pl.ds(i, 1), :].reshape(TS)
        wv = w_ref[pl.ds(i, 1), :].reshape(TS)
        lv = l_ref[pl.ds(i, 1), :].reshape(TS)
        lane_oh = (lv[:, None]
                   == jax.lax.broadcasted_iota(jnp.int32, (TS, 128), 1))
        W = jnp.where(lane_oh, c[:, None], jnp.zeros((), dtype))
        rtT = (jax.lax.broadcasted_iota(jnp.int32, (TW, TS), 0)
               == wv[None, :]).astype(dtype)
        # HIGHEST: the MXU's default fp32 path rounds through bf16 passes
        # (measured 5e-6 relative on the scattered entries); the 3-pass
        # exact-fp32 mode costs 3× the MACs of an already-tiny matmul
        upd = jnp.dot(rtT, W, preferred_element_type=dtype,
                      precision=jax.lax.Precision.HIGHEST)
        return (acc2 + upd).reshape(acc.shape[0])

    plan = _padfree_plan(n, T, lo, hi)
    nb_expected = contrib.shape[0]
    if plan is not None:
        M, HIA, pad_n, nb, WM = plan
    else:
        pad_n = (-n) % T
        nb = (n + pad_n) // T
    assert nb == nb_expected, (
        f"tile-compact layout built for {nb_expected} tiles but the "
        f"kernel grid has {nb} — converter/kernel tile formulas diverged")
    dp = jnp.pad(data.astype(dtype), ((0, 0), (0, pad_n)))

    if plan is not None:
        xc = x.astype(dtype)

        def kernel(x_hbm, d_ref, c_ref, w_ref, l_ref, y_ref):
            i = pl.program_id(0)

            def inner(xw, sem):
                @pl.when(i == 0)
                def _first():
                    if M:
                        xw[pl.ds(0, M)] = jnp.zeros((M,), dtype)
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(0, T + HIA)],
                        xw.at[pl.ds(M, T + HIA)], sem)
                    cp.start()
                    cp.wait()

                @pl.when((i > 0) & (i < nb - 1))
                def _interior():
                    start = pl.multiple_of(i * T - M, _DMA_ALIGN)
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(start, WM)], xw, sem)
                    cp.start()
                    cp.wait()

                @pl.when((i == nb - 1) & (i > 0))
                def _last():
                    L = T + M - pad_n
                    cp = pltpu.make_async_copy(
                        x_hbm.at[pl.ds(n - L, L)], xw.at[pl.ds(0, L)], sem)
                    cp.start()
                    cp.wait()
                    if WM - L:
                        xw[pl.ds(L, WM - L)] = jnp.zeros((WM - L,), dtype)

                acc = d_ref[0, :] * xw[pl.ds(M + offsets[0], T)]
                for d in range(1, ndiag):
                    acc += d_ref[d, :] * xw[pl.ds(M + offsets[d], T)]
                y_ref[:] = epilogue(acc, c_ref, w_ref, l_ref, i)

            pl.run_scoped(inner, pltpu.VMEM((WM,), dtype),
                          pltpu.SemaphoreType.DMA)

        xarg = xc
    else:
        W_ = _round_up(T + lo + hi, _DMA_ALIGN)
        xarg = jnp.pad(x.astype(dtype), (lo, (W_ - lo - T) + pad_n))

        def kernel(x_hbm, d_ref, c_ref, w_ref, l_ref, y_ref):
            i = pl.program_id(0)

            def inner(xw, sem):
                cp = pltpu.make_async_copy(x_hbm.at[pl.ds(i * T, W_)], xw,
                                           sem)
                cp.start()
                cp.wait()
                acc = d_ref[0, :] * xw[pl.ds(lo + offsets[0], T)]
                for d in range(1, ndiag):
                    acc += d_ref[d, :] * xw[pl.ds(lo + offsets[d], T)]
                y_ref[:] = epilogue(acc, c_ref, w_ref, l_ref, i)

            pl.run_scoped(inner, pltpu.VMEM((W_,), dtype),
                          pltpu.SemaphoreType.DMA)

    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ndiag, T), lambda i: (np.int32(0), i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, TS), lambda i: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, TS), lambda i: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, TS), lambda i: (np.int32(0), np.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad_n,), dtype),
        interpret=interpret,
    )(xarg, dp, contrib.astype(dtype), win.astype(jnp.int32),
      lane.astype(jnp.int32))
    return y[:n] if pad_n else y


@functools.lru_cache(maxsize=None)
def _vmap_safe_hyb_tc_kernel(offsets, tile_rows, interpret):
    """vmap-safe wrapper for the tile-compact HYB kernel.  Batched calls
    (solve_multi over stacked rhs) run the XLA shifted-stream band SpMM
    plus a per-batch scatter-add at STATIC flat positions — correct for
    any rhs batching; stacked matrices with per-matrix slot layouts are
    rejected (same contract as the dense-window rule)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(data, x, contrib, win, lane):
        return _dia_spmv_hyb_tc_pallas(data, x, contrib, win, lane,
                                       offsets, interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, data, x, contrib, win, lane):
        data_b, x_b, c_b, w_b, l_b = in_batched
        if w_b or l_b:
            raise NotImplementedError(
                "vmap over stacked tile-compact HYB matrices is "
                "unsupported; vmap over x only")
        lo = max(0, -min(offsets)) if offsets else 0
        n = data.shape[-1]
        dtype = jnp.result_type(data.dtype, x.dtype)
        hi = max(0, max(offsets)) if offsets else 0
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, hi)])
        y = jnp.zeros(x.shape[:-1] + (n,), dtype=dtype)
        for d, off in enumerate(offsets):
            sl = jax.lax.slice_in_dim(xp, lo + off, lo + off + n, axis=-1)
            dd = data[..., d, :] if data_b else data[d]
            y = y + dd * sl
        if y.ndim == 1:
            y = jnp.broadcast_to(y, (axis_size, n))
        # flat target rows are STATIC data: tile*T + win*128 + lane.
        # Padded slots target row 0 with contribution 0.
        nb, TS = win.shape
        tiles = jnp.arange(nb, dtype=jnp.int32)[:, None]
        rows_flat = (tiles * tile_rows + win * 128 + lane).reshape(-1)
        cb = contrib if c_b else jnp.broadcast_to(
            contrib, (axis_size,) + contrib.shape)
        y = y.at[:, rows_flat].add(cb.reshape(axis_size, -1).astype(dtype))
        return y, True

    return f


def dia_spmv_hyb_tc_pallas(A, x, contrib, interpret: bool = False):
    """y = A.dia @ x + tile-compact scatter(contrib) via the fused MXU
    epilogue kernel; ``contrib`` is the (nb, TS) slot-contribution array
    (tc_vals · gathered x)."""
    return _vmap_safe_hyb_tc_kernel(A.dia.offsets, A.tile_rows,
                                    bool(interpret))(
        A.dia.data, x, contrib, A.tc_win, A.tc_lane)


@functools.lru_cache(maxsize=None)
def _vmap_safe_hyb_kernel(offsets, interpret):
    """vmap-safe wrapper for the HYB window kernel (same reason as
    _vmap_safe_kernel).  The batched rule runs the XLA shifted-stream DIA
    SpMM plus a one-hot einsum for the window slots — correct for any
    batching pattern; the unbatched call takes the fused Pallas path."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(data, x, contrib, lane):
        return _dia_spmv_hyb_pallas(data, x, contrib, lane, offsets,
                                    interpret=interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, data, x, contrib, lane):
        data_b, x_b, c_b, lane_b = in_batched
        lo = max(0, -min(offsets)) if offsets else 0
        hi = max(0, max(offsets)) if offsets else 0
        n = data.shape[-1]
        dtype = jnp.result_type(data.dtype, x.dtype)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, hi)])
        y = jnp.zeros(x.shape[:-1] + (n,), dtype=dtype)
        for d, off in enumerate(offsets):
            sl = jax.lax.slice_in_dim(xp, lo + off, lo + off + n, axis=-1)
            dd = data[..., d, :] if data_b else data[d]
            y = y + dd * sl
        if lane_b:
            # the slot layout is part of the matrix STRUCTURE: a batched
            # lane would mean stacked HYB matrices with different
            # remainder layouts, which this dense-window rule cannot
            # express (the band part batches fine via data_b; the
            # remainder would silently scatter with matrix 0's layout —
            # advisor r3).  No caller batches over matrices today.
            raise NotImplementedError(
                "vmap over stacked HYB matrices with per-matrix remainder "
                "layouts is unsupported; vmap over x only")
        S, nwin = lane.shape
        oh = (lane[:, :, None]
              == jnp.arange(128, dtype=lane.dtype)[None, None, :])
        cb = contrib if c_b else jnp.broadcast_to(
            contrib, (axis_size,) + contrib.shape)
        upd = jnp.einsum("ksw,swl->kwl", cb.astype(dtype), oh.astype(dtype))
        y2 = (y if y.ndim == 2
              else jnp.broadcast_to(y, (axis_size, n)))
        y2 = y2 + upd.reshape(axis_size, -1)[:, :n]
        return y2, True

    return f


def dia_spmv_hyb_pallas(A, x, contrib, interpret: bool = False):
    """y = A.dia @ x + window-scatter(contrib) via the fused kernel.
    ``contrib`` is the (S, nwin) slot-contribution array (win_vals ·
    gathered x); the caller handles the ovr_* overflow triplets."""
    return _vmap_safe_hyb_kernel(A.dia.offsets, bool(interpret))(
        A.dia.data, x, contrib, A.win_lane)


@functools.lru_cache(maxsize=None)
def _vmap_safe_kernel(offsets, interpret, scale):
    """The Pallas call wrapped with a custom vmap rule: Mosaic's automatic
    batching rejects the ANY-memspace x operand, and per-lane kernel calls
    would re-stream the matrix anyway.  Batched invocations (solve_multi)
    instead run an XLA shifted-stream SpMM that reads the diagonal data
    ONCE and broadcasts it against the (k, n) rhs block — the many-rhs
    amortization this batching exists for."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(data, x):
        return _dia_spmv_pallas(data, x, offsets, interpret=interpret,
                                scale=scale)

    @f.def_vmap
    def _rule(axis_size, in_batched, data, x):
        data_b, x_b = in_batched
        lo = max(0, -min(offsets)) if offsets else 0
        hi = max(0, max(offsets)) if offsets else 0
        n = data.shape[-1]
        dtype = jnp.result_type(data.dtype, x.dtype)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, hi)])
        y = jnp.zeros(x.shape, dtype=dtype)
        for d, off in enumerate(offsets):
            sl = jax.lax.slice_in_dim(xp, lo + off, lo + off + n, axis=-1)
            dd = data[..., d, :] if data_b else data[d]
            y = y + dd * sl
        # data-batched with shared x (or empty offsets): y may still carry
        # no batch axis — broadcast so out_batched=True stays truthful
        if y.ndim == 1:
            y = jnp.broadcast_to(y, (axis_size, n))
        return (y * scale if scale != 1.0 else y), True

    return f


def dia_spmv_pallas(A: DIA, x, interpret: bool = False,
                    scale: float = 1.0):
    """y = scale·A@x via the Pallas stencil kernel (scale folded into the
    epilogue — zero extra HBM traffic).  vmap-safe: batched calls run the
    amortized XLA SpMM rule instead (see _vmap_safe_kernel)."""
    return _vmap_safe_kernel(A.offsets, bool(interpret),
                             float(scale))(A.data, x)


@functools.lru_cache(maxsize=None)
def _vmap_safe_ext_kernel(offsets, interpret):
    """vmap-safe wrapper for the prepadded per-shard kernel — same reason
    and same batched lowering as _vmap_safe_kernel (dist_solve_multi vmaps
    the whole shard-local iteration over rhs columns)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(data, x_ext):
        return _dia_spmv_pallas(data, x_ext, offsets, interpret=interpret,
                                prepadded=True)

    @f.def_vmap
    def _rule(axis_size, in_batched, data, x_ext):
        data_b, x_b = in_batched
        lo = max(0, -min(offsets)) if offsets else 0
        n = data.shape[-1]
        dtype = jnp.result_type(data.dtype, x_ext.dtype)
        y = jnp.zeros(x_ext.shape[:-1] + (n,), dtype=dtype)
        for d, off in enumerate(offsets):
            sl = jax.lax.slice_in_dim(x_ext, lo + off, lo + off + n,
                                      axis=-1)
            dd = data[..., d, :] if data_b else data[d]
            y = y + dd * sl
        if y.ndim == 1:
            y = jnp.broadcast_to(y, (axis_size, n))
        return y, True

    return f


def dia_spmv_pallas_ext(data, x_ext, offsets, interpret: bool = False):
    """Per-shard distributed DIA SpMV: ``x_ext = [halo_lo | x | halo_hi]``
    (length n + lo + hi, halos filled by the ICI exchange); returns the (n,)
    local product.  Same kernel, same roofline bandwidth; vmap-safe
    (batched calls run the amortized XLA rule)."""
    return _vmap_safe_ext_kernel(offsets, bool(interpret))(data, x_ext)
