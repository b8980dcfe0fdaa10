"""Pallas TPU kernels for DIA SpMV — the roofline SpMV path.

Two kernels, selected automatically by :func:`dia_spmv_pallas`:

* **Blocked-halo kernel** (square, 1024-aligned shapes): every operand is an
  auto-pipelined VMEM ``BlockSpec``; the shifted x-windows for each diagonal
  are assembled *in registers* from the current block and its neighbours
  (the x operand is passed 2K+1 times with offset index maps), so there is
  no padding, no HBM staging copy, and no per-call repacking of x.  Because
  XLA promotes the loop-carried x and the loop-invariant diagonal data into
  VMEM when they fit (v5e: 128 MiB), iterative SpMV chains on problems up to
  ~100 MB run at VMEM bandwidth — measured ~1 TB/s effective on a 4.2M-dof
  2D Poisson operator, well above the 655 GB/s HBM-roofline target
  (BASELINE.md).  A flat shift by ``off`` decomposes into a row shift
  ``q = off // 128`` (concat of row-slices from adjacent blocks) plus a lane
  shift ``r = off % 128`` (concat of two lane-slices) — no gathers, no
  cross-lane permute ops.

* **Streaming kernel** (anything else: rectangular, unaligned, or very large
  offsets): x stays in HBM and one halo-extended window per output tile is
  DMA'd HBM->VMEM with double-buffered prefetch; shifts via ``pltpu.roll``.

Out-of-range halo reads in the blocked kernel are *clamped* to valid
neighbour blocks; correctness holds because DIA stores structural zeros at
out-of-matrix diagonal positions, so the garbage lanes are multiplied by 0.

Replaces the reference's serial column-loop SpMV (reference:
sparse-linear/src/Data/Matrix/Sparse.hs:433-471 ``axpy_``/``mulV``) with a
TPU-native vector-unit formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv_pallas", "dia_spmv_chain"]

_LANES = 128
# int32 constant for BlockSpec index maps: Python int literals trace as
# int64 under x64 and Mosaic has no 64-bit lowering
_I0 = np.int32(0)


# ---------------------------------------------------------------------------
# Blocked-halo kernel (fast path)
# ---------------------------------------------------------------------------


def _pick_tile_rows(rows_n: int, ndiag: int) -> int:
    """Largest power-of-two tile (rows) dividing rows_n with a bounded VMEM
    footprint for the double-buffered data block."""
    tile = 4096
    # keep (ndiag + 4 x/y blocks) * tile * 512 B * 2 buffers within the
    # 16 MiB scoped-VMEM budget (leave headroom for spills)
    while tile > 8 and (ndiag + 4) * tile * _LANES * 4 * 2 > 14 * 2**20:
        tile //= 2
    while tile > 8 and rows_n % tile:
        tile //= 2
    return tile


def _blocked_kernel(offsets, tile, k_halo, alpha, *refs):
    xs = refs[: 2 * k_halo + 1]  # x blocks t-K .. t+K
    d_ref = refs[2 * k_halo + 1]
    o_ref = refs[2 * k_halo + 2]

    def rows_at(q):
        """(tile, 128) slab of x rows shifted by q rows from block start."""
        # global row range [t*tile + q, t*tile + q + tile) lives in the
        # concatenated window xs[0]..xs[2K]; local offset = K*tile + q.
        lo = k_halo * tile + q
        b0, r0 = divmod(lo, tile)
        if r0 == 0:
            return xs[b0][:, :]
        return jnp.concatenate(
            [xs[b0][pl.ds(r0, tile - r0), :], xs[b0 + 1][pl.ds(0, r0), :]], 0
        )

    acc = None
    for d, off in enumerate(offsets):
        q, r = divmod(off, _LANES)
        if r == 0:
            sh = rows_at(q)
        else:
            # sh[i, l] = x[(i+q)*128 + l + r]: lanes r: from row q, lanes
            # :r of row q+1 — two lane-slices, one concat, no permutes.
            sh = jnp.concatenate(
                [rows_at(q)[:, r:], rows_at(q + 1)[:, :r]], 1
            )
        term = d_ref[d] * sh
        acc = term if acc is None else acc + term
    o_ref[:, :] = acc if alpha is None else acc * alpha


def _dia_spmv_blocked(dia, x, alpha, tile_rows=None):
    nr, _ = dia.shape
    keep_2d = x.ndim == 2
    offsets, data = _sorted_diags(dia)
    rows_n = nr // _LANES
    ndiag = len(offsets)
    tile = tile_rows or _pick_tile_rows(rows_n, ndiag)
    nt = rows_n // tile

    # halo depth: blocks needed on each side
    max_q = max(abs(o // _LANES) + 1 for o in offsets)
    k_halo = -(-max_q // tile)  # ceil

    data3 = data.reshape(ndiag, rows_n, _LANES)
    x2 = x.reshape(rows_n, _LANES)

    def x_spec(dk):
        return pl.BlockSpec(
            (tile, _LANES),
            # int32-only arithmetic: jnp.clip promotes through int64 under
            # x64, and Mosaic's 64-bit convert_element_type lowering rule
            # recurses on itself
            lambda i, dk=dk: (
                jnp.minimum(jnp.maximum(i + dk, _I0), np.int32(nt - 1)),
                _I0,
            ),
        )

    in_specs = [x_spec(dk) for dk in range(-k_halo, k_halo + 1)]
    in_specs.append(
        pl.BlockSpec((ndiag, tile, _LANES), lambda i: (_I0, i, _I0))
    )
    out = pl.pallas_call(
        functools.partial(_blocked_kernel, offsets, tile, k_halo, alpha),
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, _LANES), lambda i: (i, _I0)),
        out_shape=jax.ShapeDtypeStruct(
            (rows_n, _LANES), jnp.result_type(data.dtype, x.dtype)
        ),
    )(*([x2] * (2 * k_halo + 1)), data3)
    return out if keep_2d else out.reshape(nr)


# ---------------------------------------------------------------------------
# Streaming kernel (general fallback)
# ---------------------------------------------------------------------------


def _shifted(window, q, r, rows):
    """rows x 128 view of the window flat-shifted by q*128 + r elements."""
    if r == 0:
        return window[pl.ds(q, rows), :]
    # roll requires non-negative shift; -r == 128 - r circularly
    a = pltpu.roll(window[pl.ds(q, rows), :], _LANES - r, 1)
    b = pltpu.roll(window[pl.ds(q + 1, rows), :], _LANES - r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    return jnp.where(lane < _LANES - r, a, b)


def _stream_kernel(offsets, rows, wrows, base_row, alpha, x_hbm, data_ref,
                   out_ref, w0, w1, s0, s1):
    i = pl.program_id(0)
    n_prog = pl.num_programs(0)
    slot0 = jax.lax.rem(i, jnp.asarray(2, i.dtype)) == 0

    def copy(step, buf, sem):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(step * rows + base_row, wrows), :], buf, sem
        )

    @pl.when(i == 0)
    def _():
        copy(0, w0, s0).start()

    @pl.when((i + 1 < n_prog) & slot0)
    def _():
        copy(i + 1, w1, s1).start()

    @pl.when((i + 1 < n_prog) & jnp.logical_not(slot0))
    def _():
        copy(i + 1, w0, s0).start()

    def accumulate(window):
        acc = jnp.zeros((rows, _LANES), out_ref.dtype)
        for d, off in enumerate(offsets):
            s = off - offsets[0]  # static relative shift >= 0
            acc = acc + data_ref[d] * _shifted(window, s // _LANES,
                                               s % _LANES, rows)
        out_ref[:, :] = acc if alpha is None else acc * alpha

    @pl.when(slot0)
    def _():
        copy(i, w0, s0).wait()
        accumulate(w0)

    @pl.when(jnp.logical_not(slot0))
    def _():
        copy(i, w1, s1).wait()
        accumulate(w1)


def _dia_spmv_streamed(dia, x, tile, alpha):
    nr, nc = dia.shape
    if tile % 1024:
        raise ValueError("tile must be a multiple of 1024")
    offsets, data = _sorted_diags(dia)
    min_off, max_off = offsets[0], offsets[-1]
    win = max_off - min_off

    nr_pad = ((nr + tile - 1) // tile) * tile
    data_p = jnp.pad(data, ((0, 0), (0, nr_pad - nr)))
    ndiag = len(offsets)
    data2 = data_p.reshape(ndiag, nr_pad // _LANES, _LANES)

    # x[i + off] = xp[i + off + lo]; tile i0 reads flat window starting at
    # i0 + base with base = min_off + lo, aligned to 1024 (8 sublanes).
    lo = max(0, -min_off)
    base = min_off + lo
    delta = (-base) % 1024
    lo += delta
    base += delta
    # window rows: tile rows + halo rows (+1 for the lane-rotation read of
    # row q+1), rounded to the 8-sublane tiling
    rows = tile // _LANES
    wrows_raw = rows + win // _LANES + 2
    wrows = ((wrows_raw + 7) // 8) * 8
    need_flat = (nr_pad - tile) + base + wrows * _LANES
    hi = max(0, need_flat - (nc + lo))
    xp = jnp.pad(x, (lo, hi))
    xp2 = xp.reshape(-1, _LANES)

    grid = (nr_pad // tile,)
    out = pl.pallas_call(
        functools.partial(_stream_kernel, offsets, rows, wrows,
                          base // _LANES, alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (ndiag, rows, _LANES),
                lambda i: (_I0, i, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (i, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nr_pad // _LANES, _LANES), jnp.result_type(data.dtype, x.dtype)
        ),
        scratch_shapes=[
            pltpu.VMEM((wrows, _LANES), x.dtype),
            pltpu.VMEM((wrows, _LANES), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp2, data2)
    return out.reshape(nr_pad)[:nr]


# ---------------------------------------------------------------------------
# VMEM-resident iteration chain
# ---------------------------------------------------------------------------


def _chain_kernel(offsets, k, alpha, rows_n, halo, tile, x_hbm, d_hbm,
                  o_hbm, s0, s1, d_ref, sem):
    """Vector scratches carry ``halo`` guard rows above and below the live
    region [halo, halo + rows_n); guard rows are zeroed once and the
    shifted reads run over them freely (DIA stores structural zeros at
    out-of-matrix positions, so guard garbage would be multiplied by 0
    anyway — zeroing protects against NaN * 0).  The step computes one
    ``tile``-row slab at a time: full-array expressions at 32K rows spill
    ~40 MB of vector registers to VMEM, which is the difference between
    fitting the 128 MB budget and not."""
    it = pl.program_id(0)

    @pl.when(it == 0)
    def _():
        # one-time fills: x and the WHOLE diagonal data into single-buffer
        # VMEM scratch (a VMEM BlockSpec would be double-buffered by the
        # pipeline and blow the 128 MB budget at 84 MB of data)
        z = jnp.zeros((halo, _LANES), s0.dtype)
        for s in (s0, s1):
            s[pl.ds(0, halo), :] = z
            s[pl.ds(halo + rows_n, halo), :] = z
        cp = pltpu.make_async_copy(x_hbm, s0.at[pl.ds(halo, rows_n), :],
                                   sem)
        cp.start()
        cp.wait()
        cd = pltpu.make_async_copy(d_hbm, d_ref, sem)
        cd.start()
        cd.wait()

    def step(cur_ref, nxt_ref):
        for t in range(rows_n // tile):
            def rows_at(q):
                return cur_ref[pl.ds(halo + t * tile + q, tile), :]

            acc = None
            for d, off in enumerate(offsets):
                q, r = divmod(off, _LANES)
                if r == 0:
                    sh = rows_at(q)
                else:
                    sh = jnp.concatenate(
                        [rows_at(q)[:, r:], rows_at(q + 1)[:, :r]], 1
                    )
                term = d_ref[d, pl.ds(t * tile, tile), :] * sh
                acc = term if acc is None else acc + term
            if alpha is not None:
                acc = acc * alpha
            nxt_ref[pl.ds(halo + t * tile, tile), :] = acc

        @pl.when(it == k - 1)
        def _():
            cp = pltpu.make_async_copy(
                nxt_ref.at[pl.ds(halo, rows_n), :], o_hbm, sem
            )
            cp.start()
            cp.wait()

    @pl.when(jax.lax.rem(it, jnp.asarray(2, it.dtype)) == 0)
    def _():
        step(s0, s1)

    @pl.when(jax.lax.rem(it, jnp.asarray(2, it.dtype)) == 1)
    def _():
        step(s1, s0)


@functools.partial(jax.jit, static_argnames=("k", "alpha"))
def dia_spmv_chain(dia, x, k: int, alpha: float | None = None):
    """y = (alpha A)^k @ x with the operator VMEM-RESIDENT for the whole
    chain — the iterative-method hot loop (power/Chebyshev iteration, the
    reference's repeated ``mulV``) as ONE kernel launch.

    A ``fori_loop`` of :func:`dia_spmv_pallas` calls re-streams the
    diagonal data from HBM every iteration (~500 GB/s effective at 4.2M
    dof); here the sequential grid walks the iterations while the data
    block's constant index map keeps all diagonals in VMEM after one fetch
    — measured ~1 TB/s effective on the same operator.  Requires square,
    1024-aligned shape and (ndiag + ~4) * nrows * 4 B <= ~120 MB VMEM;
    x is carried between iterations in two VMEM scratch planes (HBM is
    touched exactly twice: x in, y out)."""
    nr, nc = dia.shape
    if nr != nc or nr % (8 * _LANES):
        raise ValueError("dia_spmv_chain: square 1024-aligned shapes only")
    if k < 1:
        raise ValueError("dia_spmv_chain: k must be >= 1")
    offsets, data = _sorted_diags(dia)
    rows_n = nr // _LANES
    ndiag = len(offsets)
    need = (ndiag + 2) * rows_n * _LANES * 4
    if need > 120 * 2 ** 20:
        raise ValueError(
            f"dia_spmv_chain: operator needs {need / 2**20:.0f} MB VMEM "
            "(> 120 MB budget); chain dia_spmv_pallas instead"
        )
    keep_2d = x.ndim == 2
    data3 = data.reshape(ndiag, rows_n, _LANES)
    x2 = x.astype(data.dtype).reshape(rows_n, _LANES)
    # guard rows covering the widest row shift (q and the q+1 read of the
    # lane-split, on either side)
    halo = max(abs(int(o)) // _LANES for o in offsets) + 2
    tile = 2048
    while tile > 8 and rows_n % tile:
        tile //= 2
    tile = min(tile, rows_n)
    out = pl.pallas_call(
        functools.partial(_chain_kernel, offsets, k, alpha, rows_n, halo,
                          tile),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # x: HBM, copied in once
            pl.BlockSpec(memory_space=pl.ANY),    # data: HBM, one DMA in
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # y: HBM, one copy out
        out_shape=jax.ShapeDtypeStruct((rows_n, _LANES), data.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_n + 2 * halo, _LANES), data.dtype),
            pltpu.VMEM((rows_n + 2 * halo, _LANES), data.dtype),
            pltpu.VMEM((ndiag, rows_n, _LANES), data.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=125 * 2 ** 20,
        ),
    )(x2, data3)
    return out if keep_2d else out.reshape(nr)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def _sorted_diags(dia):
    offsets = tuple(sorted(int(o) for o in dia.offsets))
    if tuple(int(o) for o in dia.offsets) != offsets:
        order = np.argsort(np.asarray(dia.offsets))
        data = dia.data[jnp.asarray(order)]
    else:
        data = dia.data
    return offsets, data


def dia_spmv_pallas(dia, x, tile: int = 131072, alpha: float | None = None):
    """y = (alpha *) A @ x for DIA storage via Pallas TPU kernels.

    Square 1024-aligned operators take the blocked-halo VMEM kernel (zero
    per-call repacking — safe to chain inside ``lax.fori_loop``/``scan``
    iterative methods at VMEM bandwidth); everything else takes the
    streaming kernel.  ``alpha`` fuses a scalar rescale into the output
    write (free bandwidth vs a separate elementwise op — the common
    iterative-method idiom).  ``tile`` is the elements per grid step of the
    streaming kernel, a multiple of 1024.

    On the blocked path, ``x`` may also be passed pre-tiled as
    ``(nr // 128, 128)`` — then the result comes back in the same 2-D tiling
    and chained iterations avoid any 1-D<->2-D relayout between calls."""
    nr, nc = dia.shape
    if nr == nc and nr % (8 * _LANES) == 0:
        rows_n = nr // _LANES
        ndiag = len(dia.offsets)
        tr = _pick_tile_rows(rows_n, ndiag)
        if rows_n % tr == 0 and tr >= 8:
            max_q = max(abs(int(o) // _LANES) + 1 for o in dia.offsets)
            if -(-max_q // tr) <= 2:  # at most 2 halo blocks per side
                return _dia_spmv_blocked(dia, x, alpha, tile_rows=tr)
    if x.ndim == 2:
        y = _dia_spmv_streamed(dia, x.reshape(-1), tile, alpha)
        return y.reshape(-1, _LANES)
    return _dia_spmv_streamed(dia, x, tile, alpha)
