"""Pallas TPU kernel for DIA SpMV — the roofline SpMV path.

The jnp implementation (kernels/spmv.py:dia_spmv) leaves ~10x on the table
(pad + per-diagonal slice chains, ~80-110 GB/s effective on v5e).  This
kernel is built around the TPU's native (8, 128) vector tiling:

* all arrays are viewed 2-D as (rows, 128) so the VPU runs full lanes;
* each grid step processes a (R, 128) row tile of y with the diagonal data
  tiles streamed by the pipeline;
* one halo-extended x window per tile is DMA'd HBM->VMEM with
  double-buffered prefetch (window i+1 in flight during compute of i);
* a flat shift by ``off`` decomposes into a static row shift q = off // 128
  plus a lane rotation r = off % 128, implemented with two ``pltpu.roll``s
  and a lane-index select — the classic TPU stencil idiom, no gathers.

Mosaic constraints: DMA offsets/lengths aligned to the (8, 128) tiling
(1024 elements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dia_spmv_pallas"]

_LANES = 128


def _shifted(window, q, r, rows):
    """rows x 128 view of the window flat-shifted by q*128 + r elements."""
    if r == 0:
        return window[pl.ds(q, rows), :]
    # roll requires non-negative shift; -r == 128 - r circularly
    a = pltpu.roll(window[pl.ds(q, rows), :], _LANES - r, 1)
    b = pltpu.roll(window[pl.ds(q + 1, rows), :], _LANES - r, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    return jnp.where(lane < _LANES - r, a, b)


def _kernel(offsets, rows, wrows, base_row, alpha, x_hbm, data_ref, out_ref,
            w0, w1, s0, s1):
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


def dia_spmv_pallas(dia, x, tile: int = 131072, alpha: float | None = None):
    """y = (alpha *) A @ x for DIA storage via the Pallas streaming kernel.

    Any shape (padded transparently); real dtypes; ``tile`` is the elements
    per grid step, a multiple of 1024.  ``alpha`` fuses a scalar rescale into
    the kernel's output write (free bandwidth vs a separate elementwise op —
    the common iterative-method idiom)."""
    nr, nc = dia.shape
    if tile % 1024:
        raise ValueError("tile must be a multiple of 1024")
    offsets = tuple(sorted(dia.offsets))
    if tuple(dia.offsets) != offsets:
        order = np.argsort(np.asarray(dia.offsets))
        data = dia.data[jnp.asarray(order)]
    else:
        data = dia.data
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
        functools.partial(_kernel, offsets, rows, wrows, base // _LANES,
                          alpha),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (ndiag, rows, _LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
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
