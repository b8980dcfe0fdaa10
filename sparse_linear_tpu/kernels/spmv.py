"""SpMV / SpMM compute kernels over the structured formats.

The roofline op of the library (BASELINE.md config 1: >80% of HBM bandwidth
on v5e).  The reference's SpMV is a serial scattered column loop (reference:
sparse-linear/src/Data/Matrix/Sparse.hs:447-451); here each format maps to
the TPU unit that executes it at speed of light:

* DIA  -> shifted fused multiply-adds: one streaming VPU pass, no gathers.
  XLA fuses the whole sum into a single HBM-bound loop.
* ELL  -> dense gather + row reduction over a static (nrows, K) tile.
* BSR  -> batched dense (bm, bn) block contractions on the MXU +
  segment-sum over block rows.

All functions are jit-compatible pure functions of pytree inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.base import expand_indptr

__all__ = ["dia_spmv", "dia_spmm", "dia_spmm_planes", "ell_spmv",
           "bsr_spmv", "bsr_spmm"]


def dia_spmv(dia, x):
    """y = A @ x for DIA storage: y[i] = sum_d data[d, i] * x[i + off_d]."""
    nr, nc = dia.shape
    if x.shape[0] != nc:
        raise ValueError(f"dia_spmv: dimension mismatch {dia.shape} @ {x.shape}")
    offsets = dia.offsets
    pad_lo = max(0, -min(offsets, default=0))
    pad_hi = max(0, max(offsets, default=0) + nr - nc)
    xp = jnp.pad(x, (pad_lo, pad_hi))
    y = jnp.zeros((nr,), dtype=jnp.result_type(dia.data, x))
    for d, off in enumerate(offsets):
        start = off + pad_lo
        y = y + dia.data[d] * jax.lax.slice_in_dim(xp, start, start + nr)
    return y


def dia_spmm(dia, x):
    """Y = A @ X for DIA storage and dense X (ncols, m): the dia_spmv
    shifted-fma loop lifted over the column axis — one streaming VPU pass
    per diagonal, no gathers (f64-safe on TPU, unlike the scatter paths)."""
    nr, nc = dia.shape
    x = jnp.asarray(x)
    if x.ndim == 1:
        return dia_spmv(dia, x)
    if x.shape[0] != nc:
        raise ValueError(f"dia_spmm: dimension mismatch {dia.shape} @ {x.shape}")
    offsets = dia.offsets
    pad_lo = max(0, -min(offsets, default=0))
    pad_hi = max(0, max(offsets, default=0) + nr - nc)
    xp = jnp.pad(x, ((pad_lo, pad_hi), (0, 0)))
    y = jnp.zeros((nr, x.shape[1]), dtype=jnp.result_type(dia.data, x))
    for d, off in enumerate(offsets):
        start = off + pad_lo
        y = y + dia.data[d][:, None] * jax.lax.slice_in_dim(
            xp, start, start + nr, axis=0
        )
    return y


def dia_spmm_planes(dia, xp):
    """Plane-major Y = A @ X for DIA storage: ``xp`` of shape (m, ncols),
    one RHS per ROW, returns (m, nrows).  The shifted-fma loop along the
    lane (minor) axis — layout-matched to consumers that hold their block
    plane-major for the WELL kernels (kernels/spmv_well.well_spmm_planes),
    so a mixed DIA/WELL pipeline chains multiplies with zero relayouts."""
    nr, nc = dia.shape
    xp = jnp.asarray(xp)
    if xp.ndim != 2 or xp.shape[1] != nc:
        raise ValueError(
            f"dia_spmm_planes: expected (m, {nc}) planes, got {xp.shape}"
        )
    offsets = dia.offsets
    pad_lo = max(0, -min(offsets, default=0))
    pad_hi = max(0, max(offsets, default=0) + nr - nc)
    x2 = jnp.pad(xp, ((0, 0), (pad_lo, pad_hi)))
    y = jnp.zeros((xp.shape[0], nr), dtype=jnp.result_type(dia.data, xp))
    for d, off in enumerate(offsets):
        start = off + pad_lo
        y = y + dia.data[d][None, :] * jax.lax.slice_in_dim(
            x2, start, start + nr, axis=1
        )
    return y


def ell_spmv(ell, x):
    """y = A @ x for ELL storage: gather + row-sum over static width K."""
    nr, nc = ell.shape
    if x.shape[0] != nc:
        raise ValueError(f"ell_spmv: dimension mismatch {ell.shape} @ {x.shape}")
    return (ell.vals * x[ell.cols]).sum(axis=1)


def bsr_spmv(bsr, x):
    """y = A @ x for BSR storage: batched block GEMV + block-row segment sum."""
    nr, nc = bsr.shape
    bm, bn = bsr.block_shape
    if x.shape[0] != nc:
        raise ValueError(f"bsr_spmv: dimension mismatch {bsr.shape} @ {x.shape}")
    nbr = nr // bm
    xb = x.reshape(nc // bn, bn)
    xg = xb[bsr.indices]  # (nblocks, bn)
    contrib = jnp.einsum(
        "kij,kj->ki", bsr.blocks, xg.astype(bsr.blocks.dtype),
        preferred_element_type=jnp.result_type(bsr.blocks, x),
    )
    brow = expand_indptr(bsr.indptr, int(bsr.blocks.shape[0]))
    # block rows are nondecreasing by CSR construction: a sorted segment
    # sum of full (bm,) slabs, not an element scatter
    y = jax.ops.segment_sum(contrib, brow, num_segments=nbr,
                            indices_are_sorted=True)
    return y.reshape(nr)


def bsr_spmm(bsr, b):
    """Y = A @ B for BSR storage and dense B (ncols, m): batched block GEMMs
    on the MXU."""
    nr, nc = bsr.shape
    bm, bn = bsr.block_shape
    if b.shape[0] != nc:
        raise ValueError(f"bsr_spmm: dimension mismatch {bsr.shape} @ {b.shape}")
    m = b.shape[1]
    nbr = nr // bm
    bb = b.reshape(nc // bn, bn, m)
    bg = bb[bsr.indices]  # (nblocks, bn, m)
    contrib = jnp.einsum(
        "kij,kjm->kim", bsr.blocks, bg.astype(bsr.blocks.dtype),
        preferred_element_type=jnp.result_type(bsr.blocks, b),
    )
    brow = expand_indptr(bsr.indptr, int(bsr.blocks.shape[0]))
    y = jax.ops.segment_sum(contrib, brow, num_segments=nbr,
                            indices_are_sorted=True)
    return y.reshape(nr, m)
