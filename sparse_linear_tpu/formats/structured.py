"""Structured sparse formats for the TPU fast path: DIA, ELL, BSR.

These have no counterpart in the reference — its only storage is CSC
(reference: sparse-linear/src/Data/Matrix/Sparse.hs:67-76) and its SpMV is a
scalar scattered loop (Matrix/Sparse.hs:447-451).  On TPU the performance
ceiling is set by how the sparsity maps onto 8x128 vector lanes / the 128x128
MXU, so the library promotes structure to the type level:

* DIA  — diagonal storage for stencil operators (Laplacians/Poisson, the
  reference's canonical problem class).  SpMV becomes shifted
  multiply-adds: pure VPU streaming at HBM bandwidth, zero gathers.
* ELL  — fixed width-K padded rows.  SpMV is a dense gather + row reduction;
  the shape is static, XLA tiles it cleanly.
* BSR  — block sparse rows with dense (bm, bn) blocks; SpMM/SpMV ride the
  MXU via batched dense contractions.

All are pytree dataclasses; conversions from canonical CSR are host-side
(pattern work), the math is jittable device code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.base import pytree_dataclass
from sparse_linear_tpu.formats.matrix import COO, CSR

__all__ = ["DIA", "ELL", "BSR", "csr_to_dia", "csr_to_ell",
           "csr_to_bsr", "pad_dia"]


# ---------------------------------------------------------------------- DIA


@pytree_dataclass(meta_fields=("shape", "offsets"))
class DIA:
    """Diagonal storage: ``data[d, i] = A[i, i + offsets[d]]`` (row-aligned).

    Out-of-matrix positions hold 0."""

    data: jax.Array  # (ndiag, nrows)
    shape: tuple
    offsets: tuple  # static ints

    @property
    def dtype(self):
        return self.data.dtype

    def todense(self):
        nr, nc = self.shape
        out = jnp.zeros((nr, nc), dtype=self.data.dtype)
        rows = jnp.arange(nr, dtype=index_dtype)
        for d, off in enumerate(self.offsets):
            cols = rows + off
            ok = (cols >= 0) & (cols < nc)
            out = out.at[rows, jnp.clip(cols, 0, nc - 1)].add(
                jnp.where(ok, self.data[d], 0), mode="drop"
            )
        return out

    def __matmul__(self, x):
        from sparse_linear_tpu.kernels.spmv import dia_spmv

        return dia_spmv(self, jnp.asarray(x))


def csr_to_dia(mat: CSR, max_diags: int = 64) -> DIA:
    """Host-side CSR -> DIA.  Errors if the pattern needs more than
    ``max_diags`` distinct diagonals (then DIA is the wrong format)."""
    from sparse_linear_tpu.ops.build import trim

    mat = trim(mat.tocsr())
    nr, nc = mat.shape
    rows = np.asarray(mat.row_ids())
    cols = np.asarray(mat.indices)
    vals = np.asarray(mat.data)
    offs = np.unique(cols.astype(np.int64) - rows.astype(np.int64))
    if offs.size > max_diags:
        raise ValueError(
            f"csr_to_dia: pattern has {offs.size} diagonals (> {max_diags}); "
            "use ELL/BSR instead"
        )
    off_pos = {int(o): i for i, o in enumerate(offs)}
    data = np.zeros((offs.size, nr), dtype=vals.dtype)
    d_idx = np.array([off_pos[int(o)] for o in (cols - rows)], dtype=np.int64)
    data[d_idx, rows] = vals
    return DIA(
        data=jnp.asarray(data),
        shape=mat.shape,
        offsets=tuple(int(o) for o in offs),
    )


def pad_dia(dia: DIA, multiple: int = 1024) -> DIA:
    """Square DIA padded with zero rows/cols to a row-count multiple.

    The fast blocked VMEM DIA kernel (kernels/spmv_pallas) requires
    ``nrows % 1024 == 0``; off-multiple operators otherwise fall to the
    streaming kernel, which pays the full halo width in extra x traffic
    per tile (measured 142 vs ~500 GB/s on 216^3 3D Poisson).  The pad is
    inert: padded data entries are zero, so padded x/y rows stay zero
    through any iteration chain.  Pad x to ``out.shape[1]`` (zeros) and
    slice y back to the original n."""
    nr, nc = dia.shape
    if nr != nc:
        raise ValueError("pad_dia: only square operators")
    n_pad = -(-nr // multiple) * multiple
    if n_pad == nr:
        return dia
    import dataclasses

    return dataclasses.replace(
        dia,
        data=jnp.pad(dia.data, ((0, 0), (0, n_pad - nr))),
        shape=(n_pad, n_pad),
    )


# ---------------------------------------------------------------------- ELL


@pytree_dataclass(meta_fields=("shape",))
class ELL:
    """ELLPACK: fixed K entries per row, padded with (col=row-clamped, val=0)."""

    cols: jax.Array  # (nrows, K) int32
    vals: jax.Array  # (nrows, K)
    shape: tuple

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def width(self) -> int:
        return int(self.cols.shape[1])

    def todense(self):
        nr, nc = self.shape
        out = jnp.zeros((nr, nc), dtype=self.vals.dtype)
        rows = jnp.broadcast_to(
            jnp.arange(nr, dtype=index_dtype)[:, None], self.cols.shape
        )
        return out.at[rows, self.cols].add(self.vals, mode="drop")

    def __matmul__(self, x):
        from sparse_linear_tpu.kernels.spmv import ell_spmv

        return ell_spmv(self, jnp.asarray(x))


def csr_to_ell(mat: CSR, width: int | None = None) -> ELL:
    """Host-side CSR -> ELL.  ``width`` defaults to the max row nnz."""
    from sparse_linear_tpu.ops.build import trim

    mat = trim(mat.tocsr())
    nr, nc = mat.shape
    indptr = np.asarray(mat.indptr)
    row_nnz = np.diff(indptr)
    k = int(row_nnz.max()) if width is None else int(width)
    if width is not None and row_nnz.max() > width:
        raise ValueError(
            f"csr_to_ell: max row nnz {int(row_nnz.max())} exceeds width {width}"
        )
    cols = np.zeros((nr, k), dtype=np.int32)
    vals = np.zeros((nr, k), dtype=np.asarray(mat.data).dtype)
    # padding gathers x[0] times 0 — harmless and always in bounds
    src_cols = np.asarray(mat.indices)
    src_vals = np.asarray(mat.data)
    pos = np.arange(len(src_cols)) - np.repeat(indptr[:-1], row_nnz)
    rows = np.repeat(np.arange(nr), row_nnz)
    cols[rows, pos] = src_cols
    vals[rows, pos] = src_vals
    return ELL(cols=jnp.asarray(cols), vals=jnp.asarray(vals), shape=mat.shape)


# ---------------------------------------------------------------------- BSR


@pytree_dataclass(meta_fields=("shape", "block_shape"))
class BSR:
    """Block sparse rows: dense (bm, bn) blocks in CSR layout over the
    (nrows/bm, ncols/bn) block grid."""

    indptr: jax.Array  # (nbrows + 1,)
    indices: jax.Array  # (nblocks,) block-column ids
    blocks: jax.Array  # (nblocks, bm, bn)
    shape: tuple
    block_shape: tuple

    @property
    def dtype(self):
        return self.blocks.dtype

    def todense(self):
        nr, nc = self.shape
        bm, bn = self.block_shape
        from sparse_linear_tpu.formats.base import expand_indptr

        nbr = nr // bm
        brow = expand_indptr(self.indptr, int(self.blocks.shape[0]))
        out = jnp.zeros((nbr, nc // bn, bm, bn), dtype=self.blocks.dtype)
        out = out.at[brow, self.indices].add(self.blocks, mode="drop")
        return out.transpose(0, 2, 1, 3).reshape(nr, nc)

    def __matmul__(self, x):
        from sparse_linear_tpu.kernels.spmv import bsr_spmv, bsr_spmm

        x = jnp.asarray(x)
        if x.ndim == 1:
            return bsr_spmv(self, x)
        return bsr_spmm(self, x)


def csr_to_bsr(mat: CSR, block_shape=(8, 128)) -> BSR:
    """Host-side CSR -> BSR.  Dimensions must divide by the block shape
    (pad the matrix first if not)."""
    from sparse_linear_tpu.ops.build import trim

    mat = trim(mat.tocsr())
    nr, nc = mat.shape
    bm, bn = block_shape
    if nr % bm or nc % bn:
        raise ValueError(
            f"csr_to_bsr: shape {mat.shape} not divisible by blocks {block_shape}"
        )
    rows = np.asarray(mat.row_ids())
    cols = np.asarray(mat.indices)
    vals = np.asarray(mat.data)
    br, bc = rows // bm, cols // bn
    key = br.astype(np.int64) * (nc // bn) + bc
    uniq, inv = np.unique(key, return_inverse=True)
    nblocks = uniq.size
    blocks = np.zeros((nblocks, bm, bn), dtype=vals.dtype)
    blocks[inv, rows % bm, cols % bn] = vals
    ubr = (uniq // (nc // bn)).astype(np.int64)
    ubc = (uniq % (nc // bn)).astype(np.int32)
    indptr = np.zeros(nr // bm + 1, dtype=np.int32)
    np.add.at(indptr, ubr + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return BSR(
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(ubc),
        blocks=jnp.asarray(blocks),
        shape=mat.shape,
        block_shape=(int(bm), int(bn)),
    )
