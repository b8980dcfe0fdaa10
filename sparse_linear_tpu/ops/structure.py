"""Structural algebra: concatenation, block assembly, Kronecker products.

Parity targets (reference: sparse-linear/src/Data/Matrix/Sparse.hs):
  hcat/hjoin        :500-521      vcat/vjoin        :523-557
  fromBlocks        :559-585      fromBlocksDiag    :587-595 (cyclic!)
  kronecker         :597-638      takeDiag          :640-650
  blockDiag         :661-667      outer             :331-355
  subMatrix         :704-729 (reference implementation is buggy; the *intent*
                              — contiguous block extraction — is what is
                              implemented here)

Assembly ops are host-level (they define problem structure, not hot paths);
``kron`` and ``take_diag`` are jittable device code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.matrix import COO, CSC, CSR, zeros
from sparse_linear_tpu.formats.sparse_vector import SparseVector
from sparse_linear_tpu.ops.build import coo_to_csr, trim

__all__ = [
    "to_columns",
    "from_columns",
    "to_rows",
    "from_rows",
    "vcat",
    "hcat",
    "from_blocks",
    "from_blocks_diag",
    "block_diag",
    "kron",
    "take_diag",
    "outer",
    "submatrix",
]


def vcat(mats):
    """Vertical concatenation (reference ``vcat``/``vjoin``,
    Matrix/Sparse.hs:523-557).  Returns CSR."""
    mats = [m.tocsr() for m in mats]
    if not mats:
        raise ValueError("vcat: empty list")
    nc = mats[0].shape[1]
    for m in mats:
        if m.shape[1] != nc:
            raise ValueError(
                f"vcat: column count mismatch: {m.shape[1]} != {nc}"
            )
    mats = [trim(m) for m in mats]
    indptrs = [mats[0].indptr]
    offset = mats[0].indptr[-1]
    for m in mats[1:]:
        indptrs.append(m.indptr[1:] + offset)
        offset = offset + m.indptr[-1]
    return CSR(
        indptr=jnp.concatenate(indptrs).astype(index_dtype),
        indices=jnp.concatenate([m.indices for m in mats]),
        data=jnp.concatenate([m.data for m in mats]),
        shape=(sum(m.shape[0] for m in mats), nc),
    )


def hcat(mats):
    """Horizontal concatenation (reference ``hcat``/``hjoin``,
    Matrix/Sparse.hs:500-521).  Returns CSC."""
    return vcat([m.tocsc().T for m in mats]).T


def from_blocks(rows):
    """Block assembly from a grid of ``Matrix | None``
    (reference ``fromBlocks``, Matrix/Sparse.hs:559-585), with the same size
    inference: ``None`` blocks take their dimensions from siblings; errors on
    underspecified or incompatible heights/widths."""
    if not rows or not rows[0]:
        raise ValueError("from_blocks: empty grid")
    ncols_grid = len(rows[0])
    if any(len(r) != ncols_grid for r in rows):
        raise ValueError("from_blocks: ragged grid")

    heights = []
    for i, row in enumerate(rows):
        hs = {m.shape[0] for m in row if m is not None}
        if not hs:
            raise ValueError("from_blocks: underspecified heights")
        if len(hs) > 1:
            raise ValueError("from_blocks: incompatible heights")
        heights.append(hs.pop())
    widths = []
    for j in range(ncols_grid):
        ws = {rows[i][j].shape[1] for i in range(len(rows)) if rows[i][j] is not None}
        if not ws:
            raise ValueError("from_blocks: underspecified widths")
        if len(ws) > 1:
            raise ValueError("from_blocks: incompatible widths")
        widths.append(ws.pop())

    dtype = None
    for row in rows:
        for m in row:
            if m is not None:
                dtype = m.dtype if dtype is None else np.promote_types(dtype, m.dtype)
    filled = [
        [
            m if m is not None else zeros((heights[i], widths[j]), dtype=dtype)
            for j, m in enumerate(row)
        ]
        for i, row in enumerate(rows)
    ]
    return vcat([hcat(row) for row in filled])


def from_blocks_diag(blocks):
    """Cyclic block-diagonal assembly (reference ``fromBlocksDiag``,
    Matrix/Sparse.hs:587-595): ``blocks[d][i]`` is placed at block position
    ``(i, (i + d) mod n)`` where n = len(blocks)."""
    n = len(blocks)
    padded = [list(b) + [None] * (n - len(b)) for b in blocks]
    grid = [
        [padded[(j - i) % n][i] for j in range(n)]
        for i in range(n)
    ]
    return from_blocks(grid)


def block_diag(mats):
    """Plain block-diagonal (reference ``blockDiag``, Matrix/Sparse.hs:661-667)."""
    n = len(mats)
    return from_blocks_diag(
        [[m for m in mats]] + [[None] * n for _ in range(n - 1)]
    )


def kron(a, b):
    """Kronecker product (reference ``kronecker``, Matrix/Sparse.hs:597-638).

    Jittable: capacity nnz(A)*nnz(B) with sentinel padding propagated."""
    a = a.tocoo()
    b = b.tocoo()
    (nra, nca), (nrb, ncb) = a.shape, b.shape
    rows = (a.row[:, None] * nrb + b.row[None, :]).reshape(-1)
    cols = (a.col[:, None] * ncb + b.col[None, :]).reshape(-1)
    data = (a.data[:, None] * b.data[None, :]).reshape(-1)
    nr, nc = nra * nrb, nca * ncb
    # sentinel entries (row >= shape) stay out of range after the affine map
    pad = (a.row[:, None] >= nra) | (b.row[None, :] >= nrb)
    rows = jnp.where(pad.reshape(-1), nr, rows)
    cols = jnp.where(pad.reshape(-1), nc, cols)
    nnz = a.nnz * b.nnz if (a.nnz is not None and b.nnz is not None) else None
    out = coo_to_csr(
        COO(row=rows, col=cols, data=data, shape=(nr, nc), nnz=nnz)
    )
    return out


def take_diag(mat):
    """Main diagonal as a dense vector; absent entries are 0
    (reference ``takeDiag``, Matrix/Sparse.hs:640-650)."""
    coo = mat.tocoo()
    n = min(mat.shape)
    from sparse_linear_tpu.ops.linalg import _valid_mask

    on_diag = (coo.row == coo.col) & _valid_mask(coo)
    out = jnp.zeros((n,), dtype=coo.data.dtype)
    return out.at[jnp.where(on_diag, coo.row, n)].add(
        jnp.where(on_diag, coo.data, 0), mode="drop"
    )


def outer(col_vec: SparseVector, row_vec: SparseVector):
    """Sparse outer product col . row^T: result[i, j] = col[i] * row[j]
    (reference ``outer``, Matrix/Sparse.hs:331-355; note the reference's code
    binds its arguments in the opposite order to its own doc comment — the
    documented column-vector-first semantics is implemented here)."""
    rows = (col_vec.indices[:, None] + jnp.zeros_like(row_vec.indices)[None, :]).reshape(-1)
    cols = (jnp.zeros_like(col_vec.indices)[:, None] + row_vec.indices[None, :]).reshape(-1)
    data = (col_vec.data[:, None] * row_vec.data[None, :]).reshape(-1)
    return coo_to_csr(
        COO(
            row=rows,
            col=cols,
            data=data,
            shape=(col_vec.length, row_vec.length),
            nnz=int(rows.shape[0]),
        )
    )


def submatrix(mat, r0: int, r1: int, c0: int, c1: int):
    """Contiguous block extraction: mat[r0:r1, c0:c1] (host-side).

    The reference's ``subMatrix`` (Matrix/Sparse.hs:704-729) is buggy as
    written (see SURVEY.md §2.2); this implements the intended behavior."""
    coo = trim(mat.tocoo())
    r = np.asarray(coo.row)
    c = np.asarray(coo.col)
    v = np.asarray(coo.data)
    keep = (r >= r0) & (r < r1) & (c >= c0) & (c < c1)
    out = COO(
        row=jnp.asarray(r[keep] - r0, index_dtype),
        col=jnp.asarray(c[keep] - c0, index_dtype),
        data=jnp.asarray(v[keep]),
        shape=(r1 - r0, c1 - c0),
        nnz=int(keep.sum()),
    )
    return coo_to_csr(out)


def to_columns(mat):
    """Matrix -> list of sparse column vectors (reference ``toColumns``,
    Matrix/Sparse.hs:381-387).  Host-side."""
    csc = trim(mat.tocsc())
    return [csc.col(j) for j in range(csc.shape[1])]


def from_columns(cols):
    """List of sparse column vectors -> CSC (reference
    ``unsafeFromColumns``, Matrix/Sparse.hs:389-399)."""
    if not cols:
        raise ValueError("from_columns: empty list")
    nr = cols[0].length
    if any(c.length != nr for c in cols):
        raise ValueError("from_columns: column length mismatch")
    indptr = np.zeros(len(cols) + 1, dtype=np.int32)
    indptr[1:] = np.cumsum([c.nnz for c in cols])
    return CSC(
        indptr=jnp.asarray(indptr),
        indices=jnp.concatenate([c.indices for c in cols])
        if any(c.nnz for c in cols) else jnp.zeros((0,), jnp.int32),
        data=jnp.concatenate([c.data for c in cols])
        if any(c.nnz for c in cols) else jnp.zeros((0,)),
        shape=(nr, len(cols)),
    )


def to_rows(mat):
    """Matrix -> list of sparse row vectors (CSR dual of ``to_columns``)."""
    csr = trim(mat.tocsr())
    return [csr.row(i) for i in range(csr.shape[0])]


def from_rows(rows):
    """List of sparse row vectors -> CSR."""
    return from_columns(rows).T
