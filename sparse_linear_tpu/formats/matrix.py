"""Core sparse matrix formats: COO, CSR, CSC.

TPU-native re-design of the reference's single CSC record
(reference: sparse-linear/src/Data/Matrix/Sparse.hs:67-76).  Differences,
deliberately:

* Three interchange formats instead of one.  COO is the construction format
  (the reference's triples, Matrix/Sparse.hs:357-369); CSR is primary on TPU
  because SpMV/SpMM row-partitioning across a device mesh shards the output
  dimension; CSC is the column view (= the reference's native layout) and is
  obtained from CSR by an O(1) buffer-sharing transpose, exactly as the
  reference treats CSR as the transpose of CSC (Matrix/Sparse.hs:301-329).
* Every format is a registered pytree with static shape metadata, so whole
  matrices pass through ``jit``/``vmap``/``shard_map``.
* Buffers may carry **padding** beyond the valid entries (static shapes under
  jit cannot shrink).  Padded COO entries use out-of-range sentinel
  coordinates (row == nrows) with zero values, so scatter/segment consumers
  drop them (``mode="drop"``).  Padded CSR/CSC entries live past
  ``indptr[-1]``.  Host-side constructors always produce exact-size canonical
  arrays satisfying the reference invariants
  (tests/Test/LinearAlgebra.hs:46-67): nondecreasing pointers, strictly
  increasing per-segment minor indices, indices in range, duplicates summed.

Invariant summary (canonical matrices):
  CSR: len(indptr) == nrows+1; indptr[0] == 0; indptr nondecreasing;
       indptr[-1] == nnz == len(indices) == len(values);
       column indices strictly increasing within each row; 0 <= col < ncols.
  CSC: same with rows/cols swapped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import conj as _conj, is_complex, index_dtype
from sparse_linear_tpu.formats.base import (
    asarray_index,
    expand_indptr,
    pytree_dataclass,
)

__all__ = ["COO", "CSR", "CSC", "from_triples", "eye", "zeros", "diag"]


def _shape2(shape):
    nr, nc = shape
    return (int(nr), int(nc))


class _MatrixOpsMixin:
    """Operator sugar shared by all matrix formats.

    Mirrors the reference's Num instance (Matrix/Sparse.hs:100-113): ``+``/``-``
    elementwise via the SPA union-merge, ``*`` is **matrix multiply** (SpGEMM),
    ``negate``/``abs``/``signum`` elementwise.  ``@`` (not in the reference's
    Num) is matrix-vector / matrix-dense product, the README-highlighted idiom
    (sparse-linear/README.md:17-19).
    """

    def __add__(self, other):
        from sparse_linear_tpu.ops import linalg

        return linalg.add(self, other)

    def __sub__(self, other):
        from sparse_linear_tpu.ops import linalg

        return linalg.lin(1.0, self, -1.0, other)

    def __mul__(self, other):
        from sparse_linear_tpu.ops import linalg, spgemm

        if isinstance(other, _MatrixOpsMixin):
            return spgemm.spgemm(self, other)
        return linalg.scale(self, other)

    def __rmul__(self, other):
        from sparse_linear_tpu.ops import linalg

        return linalg.scale(self, other)

    def __neg__(self):
        return self.map_values(jnp.negative)

    def __matmul__(self, other):
        from sparse_linear_tpu.ops import linalg

        if isinstance(other, _MatrixOpsMixin):
            from sparse_linear_tpu.ops import spgemm

            return spgemm.spgemm(self, other)
        other = jnp.asarray(other)
        if other.ndim == 1:
            return linalg.spmv(self, other)
        return linalg.spmm(self, other)

    def scale(self, alpha):
        from sparse_linear_tpu.ops import linalg

        return linalg.scale(self, alpha)

    def __abs__(self):
        """Elementwise absolute value (reference Num ``abs``,
        Matrix/Sparse.hs:100-113)."""
        return self.map_values(jnp.abs)

    def signum(self):
        """Elementwise sign (reference Num ``signum``)."""
        return self.map_values(jnp.sign)

    def reduce_values(self, f, init):
        """Fold over STORED values only (reference MonoFoldable
        ``ofoldl'``, Matrix/Sparse.hs:84-98).

        When ``f`` is one of the recognized associative numpy/jnp binary
        ops (add/multiply/maximum/minimum, operator.add/mul) the fold runs
        as ONE vector reduction and ``f(init, reduced)`` — same result up
        to floating-point reassociation (numpy reduces pairwise, not
        strictly left-to-right).  Any other ``f`` gets the exact
        sequential left fold, O(nnz) host iterations."""
        from sparse_linear_tpu.ops.build import trim

        import numpy as _np

        vals = _np.asarray(trim(self).data)
        # fast path: the common associative folds map to one vector op
        _vector_folds = {}
        for mod in (_np, jnp):
            _vector_folds[mod.add] = _np.add.reduce
            _vector_folds[mod.multiply] = _np.multiply.reduce
            _vector_folds[mod.maximum] = _np.maximum.reduce
            _vector_folds[mod.minimum] = _np.minimum.reduce
        import operator

        _vector_folds[operator.add] = _np.add.reduce
        _vector_folds[operator.mul] = _np.multiply.reduce
        red = _vector_folds.get(f)
        if red is not None and vals.size:
            return f(init, red(vals))
        acc = init
        for v in vals:
            acc = f(acc, v)
        return acc

    def sum_values(self):
        """Sum of stored values (ofoldl' (+) analog)."""
        from sparse_linear_tpu.ops.linalg import _valid_mask

        return jnp.where(_valid_mask(self), self.data, 0).sum()

    def is_hermitian(self, tol: float = 0.0):
        """ctrans m == m (reference ``hermitian``, Matrix/Sparse.hs:377-379;
        exact equality there — ``tol`` generalizes).

        Sparse comparison on canonical CSR arrays — O(nnz), never
        densifies (the pattern of A and ctrans(A) must agree entry for
        entry)."""
        import numpy as _np

        nr, nc = self.shape
        if nr != nc:
            return False
        from sparse_linear_tpu.ops.build import trim as _trim

        a = _trim(self.tocsr())
        h = _trim(a.ctrans().tocsr())
        if not _np.array_equal(_np.asarray(a.indptr), _np.asarray(h.indptr)):
            return False
        if not _np.array_equal(
            _np.asarray(a.indices), _np.asarray(h.indices)
        ):
            return False
        return bool(_np.allclose(
            _np.asarray(a.data), _np.asarray(h.data), atol=tol, rtol=0
        ))

    @property
    def dtype(self):
        return self.data.dtype


@pytree_dataclass(meta_fields=("shape", "nnz"))
class COO(_MatrixOpsMixin):
    """Coordinate format.  ``nnz`` is the static count of valid entries, or
    ``None`` when the buffer may contain sentinel padding of unknown length
    (device-produced results).  Sentinel entries satisfy row == nrows,
    col == ncols, value == 0."""

    row: jax.Array
    col: jax.Array
    data: jax.Array
    shape: tuple
    nnz: object = None  # int | None

    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    def todense(self):
        nr, nc = self.shape
        out = jnp.zeros((nr, nc), dtype=self.data.dtype)
        return out.at[self.row, self.col].add(self.data, mode="drop")

    @property
    def T(self):
        return COO(
            row=self.col,
            col=self.row,
            data=self.data,
            shape=(self.shape[1], self.shape[0]),
            nnz=self.nnz,
        )

    def conj(self):
        return self.map_values(_conj)

    def ctrans(self):
        """Conjugate transpose (reference ``ctrans``, Matrix/Sparse.hs:371-375)."""
        return self.T.conj()

    def map_values(self, f):
        """Elementwise map over stored values (reference ``cmap``/``omap``,
        Matrix/Sparse.hs:115-117,84-90)."""
        return COO(
            row=self.row, col=self.col, data=f(self.data), shape=self.shape, nnz=self.nnz
        )

    def tocsr(self):
        from sparse_linear_tpu.ops import build

        return build.coo_to_csr(self)

    def tocsc(self):
        from sparse_linear_tpu.ops import build

        return build.coo_to_csc(self)

    def tocoo(self):
        return self


@pytree_dataclass(meta_fields=("shape",))
class CSR(_MatrixOpsMixin):
    """Compressed sparse row.  Valid entries are positions < indptr[-1];
    buffers may be longer (padding)."""

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    shape: tuple

    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    @property
    def nnz(self):
        """Valid-entry count.  Python int when concrete, device scalar under jit.

        Reference ``nonZero`` (Matrix/Sparse.hs:123-125).
        """
        last = self.indptr[-1]
        if isinstance(last, jax.core.Tracer):
            return last
        return int(last)

    def row_ids(self):
        """Per-entry row ids (reference ``decompress``, Matrix/Sparse.hs:293-299).

        Padded entries get id == nrows."""
        return expand_indptr(self.indptr, self.capacity)

    def todense(self):
        nr, nc = self.shape
        out = jnp.zeros((nr, nc), dtype=self.data.dtype)
        return out.at[self.row_ids(), self.indices].add(self.data, mode="drop")

    @property
    def T(self):
        """O(1) transpose: same buffers viewed as CSC of the transposed shape.

        The reference computes CSC<->CSR by an O(nnz) scatter pass
        (Matrix/Sparse.hs:301-329); here the lazy view is free and an explicit
        re-sort is only paid when an op needs the other major order
        (``.tocsr()``/``.tocsc()``)."""
        return CSC(
            indptr=self.indptr,
            indices=self.indices,
            data=self.data,
            shape=(self.shape[1], self.shape[0]),
        )

    def conj(self):
        return self.map_values(_conj)

    def ctrans(self):
        return self.T.conj()

    def map_values(self, f):
        return CSR(
            indptr=self.indptr, indices=self.indices, data=f(self.data), shape=self.shape
        )

    def tocoo(self):
        return COO(
            row=self.row_ids(),
            col=jnp.where(
                jnp.arange(self.capacity) < self.indptr[-1],
                self.indices,
                jnp.asarray(self.shape[1], index_dtype),
            ),
            data=jnp.where(
                jnp.arange(self.capacity) < self.indptr[-1], self.data, 0
            ),
            shape=self.shape,
            nnz=None,
        )

    def tocsr(self):
        return self

    def tocsc(self):
        from sparse_linear_tpu.ops import build

        return build.reorder_major(self, to="csc")

    def row(self, i: int):
        """Extract row i as a sparse vector (host-side; reference ``slice``,
        Matrix/Sparse.hs:161-182 — O(1) there; O(copy) here by design since
        device slices need static shapes)."""
        from sparse_linear_tpu.formats.sparse_vector import SparseVector

        lo, hi = int(self.indptr[i]), int(self.indptr[i + 1])
        return SparseVector(
            indices=self.indices[lo:hi], data=self.data[lo:hi], length=self.shape[1]
        )


@pytree_dataclass(meta_fields=("shape",))
class CSC(_MatrixOpsMixin):
    """Compressed sparse column — the reference's native format
    (Matrix/Sparse.hs:67-76)."""

    indptr: jax.Array
    indices: jax.Array
    data: jax.Array
    shape: tuple

    @property
    def capacity(self) -> int:
        return int(self.data.shape[0])

    @property
    def nnz(self):
        last = self.indptr[-1]
        if isinstance(last, jax.core.Tracer):
            return last
        return int(last)

    def col_ids(self):
        return expand_indptr(self.indptr, self.capacity)

    def todense(self):
        nr, nc = self.shape
        out = jnp.zeros((nr, nc), dtype=self.data.dtype)
        return out.at[self.indices, self.col_ids()].add(self.data, mode="drop")

    @property
    def T(self):
        return CSR(
            indptr=self.indptr,
            indices=self.indices,
            data=self.data,
            shape=(self.shape[1], self.shape[0]),
        )

    def conj(self):
        return self.map_values(_conj)

    def ctrans(self):
        return self.T.conj()

    def map_values(self, f):
        return CSC(
            indptr=self.indptr, indices=self.indices, data=f(self.data), shape=self.shape
        )

    def tocoo(self):
        return self.T.tocoo().T

    def tocsc(self):
        return self

    def tocsr(self):
        from sparse_linear_tpu.ops import build

        return build.reorder_major(self, to="csr")

    def col(self, j: int):
        """Extract column j as a sparse vector (reference ``slice``,
        Matrix/Sparse.hs:161-182)."""
        from sparse_linear_tpu.formats.sparse_vector import SparseVector

        lo, hi = int(self.indptr[j]), int(self.indptr[j + 1])
        return SparseVector(
            indices=self.indices[lo:hi], data=self.data[lo:hi], length=self.shape[0]
        )


# ---------------------------------------------------------------------------
# Constructors (host-side; exact-size canonical output)
# ---------------------------------------------------------------------------


def from_triples(shape, rows, cols, vals, dtype=None):
    """Build a canonical COO from triples, summing duplicates.

    Analog of reference ``fromTriples``/``compress`` (Matrix/Sparse.hs:357-369,
    184-255) including its bounds checking with the position of the first
    offending entry (Matrix/Sparse.hs:196-212).
    """
    nr, nc = _shape2(shape)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals, dtype=dtype)
    if not (rows.shape == cols.shape == vals.shape) or rows.ndim != 1:
        raise ValueError("rows, cols, vals must be 1-D arrays of equal length")
    bad_r = np.nonzero((rows < 0) | (rows >= nr))[0]
    if bad_r.size:
        raise ValueError(
            f"row index out of bounds at position {bad_r[0]}: "
            f"{rows[bad_r[0]]} not in [0, {nr})"
        )
    bad_c = np.nonzero((cols < 0) | (cols >= nc))[0]
    if bad_c.size:
        raise ValueError(
            f"column index out of bounds at position {bad_c[0]}: "
            f"{cols[bad_c[0]]} not in [0, {nc})"
        )
    # sort by (row, col), sum duplicates — the "dedupInPlace" step
    # (Matrix/Sparse.hs:257-280) done as sort + segment reduction.
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    if rows.size:
        new_run = np.empty(rows.size, dtype=bool)
        new_run[0] = True
        np.not_equal(rows[1:], rows[:-1], out=new_run[1:])
        new_run[1:] |= cols[1:] != cols[:-1]
        uid = np.cumsum(new_run) - 1
        n_unique = int(uid[-1]) + 1
        out_vals = np.zeros(n_unique, dtype=vals.dtype)
        np.add.at(out_vals, uid, vals)
        rows, cols, vals = rows[new_run], cols[new_run], out_vals
    return COO(
        row=asarray_index(rows),
        col=asarray_index(cols),
        data=jnp.asarray(vals),
        shape=(nr, nc),
        nnz=int(rows.size),
    )


def diag(values, shape=None):
    """Diagonal matrix from a vector (reference ``diag``,
    Matrix/Sparse.hs:652-659)."""
    values = jnp.asarray(values)
    n = int(values.shape[0])
    if shape is None:
        shape = (n, n)
    nr, nc = _shape2(shape)
    if min(nr, nc) != n:
        raise ValueError("diag length must equal min(shape)")
    idx = jnp.arange(n, dtype=index_dtype)
    indptr = jnp.concatenate(
        [
            jnp.arange(n + 1, dtype=index_dtype),
            jnp.full((nr - n,), n, dtype=index_dtype),
        ]
    )
    return CSR(indptr=indptr, indices=idx, data=values, shape=(nr, nc))


def eye(n, dtype=jnp.float32):
    """Identity (reference ``ident``, Matrix/Sparse.hs:669-671)."""
    return diag(jnp.ones((n,), dtype=dtype))


def zeros(shape, dtype=jnp.float32):
    """All-zero matrix with empty arrays (reference ``zeros``,
    Matrix/Sparse.hs:673-679)."""
    nr, nc = _shape2(shape)
    return CSR(
        indptr=jnp.zeros((nr + 1,), dtype=index_dtype),
        indices=jnp.zeros((0,), dtype=index_dtype),
        data=jnp.zeros((0,), dtype=dtype),
        shape=(nr, nc),
    )
