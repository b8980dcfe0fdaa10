"""Format-invariant checker.

Port of the *idea* of the reference's property-test harness ``checkMatrix``
(reference: sparse-linear/tests/Test/LinearAlgebra.hs:40-67), promoted from
test helper to library API so callers can validate any constructor output:

  * pointer array has length nseg+1, starts at 0, is nondecreasing
  * len(values) == len(indices) == capacity >= indptr[-1]
  * minor indices strictly increasing within each segment (sorted + deduped)
  * all indices within bounds

Raises ``InvariantError`` with the first offending position, mirroring the
reference's positioned error reporting (Matrix/Sparse.hs:196-212).
"""

from __future__ import annotations

import numpy as np

from sparse_linear_tpu.formats.matrix import COO, CSC, CSR

__all__ = ["InvariantError", "check_matrix", "nondecreasing", "increasing"]


class InvariantError(AssertionError):
    pass


def nondecreasing(x) -> bool:
    """Reference ``nondecreasing`` (Data/Vector/Util.hs:72-76)."""
    x = np.asarray(x)
    return bool(np.all(x[1:] >= x[:-1])) if x.size else True


def increasing(x) -> bool:
    """Reference ``increasing`` (Data/Vector/Util.hs:77-80)."""
    x = np.asarray(x)
    return bool(np.all(x[1:] > x[:-1])) if x.size else True


def _check_compressed(indptr, indices, data, nseg, minor_dim, kind):
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    data = np.asarray(data)
    if indptr.shape[0] != nseg + 1:
        raise InvariantError(
            f"{kind}: indptr length {indptr.shape[0]} != nseg+1 = {nseg + 1}"
        )
    if indptr[0] != 0:
        raise InvariantError(f"{kind}: indptr[0] = {indptr[0]} != 0")
    if not nondecreasing(indptr):
        bad = int(np.nonzero(indptr[1:] < indptr[:-1])[0][0])
        raise InvariantError(f"{kind}: indptr decreases at position {bad}")
    nnz = int(indptr[-1])
    if indices.shape[0] != data.shape[0]:
        raise InvariantError(
            f"{kind}: len(indices) {indices.shape[0]} != len(values) {data.shape[0]}"
        )
    if indices.shape[0] < nnz:
        raise InvariantError(
            f"{kind}: capacity {indices.shape[0]} < indptr[-1] = {nnz}"
        )
    valid = indices[:nnz]
    if valid.size:
        bad = np.nonzero((valid < 0) | (valid >= minor_dim))[0]
        if bad.size:
            raise InvariantError(
                f"{kind}: index out of bounds at entry {int(bad[0])}: "
                f"{valid[int(bad[0])]} not in [0, {minor_dim})"
            )
    if nnz > 1:
        seg_ids = np.repeat(np.arange(nseg), np.diff(indptr))
        same_seg = seg_ids[1:] == seg_ids[:-1]
        bad = np.nonzero(same_seg & (valid[1:] <= valid[:-1]))[0]
        if bad.size:
            raise InvariantError(
                f"{kind}: indices not strictly increasing in segment "
                f"{int(seg_ids[int(bad[0])])} (entry {int(bad[0]) + 1})"
            )
    return True


def check_matrix(m) -> bool:
    """Validate all canonical-format invariants; True or raises InvariantError."""
    nr, nc = m.shape
    if isinstance(m, CSR):
        return _check_compressed(m.indptr, m.indices, m.data, nr, nc, "CSR")
    if isinstance(m, CSC):
        return _check_compressed(m.indptr, m.indices, m.data, nc, nr, "CSC")
    if isinstance(m, COO):
        row = np.asarray(m.row)
        col = np.asarray(m.col)
        data = np.asarray(m.data)
        if not (row.shape == col.shape == data.shape):
            raise InvariantError("COO: row/col/data length mismatch")
        n = m.nnz if m.nnz is not None else row.shape[0]
        r, c = row[:n], col[:n]
        bad = np.nonzero((r < 0) | (r >= nr))[0]
        if bad.size:
            raise InvariantError(
                f"COO: row out of bounds at entry {int(bad[0])}: {r[int(bad[0])]}"
            )
        bad = np.nonzero((c < 0) | (c >= nc))[0]
        if bad.size:
            raise InvariantError(
                f"COO: col out of bounds at entry {int(bad[0])}: {c[int(bad[0])]}"
            )
        # canonical COO: sorted by (row, col) with no duplicates
        key = r.astype(np.int64) * nc + c
        if not increasing(key):
            raise InvariantError("COO: entries not sorted/unique by (row, col)")
        # padding region must be sentinel
        if m.nnz is not None and row.shape[0] > n:
            if not (np.all(row[n:] == nr) and np.all(col[n:] == nc)):
                raise InvariantError("COO: padding entries must be sentinel (nr, nc)")
        return True
    raise TypeError(f"unknown matrix type: {type(m)}")
