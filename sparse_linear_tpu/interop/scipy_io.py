"""Interchange with host-side ecosystems: scipy.sparse, dense arrays, COO
triple dumps.

The analog of the reference's FFI marshalling layer
(reference: sparse-linear/src/Data/Matrix/Sparse/Foreign.hs:24-88):
``withConstMatrix`` exported CSC to raw C arrays, ``fromForeign`` imported and
re-normalized (dedup) them.  Here the foreign format is scipy.sparse / numpy —
the ecosystem boundary of a JAX library.  The import path re-runs
normalization exactly like ``fromForeign`` does (Foreign.hs:74-78), so the
roundtrip invariant (tested there at tests/Sparse.hs:139-145) carries over.

scipy is optional: import errors are raised lazily, only when the scipy
functions are actually used.
"""

from __future__ import annotations

import numpy as np

from sparse_linear_tpu.formats.matrix import COO, CSC, CSR, from_triples
from sparse_linear_tpu.ops.build import trim

__all__ = [
    "to_scipy",
    "from_scipy",
    "to_arrays",
    "from_arrays",
]


def _require_scipy():
    try:
        import scipy.sparse as sp
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "scipy is required for scipy interop; install scipy or use "
            "to_arrays/from_arrays"
        ) from e
    return sp


def to_scipy(mat):
    """Export to the matching scipy.sparse class (csr/csc/coo)."""
    sp = _require_scipy()
    mat = trim(mat) if not isinstance(mat, COO) else mat
    if isinstance(mat, CSR):
        return sp.csr_matrix(
            (np.asarray(mat.data), np.asarray(mat.indices),
             np.asarray(mat.indptr)),
            shape=mat.shape,
        )
    if isinstance(mat, CSC):
        return sp.csc_matrix(
            (np.asarray(mat.data), np.asarray(mat.indices),
             np.asarray(mat.indptr)),
            shape=mat.shape,
        )
    if isinstance(mat, COO):
        mat = trim(mat)
        return sp.coo_matrix(
            (np.asarray(mat.data),
             (np.asarray(mat.row), np.asarray(mat.col))),
            shape=mat.shape,
        )
    raise TypeError(f"unsupported matrix type: {type(mat)}")


def from_scipy(sp_mat, fmt: str | None = None):
    """Import any scipy.sparse matrix, re-normalizing (sort + dedup-by-sum)
    like the reference ``fromForeign`` (Foreign.hs:43-88).  ``fmt`` overrides
    the output format; default mirrors the input (csr/csc/coo)."""
    _require_scipy()
    coo = sp_mat.tocoo()
    out = from_triples(
        (int(coo.shape[0]), int(coo.shape[1])),
        coo.row, coo.col, coo.data,
    )
    if fmt is None:
        fmt = getattr(sp_mat, "format", "coo")
    if fmt == "coo":
        return out
    if fmt == "csr":
        return out.tocsr()
    if fmt == "csc":
        return out.tocsc()
    raise ValueError(f"unknown format: {fmt}")


def to_arrays(mat):
    """Export to raw arrays: (kind, shape, arrays...) — the direct analog of
    ``withConstMatrix``'s (nrows, ncols, ptrs, indices, values) contract
    (Foreign.hs:24-41), without a scipy dependency."""
    if isinstance(mat, (CSR, CSC)):
        mat = trim(mat)
        kind = "csr" if isinstance(mat, CSR) else "csc"
        return {
            "format": kind,
            "shape": mat.shape,
            "indptr": np.asarray(mat.indptr),
            "indices": np.asarray(mat.indices),
            "data": np.asarray(mat.data),
        }
    if isinstance(mat, COO):
        mat = trim(mat)
        return {
            "format": "coo",
            "shape": mat.shape,
            "row": np.asarray(mat.row),
            "col": np.asarray(mat.col),
            "data": np.asarray(mat.data),
        }
    raise TypeError(f"unsupported matrix type: {type(mat)}")


def from_arrays(d):
    """Inverse of :func:`to_arrays`; re-normalizes on import."""
    fmt = d["format"]
    shape = tuple(d["shape"])
    if fmt == "coo":
        return from_triples(shape, d["row"], d["col"], d["data"])
    if fmt in ("csr", "csc"):
        indptr = np.asarray(d["indptr"])
        indices = np.asarray(d["indices"])
        major = np.repeat(np.arange(len(indptr) - 1), np.diff(indptr))
        if fmt == "csr":
            out = from_triples(shape, major, indices, d["data"])
            return out.tocsr()
        out = from_triples(shape, indices, major, d["data"])
        return out.tocsc()
    raise ValueError(f"unknown format: {fmt}")
