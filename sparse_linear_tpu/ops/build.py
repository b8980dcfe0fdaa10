"""Construction / normalization pipeline: COO -> CSR/CSC, fully on-device.

TPU-native replacement for the reference's ``compress`` path
(reference: sparse-linear/src/Data/Matrix/Sparse.hs:184-291): where the
reference runs an introsort + per-column in-place dedup in ST
(Matrix/Sparse.hs:219,224-225,257-280), this uses the XLA-friendly
sort -> run-detection -> segment-sum pipeline with static shapes:

  1. lexsort entries by (major, minor)          [jnp.lexsort on device]
  2. mark run starts, prefix-sum run ids        [the "dedupInPlace" analog]
  3. scatter-add values by run id               [duplicate summation]
  4. histogram + exclusive scan -> indptr       [the "computePtrs" analog,
                                                 Matrix/Sparse.hs:282-291]

Capacity is preserved (jit cannot shrink buffers); the compacted unique
entries occupy the front, the tail is sentinel padding past ``indptr[-1]``.
Host-side ``trim`` cuts buffers to the exact nnz for canonical matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.base import compute_indptr
from sparse_linear_tpu.formats.matrix import COO, CSC, CSR

__all__ = ["coo_to_csr", "coo_to_csc", "reorder_major", "trim", "from_dense"]


def _sort_dedup(major, minor, data, nmajor: int, nminor: int):
    """Sort by (major, minor), sum duplicate coordinates.

    Returns (major, minor, data, indptr) with unique entries compacted to the
    front and sentinel padding (major == nmajor, minor == nminor, value 0)
    behind them.  Entries arriving with major >= nmajor are treated as padding.
    """
    cap = data.shape[0]
    if cap == 0:
        return (
            major,
            minor,
            data,
            jnp.zeros((nmajor + 1,), dtype=index_dtype),
        )
    # Normalize incoming sentinels so they form a single run at the end.
    is_pad = major >= nmajor
    major = jnp.where(is_pad, nmajor, major).astype(index_dtype)
    minor = jnp.where(is_pad, nminor, minor).astype(index_dtype)
    data = jnp.where(is_pad, 0, data)

    perm = jnp.lexsort((minor, major))
    major, minor, data = major[perm], minor[perm], data[perm]

    new_run = jnp.concatenate(
        [
            jnp.ones((1,), dtype=bool),
            (major[1:] != major[:-1]) | (minor[1:] != minor[:-1]),
        ]
    )
    uid = (jnp.cumsum(new_run) - 1).astype(index_dtype)

    out_major = jnp.full((cap,), nmajor, dtype=index_dtype).at[uid].set(major)
    out_minor = jnp.full((cap,), nminor, dtype=index_dtype).at[uid].set(minor)
    out_data = jnp.zeros((cap,), dtype=data.dtype).at[uid].add(data)

    indptr = compute_indptr(out_major, nmajor)
    return out_major, out_minor, out_data, indptr


def coo_to_csr(coo: COO) -> CSR:
    """COO -> CSR with dedup-by-sum (reference ``compress``,
    Matrix/Sparse.hs:184-255, row-major flavor)."""
    nr, nc = coo.shape
    _, minor, data, indptr = _sort_dedup(coo.row, coo.col, coo.data, nr, nc)
    out = CSR(indptr=indptr, indices=minor, data=data, shape=coo.shape)
    if coo.nnz is not None and not isinstance(data, jax.core.Tracer):
        out = trim(out)
    return out


def coo_to_csc(coo: COO) -> CSC:
    """COO -> CSC (the reference's native orientation)."""
    return coo_to_csr(coo.T).T


def reorder_major(mat, to: str):
    """Explicit CSR<->CSC conversion by re-sorting (reference ``transpose``,
    Matrix/Sparse.hs:301-329, which is exactly the change-of-major-order pass)."""
    coo = mat.tocoo()
    if to == "csr":
        return coo_to_csr(coo)
    if to == "csc":
        return coo_to_csc(coo)
    raise ValueError(f"unknown target format: {to}")


def trim(mat):
    """Host-side: cut padding so capacity == nnz (canonical form)."""
    if isinstance(mat, CSR):
        n = int(mat.indptr[-1])
        return CSR(
            indptr=mat.indptr,
            indices=mat.indices[:n],
            data=mat.data[:n],
            shape=mat.shape,
        )
    if isinstance(mat, CSC):
        return trim(mat.T).T
    if isinstance(mat, COO):
        r = np.asarray(mat.row)
        valid = r < mat.shape[0]
        n = int(np.sum(valid))
        # slicing [:n] is only correct when the padding forms a SUFFIX (the
        # _sort_dedup invariant); a hand-built COO with interior sentinels
        # would silently drop real entries
        if n and not valid[:n].all():
            raise ValueError(
                "trim: COO padding (row >= nrows) must be a suffix — "
                "found sentinel entries interleaved with real ones; "
                "normalize via tocsr()/coo_to_csr first"
            )
        return COO(
            row=mat.row[:n],
            col=mat.col[:n],
            data=mat.data[:n],
            shape=mat.shape,
            nnz=n,
        )
    raise TypeError(type(mat))


def from_dense(x, fmt: str = "csr"):
    """Dense -> sparse (host-side; exact nnz).  Inverse of ``todense``/the
    reference's ``pack`` (Matrix/Sparse.hs:681-689)."""
    x = np.asarray(x)
    if x.ndim != 2:
        raise ValueError("from_dense expects a 2-D array")
    r, c = np.nonzero(x)
    coo = COO(
        row=jnp.asarray(r, index_dtype),
        col=jnp.asarray(c, index_dtype),
        data=jnp.asarray(x[r, c]),
        shape=(int(x.shape[0]), int(x.shape[1])),
        nnz=int(r.size),
    )
    if fmt == "coo":
        return coo
    if fmt == "csr":
        return coo.tocsr()
    if fmt == "csc":
        return coo.tocsc()
    raise ValueError(f"unknown format: {fmt}")
