"""BLAS-like sparse linear algebra over the interchange formats.

TPU-native replacements for the reference's hot ops:

* ``spmv`` / ``axpy``: the reference's column-major scattered loop
  (reference: sparse-linear/src/Data/Matrix/Sparse.hs:433-471) becomes a
  gather + segment-sum (CSR) or scatter-add (CSC/COO) — vector-unit friendly,
  one XLA fusion, no data-dependent control flow.  High-performance tiled
  variants live in :mod:`sparse_linear_tpu.kernels`.
* ``spmm``: sparse x dense-matrix — the reference has this only as dead code
  (`mulM`, Matrix/Sparse.hs:473-498) and as the FEAST driver's multiply
  (feast/src/.../Feast.hs:203-208); on TPU it is a first-class op because the
  MXU wants the dense right-hand side.
* ``glin`` / ``lin`` / ``add``: the SPA union-merge (Matrix/Sparse.hs:401-431)
  as a concat -> lexsort -> run-detect -> masked-fold pipeline, fully jittable
  with static capacity nnz(A)+nnz(B).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.base import compute_indptr
from sparse_linear_tpu.formats.matrix import COO, CSC, CSR

__all__ = ["spmv", "axpy", "spmm", "glin", "lin", "add", "scale"]


def _valid_mask(mat):
    """Boolean mask of valid (non-padding) entries."""
    if isinstance(mat, COO):
        return mat.row < mat.shape[0]
    return jnp.arange(mat.capacity, dtype=index_dtype) < mat.indptr[-1]


def _coords(mat):
    """(row_ids, col_ids) per entry; padding entries map out of range."""
    if isinstance(mat, COO):
        return mat.row, mat.col
    if isinstance(mat, CSR):
        return mat.row_ids(), mat.indices
    if isinstance(mat, CSC):
        return mat.indices, mat.col_ids()
    raise TypeError(type(mat))


def spmv(mat, x):
    """y = A @ x for dense ``x`` (reference ``mulV``,
    Matrix/Sparse.hs:464-471 — the README's headline op)."""
    x = jnp.asarray(x)
    nr, nc = mat.shape
    if x.shape[0] != nc:
        raise ValueError(f"spmv: dimension mismatch {mat.shape} @ {x.shape}")
    rows, cols = _coords(mat)
    contrib = jnp.where(
        _valid_mask(mat), mat.data * x[jnp.clip(cols, 0, nc - 1)], 0
    )
    y = jnp.zeros((nr,), dtype=jnp.result_type(mat.data, x))
    return y.at[rows].add(contrib, mode="drop")


def axpy(mat, x, y):
    """y + A @ x (reference ``axpy``/``axpy_``, Matrix/Sparse.hs:433-462)."""
    return jnp.asarray(y) + spmv(mat, x)


def spmm(mat, b):
    """A @ B for dense B of shape (ncols, k) (reference ``mulM``,
    Matrix/Sparse.hs:473-498, made first-class)."""
    b = jnp.asarray(b)
    nr, nc = mat.shape
    if b.shape[0] != nc:
        raise ValueError(f"spmm: dimension mismatch {mat.shape} @ {b.shape}")
    rows, cols = _coords(mat)
    contrib = jnp.where(
        _valid_mask(mat)[:, None],
        mat.data[:, None] * b[jnp.clip(cols, 0, nc - 1), :],
        0,
    )
    y = jnp.zeros((nr,) + b.shape[1:], dtype=jnp.result_type(mat.data, b))
    return y.at[rows].add(contrib, mode="drop")


def scale(mat, alpha):
    """alpha * A elementwise (reference ``scale``, Matrix/Sparse.hs:119-121)."""
    return mat.map_values(lambda v: v * alpha)


def glin(c0, add_a, mat_a, add_b, mat_b):
    """Generalized elementwise combine over the union pattern with the
    reference's fold semantics (``glin``, Matrix/Sparse.hs:401-424): a
    workspace initialized to ``c0``; where A has an entry,
    ``c := add_a(c, a)``; then where B has an entry, ``c := add_b(c, b)``.

    Jittable: output capacity is nnz(A) + nnz(B); unique entries are compacted
    to the front, sentinel padding behind (see ops.build).  Returns CSR.
    """
    if mat_a.shape != mat_b.shape:
        raise ValueError(f"glin: shape mismatch {mat_a.shape} vs {mat_b.shape}")
    nr, nc = mat_a.shape
    ra, ca = _coords(mat_a)
    rb, cb = _coords(mat_b)
    va = jnp.where(_valid_mask(mat_a), mat_a.data, 0)
    vb = jnp.where(_valid_mask(mat_b), mat_b.data, 0)
    na, nb = va.shape[0], vb.shape[0]
    cap = na + nb
    if cap == 0:
        from sparse_linear_tpu.formats.matrix import zeros

        return zeros((nr, nc), dtype=jnp.result_type(va, vb))

    rows = jnp.concatenate([ra, rb]).astype(index_dtype)
    colsj = jnp.concatenate([ca, cb]).astype(index_dtype)
    tag_b = jnp.concatenate(
        [jnp.zeros((na,), bool), jnp.ones((nb,), bool)]
    )
    vals = jnp.concatenate(
        [va.astype(jnp.result_type(va, vb)), vb.astype(jnp.result_type(va, vb))]
    )
    # normalize padding to a single sentinel coordinate
    is_pad = rows >= nr
    rows = jnp.where(is_pad, nr, rows)
    colsj = jnp.where(is_pad, nc, colsj)

    perm = jnp.lexsort((colsj, rows))
    rows, colsj, vals, tag_b = rows[perm], colsj[perm], vals[perm], tag_b[perm]
    new_run = jnp.concatenate(
        [jnp.ones((1,), bool), (rows[1:] != rows[:-1]) | (colsj[1:] != colsj[:-1])]
    )
    uid = (jnp.cumsum(new_run) - 1).astype(index_dtype)

    # per-unique-slot A/B values + occupancy
    def slot_scatter(select, values, fill):
        idx = jnp.where(select, uid, cap)
        return jnp.full((cap,), fill, dtype=values.dtype).at[idx].set(
            values, mode="drop"
        )

    a_val = slot_scatter(~tag_b, vals, jnp.zeros((), vals.dtype))
    b_val = slot_scatter(tag_b, vals, jnp.zeros((), vals.dtype))
    a_occ = slot_scatter(~tag_b, jnp.ones((cap,), bool), False)
    b_occ = slot_scatter(tag_b, jnp.ones((cap,), bool), False)
    out_r = jnp.full((cap,), nr, dtype=index_dtype).at[uid].set(rows)
    out_c = jnp.full((cap,), nc, dtype=index_dtype).at[uid].set(colsj)

    c = jnp.full((cap,), c0, dtype=vals.dtype)
    c = jnp.where(a_occ, add_a(c, a_val), c)
    c = jnp.where(b_occ, add_b(c, b_val), c)
    c = jnp.where(out_r < nr, c, 0)

    indptr = compute_indptr(out_r, nr)
    out = CSR(indptr=indptr, indices=out_c, data=c, shape=(nr, nc))
    if not isinstance(c, jax.core.Tracer):
        from sparse_linear_tpu.ops.build import trim

        out = trim(out)
    return out


def lin(alpha, mat_a, beta, mat_b):
    """alpha*A + beta*B (reference ``lin``, Matrix/Sparse.hs:426-431)."""
    return glin(
        0, lambda c, a: c + alpha * a, mat_a, lambda c, b: c + beta * b, mat_b
    )


def add(mat_a, mat_b):
    """A + B (reference Num ``+``, Matrix/Sparse.hs:100-113)."""
    return lin(1, mat_a, 1, mat_b)


def elementwise_mul(mat_a, mat_b):
    """Elementwise product with the reference's union-fold semantics
    (slots only in A keep A's value; see Vector/Sparse.hs:126)."""
    return glin(0, lambda c, a: c + a, mat_a, lambda c, b: c * b, mat_b)
