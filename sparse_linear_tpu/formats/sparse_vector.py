"""Sparse vector format.

TPU-native analog of the reference's ``Data.Vector.Sparse``
(reference: sparse-linear/src/Data/Vector/Sparse.hs:29-163): a length, sorted
unique indices, and values.  The reference's scatter-gather SPA workspace
(Data/Vector/Sparse/ScatterGather.hs:29-147) — a dense occupancy bitmap plus
accumulator — maps on TPU to dense scatter-add / segment-sum, which is what
the ops here use.

Semantics preserved:
  * ``from_pairs`` deduplicates by summation (Sparse.hs:49-66).
  * ``+`` / ``-`` / elementwise ``*`` via generalized linear combination
    ``glin`` (Sparse.hs:96-132).
  * Concatenation is the **direct sum** — indices of the right operand are
    offset by the left length (the reference Monoid instance,
    Sparse.hs:134-149) — NOT elementwise addition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import conj as _conj, index_dtype
from sparse_linear_tpu.formats.base import asarray_index, pytree_dataclass

__all__ = ["SparseVector", "from_pairs", "concat"]


@pytree_dataclass(meta_fields=("length",))
class SparseVector:
    indices: jax.Array
    data: jax.Array
    length: int

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def dtype(self):
        return self.data.dtype

    def todense(self):
        out = jnp.zeros((self.length,), dtype=self.data.dtype)
        return out.at[self.indices].add(self.data, mode="drop")

    def map_values(self, f):
        """Reference ``cmap`` (Vector/Sparse.hs:92-94)."""
        return SparseVector(indices=self.indices, data=f(self.data), length=self.length)

    def conj(self):
        return self.map_values(_conj)

    def to_pairs(self):
        """Nonzero iteration as host pairs (reference ``iforM_``,
        Vector/Sparse.hs:151-163)."""
        return list(zip(np.asarray(self.indices).tolist(), np.asarray(self.data).tolist()))

    # -- algebra (reference Num instance, Vector/Sparse.hs:119-132) ---------

    def __add__(self, other):
        return glin(0, lambda c, a: c + a, self, lambda c, b: c + b, other)

    def __sub__(self, other):
        return glin(0, lambda c, a: c + a, self, lambda c, b: c - b, other)

    def __mul__(self, other):
        if isinstance(other, SparseVector):
            # Reference semantics (Vector/Sparse.hs:126): scatter A with (+),
            # then fold B with (*) over the union pattern.
            return glin(0, lambda c, a: c + a, self, lambda c, b: c * b, other)
        return self.map_values(lambda v: v * other)

    def __rmul__(self, other):
        return self.map_values(lambda v: other * v)

    def __neg__(self):
        return self.map_values(jnp.negative)


def from_pairs(length: int, indices, values, dtype=None):
    """Build from (index, value) pairs, summing duplicates
    (reference ``fromPairs``, Vector/Sparse.hs:49-66)."""
    indices = np.asarray(indices)
    values = np.asarray(values, dtype=dtype)
    if indices.shape != values.shape or indices.ndim != 1:
        raise ValueError("indices and values must be 1-D of equal length")
    bad = np.nonzero((indices < 0) | (indices >= length))[0]
    if bad.size:
        raise ValueError(
            f"index out of bounds at position {bad[0]}: "
            f"{indices[bad[0]]} not in [0, {length})"
        )
    order = np.argsort(indices, kind="stable")
    indices, values = indices[order], values[order]
    if indices.size:
        new_run = np.empty(indices.size, dtype=bool)
        new_run[0] = True
        np.not_equal(indices[1:], indices[:-1], out=new_run[1:])
        uid = np.cumsum(new_run) - 1
        out = np.zeros(int(uid[-1]) + 1, dtype=values.dtype)
        np.add.at(out, uid, values)
        indices, values = indices[new_run], out
    return SparseVector(
        indices=asarray_index(indices), data=jnp.asarray(values), length=int(length)
    )


def glin(c0, add_a, a: SparseVector, add_b, b: SparseVector):
    """Generalized combination over the union pattern, with exact reference
    fold semantics (``glin``, Vector/Sparse.hs:96-112): a dense workspace is
    initialized to ``c0``, entries of ``a`` are folded in with
    ``c := add_a(c, av)``, then entries of ``b`` with ``c := add_b(c, bv)``;
    the union pattern is gathered.

    Host-side exact implementation (result nnz is data-dependent); the jit
    path for matrices lives in :mod:`sparse_linear_tpu.ops.linalg`.
    """
    if a.length != b.length:
        raise ValueError(f"length mismatch: {a.length} != {b.length}")
    ai = np.asarray(a.indices)
    bi = np.asarray(b.indices)
    union = np.union1d(ai, bi)
    pos_a = np.searchsorted(union, ai)
    pos_b = np.searchsorted(union, bi)
    in_a = np.zeros(union.shape, dtype=bool)
    in_b = np.zeros(union.shape, dtype=bool)
    in_a[pos_a] = True
    in_b[pos_b] = True
    av = np.zeros(union.shape, dtype=np.asarray(a.data).dtype)
    bv = np.zeros(union.shape, dtype=np.asarray(b.data).dtype)
    av[pos_a] = np.asarray(a.data)
    bv[pos_b] = np.asarray(b.data)
    av, bv = jnp.asarray(av), jnp.asarray(bv)
    c = jnp.full(union.shape, c0, dtype=jnp.result_type(av, bv, c0))
    c = jnp.where(jnp.asarray(in_a), add_a(c, av), c)
    c = jnp.where(jnp.asarray(in_b), add_b(c, bv), c)
    return SparseVector(indices=asarray_index(union), data=c, length=a.length)


def lin(alpha, a: SparseVector, beta, b: SparseVector):
    """alpha*a + beta*b (reference ``lin``, Vector/Sparse.hs:113-117)."""
    return glin(
        0, lambda c, x: c + alpha * x, a, lambda c, y: c + beta * y, b
    )


def concat(a: SparseVector, b: SparseVector):
    """Direct-sum concatenation (the reference Monoid,
    Vector/Sparse.hs:134-149): indices of ``b`` are offset by ``a.length``."""
    return SparseVector(
        indices=jnp.concatenate(
            [a.indices, b.indices + jnp.asarray(a.length, index_dtype)]
        ),
        data=jnp.concatenate([a.data, b.data]),
        length=a.length + b.length,
    )
