"""Shared plumbing for sparse-format pytree dataclasses.

Design notes (TPU-first):

* Every format is a frozen dataclass registered as a JAX pytree whose array
  fields are leaves and whose shape/nnz metadata are static aux data.  This is
  the analog of the reference's ``Matrix v a`` record
  (reference: sparse-linear/src/Data/Matrix/Sparse.hs:67-76) but designed so a
  whole matrix can flow through ``jit`` / ``vmap`` / ``shard_map`` unchanged.
* All shapes are **static**: `nnz` is compile-time metadata, and device-side
  transformations that cannot shrink buffers keep capacity and pad instead
  (`canonical=False`).  Host-side constructors always produce canonical,
  exact-size, sorted, deduplicated arrays — the invariant set enforced by the
  reference's test harness (sparse-linear/tests/Test/LinearAlgebra.hs:46-67).
* Indices are int32 (TPU-native word width).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype

__all__ = [
    "pytree_dataclass",
    "expand_indptr",
    "compute_indptr",
    "asarray_index",
]


def pytree_dataclass(cls=None, *, meta_fields=()):
    """Register a frozen dataclass as a JAX pytree.

    ``meta_fields`` are static (hashable) auxiliary data; everything else is a
    child leaf.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def asarray_index(x):
    """Coerce to an int32 index array (device or host)."""
    if isinstance(x, (np.ndarray, list, tuple)):
        return jnp.asarray(np.asarray(x), dtype=index_dtype)
    return jnp.asarray(x, dtype=index_dtype)


def expand_indptr(indptr, nnz: int):
    """Pointer array -> per-entry segment ids (CSC "decompress").

    The analog of reference ``decompress`` (Matrix/Sparse.hs:293-299): given
    ``indptr`` of length nseg+1, produce a length-``nnz`` vector whose k-th
    entry is the segment that entry k belongs to.  Implemented as a
    scatter-add of segment boundaries followed by an inclusive cumsum —
    O(nnz), fully on-device, no data-dependent shapes.

    Entries at positions >= indptr[-1] (padding) receive segment id ``nseg``
    (one past the last real segment), so consumers using
    ``segment_sum(num_segments=nseg)`` drop them automatically.
    """
    nseg = indptr.shape[0] - 1
    if nnz == 0:
        return jnp.zeros((0,), dtype=index_dtype)
    ids = (
        jnp.searchsorted(
            indptr, jnp.arange(nnz, dtype=index_dtype), side="right"
        ).astype(index_dtype)
        - 1
    )
    return jnp.clip(ids, 0, nseg)


def compute_indptr(segment_ids, nseg: int, nnz_valid=None):
    """Histogram + exclusive prefix sum => pointer array.

    Analog of reference ``computePtrs`` (Matrix/Sparse.hs:282-291).
    ``segment_ids`` must be in [0, nseg]; id == nseg counts as padding and is
    excluded from the histogram.
    """
    counts = jnp.zeros((nseg,), dtype=index_dtype).at[segment_ids].add(
        jnp.ones_like(segment_ids, dtype=index_dtype), mode="drop"
    )
    return jnp.concatenate(
        [jnp.zeros((1,), dtype=index_dtype), jnp.cumsum(counts).astype(index_dtype)]
    )
