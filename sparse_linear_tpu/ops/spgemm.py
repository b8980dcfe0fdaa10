"""SpGEMM: sparse x sparse matrix multiply.

The reference computes C = A*B with Gustavson's column-by-column algorithm
over a dense scatter-gather accumulator (reference:
sparse-linear/src/Data/Matrix/Sparse.hs:691-702 driving
Data/Vector/Sparse/ScatterGather.hs:57-147).  Its gather is O(nrows) per
column — a simplicity/perf trade noted in SURVEY.md §3.3.

The TPU-native design splits symbolic and numeric phases (the same staging
the direct solver uses):

  * ``plan`` (host, per sparsity pattern): expansion offsets — for every entry
    (i,k) of A, the k-th row of B contributes row_nnz_B[k] products; the
    exclusive scan of those counts gives each A-entry its slot range in the
    flat product stream.  O(nnz(A)) host work, reusable across values.
  * ``numeric`` (device, jittable): materialize all T products with two
    gathers, then sort + segment-sum dedup (ops.build pipeline) to canonical
    CSR.  Entirely sort/scan/scatter — no data-dependent shapes, since T is
    static in the plan.

This replaces the SPA's O(nrows)-per-column gather with an O(T log T) sort
that XLA executes as large vector passes — the right trade on a machine with
8x128 vector lanes and no efficient per-element scatter loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.base import pytree_dataclass
from sparse_linear_tpu.formats.matrix import COO, CSR
from sparse_linear_tpu.ops.build import coo_to_csr, trim

__all__ = ["SpgemmPlan", "spgemm_plan", "spgemm_apply", "spgemm"]


@pytree_dataclass(meta_fields=("n_products", "shape"))
class SpgemmPlan:
    """Reusable symbolic expansion plan for a fixed (pattern(A), pattern(B))."""

    slot_start: jax.Array  # (nnz_a + 1,) exclusive scan of products per A entry
    n_products: int
    shape: tuple


def spgemm_plan(a: CSR, b: CSR) -> SpgemmPlan:
    """Host-side symbolic phase (analog of reusable ``analyze`` artifacts,
    cf. Umfpack.hs:60-69 staging)."""
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"spgemm: inner dimension mismatch {a.shape} x {b.shape}")
    a = trim(a.tocsr())
    b = trim(b.tocsr())
    row_nnz_b = np.diff(np.asarray(b.indptr))
    counts = row_nnz_b[np.asarray(a.indices)]
    slot_start = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)
    return SpgemmPlan(
        slot_start=jnp.asarray(slot_start),
        n_products=int(slot_start[-1]),
        shape=(a.shape[0], b.shape[1]),
    )


def spgemm_apply(plan: SpgemmPlan, a: CSR, b: CSR) -> CSR:
    """Device numeric phase (jittable).  ``a``/``b`` must be canonical and
    match the plan's patterns."""
    nr, nc = plan.shape
    t = plan.n_products
    if t == 0:
        from sparse_linear_tpu.formats.matrix import zeros

        return zeros(plan.shape, dtype=jnp.result_type(a.data, b.data))
    p = jnp.arange(t, dtype=index_dtype)
    # which A entry does product p belong to
    e = (
        jnp.searchsorted(plan.slot_start, p, side="right").astype(index_dtype) - 1
    )
    within = p - plan.slot_start[e]
    a_row = a.row_ids()[e]
    a_col = a.indices[e]
    a_val = a.data[e]
    b_pos = b.indptr[a_col] + within
    out = COO(
        row=a_row,
        col=b.indices[b_pos],
        data=a_val * b.data[b_pos],
        shape=plan.shape,
        nnz=None,
    )
    return coo_to_csr(out)


def spgemm(a, b) -> CSR:
    """C = A @ B (reference Num ``*`` -> ``mm``, Matrix/Sparse.hs:109,691-702).

    Host-driven: computes the expansion plan from the concrete patterns, runs
    the device numeric phase, and trims to canonical form.  Inside ``jit``,
    precompute the plan and call :func:`spgemm_apply`.
    """
    a = trim(a.tocsr())
    b = trim(b.tocsr())
    plan = spgemm_plan(a, b)
    out = spgemm_apply(plan, a, b)
    return trim(out)
