"""Automatic fast-format selection.

The interchange formats (COO/CSR/CSC) are correct everywhere but their
scatter/gather SpMV is slow on TPU (XLA serializes 1-D scatter-adds).  The
structured formats are the fast path; this module picks one from pattern
statistics:

  * DIA  — when the pattern is a small set of diagonals (stencils).
  * WELL — any other pattern: the windowed gathered-ELL Pallas kernel
    (formats/well.py) is the only fast unstructured SpMV on TPU (XLA's
    gather runs ~1 GB/s; WELL streams at HBM bandwidth).  Complex matrices
    are stored as two real planes sharing one packing.
  * ELL / BSR — available on request (fmt= overrides).

``to_fast_format(mat)`` returns an equivalent structured matrix whose ``@``
runs the corresponding kernel.
"""

from __future__ import annotations

import numpy as np

from sparse_linear_tpu.formats.matrix import CSR
from sparse_linear_tpu.formats.structured import (
    csr_to_bsr,
    csr_to_dia,
    csr_to_ell,
)
from sparse_linear_tpu.formats.well import csr_to_well
from sparse_linear_tpu.ops.build import trim

__all__ = ["to_fast_format", "recommend_format"]


def recommend_format(mat: CSR, max_diags: int = 32,
                     ell_slack: float = 2.0) -> str:
    """Inspect the pattern and name the best structured format."""
    mat = trim(mat.tocsr())
    nr, nc = mat.shape
    rows = np.asarray(mat.row_ids(), dtype=np.int64)
    cols = np.asarray(mat.indices, dtype=np.int64)
    if rows.size == 0:
        return "dia"
    ndiags = np.unique(cols - rows).size
    if ndiags <= max_diags:
        return "dia"
    return "well"


def to_fast_format(mat: CSR, **opts):
    """Convert to the recommended structured format (host-side)."""
    kind = recommend_format(mat, **opts)
    mat = mat.tocsr()
    if kind == "dia":
        return csr_to_dia(mat, max_diags=2 ** 31)
    if kind == "well":
        return csr_to_well(mat)
    if kind == "ell":
        return csr_to_ell(mat)
    return csr_to_bsr(mat, block_shape=(8, 128))
