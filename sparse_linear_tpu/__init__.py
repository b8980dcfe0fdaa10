"""sparse_linear_tpu — a TPU-native sparse linear algebra framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference Haskell stack ttuegel/sparse-linear (see SURVEY.md):

  * formats/ — COO/CSR/CSC (+ structured DIA/ELL/BSR) pytree containers and
    sparse vectors, with validated canonical invariants.
  * ops/     — construction (sort/segment-sum dedup), structural algebra
    (concat, blocks, Kronecker), and BLAS-like SpMV/SpMM/SpGEMM.
  * kernels/ — Pallas TPU kernels for the hot paths.
  * solve/   — sparse direct LU (analyze/factor/solve staged artifacts),
    replacing the reference's UMFPACK binding.
  * eig/     — FEAST-style contour-integral interval eigensolver, replacing
    the reference's FEAST binding.
  * dist/    — multi-chip sharding: row-partitioned SpMV, distributed
    quadrature, over jax.sharding meshes with XLA collectives.
  * interop/ — scipy.sparse / dense interchange.
"""

from sparse_linear_tpu import dtypes
from sparse_linear_tpu.formats.matrix import (
    COO,
    CSC,
    CSR,
    diag,
    eye,
    from_triples,
    zeros,
)
from sparse_linear_tpu.formats.sparse_vector import SparseVector, from_pairs
from sparse_linear_tpu.formats.validate import InvariantError, check_matrix
from sparse_linear_tpu.ops.build import from_dense, trim
from sparse_linear_tpu.ops.linalg import add, axpy, elementwise_mul, glin, lin, scale, spmm, spmv
from sparse_linear_tpu.ops.structure import (
    block_diag,
    from_columns,
    from_rows,
    to_columns,
    to_rows,
    from_blocks,
    from_blocks_diag,
    hcat,
    kron,
    outer,
    submatrix,
    take_diag,
    vcat,
)

__version__ = "0.1.0"

__all__ = [
    "COO",
    "CSR",
    "CSC",
    "SparseVector",
    "InvariantError",
    "check_matrix",
    "from_triples",
    "from_pairs",
    "from_dense",
    "trim",
    "diag",
    "eye",
    "zeros",
    "add",
    "axpy",
    "glin",
    "lin",
    "scale",
    "spmv",
    "spmm",
    "elementwise_mul",
    "vcat",
    "hcat",
    "from_blocks",
    "from_blocks_diag",
    "block_diag",
    "kron",
    "outer",
    "submatrix",
    "take_diag",
    "to_columns",
    "from_columns",
    "to_rows",
    "from_rows",
    "dtypes",
]
