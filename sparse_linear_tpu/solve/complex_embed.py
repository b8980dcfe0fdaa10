"""Complex solves through a real 2n x 2n embedding — the TPU complex path.

The TPU compiler supports neither complex128 nor complex gather/scatter, so
the shifted complex systems FEAST needs (reference: the zfeast path,
feast/src/Numeric/LinearAlgebra/Feast/Internal.hs:61-65, whose factorizations
run in complex arithmetic) cannot use the native-complex multifrontal there.

Instead, exploit the ring isomorphism  a + ib  ->  [[a, -b], [b, a]]:

* ``embed_matrix`` maps a complex sparse matrix to a real matrix on the
  doubled index set (node i -> rows/cols 2i, 2i+1, keeping the 2x2 blocks
  adjacent so fill-reducing orderings of the original graph carry over).
* ``R(AB) = R(A) R(B)`` and ``R(A)^T = R(A^H)``, so the real multifrontal
  LU of the embedding — including its trans solve — performs exactly the
  complex factorization/solves, at 2x the flops of native complex
  arithmetic and full TPU support (f32 fronts + f64 refinement).
* ``embed_vec`` / ``unembed_vec`` interleave/deinterleave RHS blocks.

``embed_entry_order`` returns, for a given complex pattern, the gather map
producing the embedded matrix's canonical CSR data from the 4-fold expanded
complex values — so FEAST can stack many shifted value-sets (ne, nnz) and
embed them into (ne, 4*nnz) entirely on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype, real_of
from sparse_linear_tpu.formats.matrix import CSR
from sparse_linear_tpu.ops.build import trim

__all__ = [
    "embed_perm",
    "embed_pattern",
    "embed_data",
    "embed_matrix",
    "embed_vec",
    "unembed_vec",
]


def embed_pattern(mat: CSR):
    """Embedded real pattern + the device gather map for values.

    Returns (pattern_csr_2n, perm) where the embedded canonical CSR data
    equals ``expanded[perm]`` with ``expanded`` the per-entry blocks
    [re, -im, im, re] laid out as 4 consecutive slots per complex entry.
    """
    mat = trim(mat.tocsr())
    n = mat.shape[0]
    rows = np.asarray(mat.row_ids(), dtype=np.int64)
    cols = np.asarray(mat.indices, dtype=np.int64)
    nnz = rows.shape[0]
    # expanded entry k*4 + t, t in {0: (2i,2j), 1: (2i,2j+1), 2: (2i+1,2j),
    #                              3: (2i+1,2j+1)}
    er = np.repeat(2 * rows, 4) + np.tile([0, 0, 1, 1], nnz)
    ec = np.repeat(2 * cols, 4) + np.tile([0, 1, 0, 1], nnz)
    order = np.lexsort((ec, er))
    indptr = np.zeros(2 * n + 1, dtype=np.int64)
    np.add.at(indptr, er[order] + 1, 1)
    indptr = np.cumsum(indptr)
    pattern = CSR(
        indptr=jnp.asarray(indptr, index_dtype),
        indices=jnp.asarray(ec[order], index_dtype),
        data=jnp.zeros(4 * nnz, real_of(mat.dtype)),
        shape=(2 * n, 2 * n),
    )
    return pattern, jnp.asarray(order, index_dtype)


def embed_data(values, perm):
    """Complex values (..., nnz) -> embedded real data (..., 4*nnz) in the
    canonical order of the embedded pattern.

    numpy input stays on host (complex device ops are unsupported — and on
    the TPU remote-compile path they hang rather than error); jnp input runs
    as pure gathers (for real dtypes / CPU complex).
    """
    if isinstance(values, np.ndarray):
        re = np.real(values)
        im = np.imag(values)
        expanded = np.stack([re, -im, im, re], axis=-1).reshape(
            values.shape[:-1] + (values.shape[-1] * 4,)
        )
        return expanded[..., np.asarray(perm)]
    values = jnp.asarray(values)
    re = jnp.real(values)
    im = jnp.imag(values)
    expanded = jnp.stack([re, -im, im, re], axis=-1).reshape(
        values.shape[:-1] + (values.shape[-1] * 4,)
    )
    return jnp.take(expanded, perm, axis=-1)


def embed_matrix(mat: CSR):
    """One-shot: complex sparse matrix -> embedded real CSR."""
    mat = trim(mat.tocsr())
    pattern, perm = embed_pattern(mat)
    return CSR(
        indptr=pattern.indptr,
        indices=pattern.indices,
        data=embed_data(mat.data, perm),
        shape=pattern.shape,
    )


def embed_vec(b):
    """Complex (n, ...) -> real (2n, ...) interleaved [re0, im0, re1, ...]."""
    b = jnp.asarray(b)
    re, im = jnp.real(b), jnp.imag(b)
    return jnp.stack([re, im], axis=1).reshape((2 * b.shape[0],) + b.shape[1:])


def unembed_vec(x):
    """Inverse of :func:`embed_vec`."""
    x = jnp.asarray(x)
    y = x.reshape((x.shape[0] // 2, 2) + x.shape[1:])
    return jax.lax.complex(y[:, 0], y[:, 1])


def split_embedded(xe):
    """Embedded (2n, ...) -> (re, im) halves, each (n, ...)."""
    return xe[0::2], xe[1::2]


def merge_embedded(re, im):
    """Inverse of :func:`split_embedded` (interleave rows)."""
    return jnp.stack([re, im], axis=1).reshape(
        (2 * re.shape[0],) + re.shape[1:]
    )


def gram_embedded(ae, be):
    """Complex Gram block A^H B from embedded operands, as real matmuls.

    ae, be: embedded (2n, m).  Returns (re, im) of the complex (m, m)
    product — every flop is a real MXU matmul, so the complex Rayleigh-Ritz
    algebra runs on TPUs with no complex device ops.
    """
    ar, ai = split_embedded(ae)
    br, bi = split_embedded(be)
    re = ar.T @ br + ai.T @ bi
    im = ar.T @ bi - ai.T @ br
    return re, im


def rmul_embedded(xe, c_re, c_im):
    """Right-multiply an embedded (2n, m) block by a complex (m, k) matrix
    given as (c_re, c_im); returns the embedded (2n, k) result."""
    xr, xi = split_embedded(xe)
    re = xr @ c_re - xi @ c_im
    im = xr @ c_im + xi @ c_re
    return merge_embedded(re, im)


def embed_perm(perm):
    """Elimination order for the embedded graph from an order of the original
    graph: node i's (real, imag) pair stays adjacent, preserving the
    fill-reducing quality of the base ordering."""
    perm = np.asarray(perm, dtype=np.int64)
    out = np.empty(2 * perm.shape[0], dtype=np.int32)
    out[0::2] = 2 * perm
    out[1::2] = 2 * perm + 1
    return out
