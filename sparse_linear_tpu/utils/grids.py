"""Structured-grid model operators: 1D/2D/3D Laplacians (Poisson systems).

The benchmark problem family (BASELINE.md configs 1-5).  Generators build
directly in DIA (the fast format) and CSR (the interchange format) with
vectorized host construction — no per-entry Python loops.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.dtypes import index_dtype
from sparse_linear_tpu.formats.matrix import CSR
from sparse_linear_tpu.formats.structured import DIA

__all__ = ["laplacian_1d", "poisson_2d", "poisson_3d"]


def _stencil_dia(n: int, offsets, boundary_masks, values, dtype) -> DIA:
    """DIA from per-offset constant values with boundary masking."""
    data = np.zeros((len(offsets), n), dtype=dtype)
    for d, (off, mask, v) in enumerate(zip(offsets, boundary_masks, values)):
        col = np.full(n, v, dtype=dtype)
        col[~mask] = 0
        # clip to matrix: rows where i+off outside [0, n) must be 0
        i = np.arange(n)
        col[(i + off < 0) | (i + off >= n)] = 0
        data[d] = col
    return DIA(data=jnp.asarray(data), shape=(n, n), offsets=tuple(offsets))


def _dia_to_csr(dia: DIA) -> CSR:
    """Host-side exact DIA -> CSR conversion."""
    n_r, n_c = dia.shape
    data = np.asarray(dia.data)
    rows_l, cols_l, vals_l = [], [], []
    for d, off in enumerate(dia.offsets):
        i = np.arange(n_r)
        j = i + off
        ok = (j >= 0) & (j < n_c) & (data[d] != 0)
        rows_l.append(i[ok])
        cols_l.append(j[ok])
        vals_l.append(data[d][ok])
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = np.concatenate(vals_l)
    order = np.lexsort((cols, rows))
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(n_r + 1, dtype=np.int32)
    np.add.at(indptr, rows + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    return CSR(
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(cols.astype(np.int32)),
        data=jnp.asarray(vals),
        shape=dia.shape,
    )


def laplacian_1d(n: int, dtype=np.float32, fmt: str = "csr"):
    """Tridiagonal [-1, 2, -1] operator (BASELINE config 1 problem)."""
    ones = np.ones(n, dtype=bool)
    dia = _stencil_dia(
        n,
        offsets=(-1, 0, 1),
        boundary_masks=(ones, ones, ones),
        values=(-1.0, 2.0, -1.0),
        dtype=dtype,
    )
    return dia if fmt == "dia" else _dia_to_csr(dia)


def poisson_2d(nx: int, ny: int | None = None, dtype=np.float32, fmt: str = "csr"):
    """5-point 2D Laplacian on an nx x ny grid (row-major ordering):
    diag 4, neighbors -1.  N = nx*ny unknowns."""
    ny = nx if ny is None else ny
    n = nx * ny
    i = np.arange(n)
    ix = i % nx
    # x-neighbors must not wrap across grid rows
    west_ok = ix > 0
    east_ok = ix < nx - 1
    ones = np.ones(n, dtype=bool)
    dia = _stencil_dia(
        n,
        offsets=(-nx, -1, 0, 1, nx),
        boundary_masks=(ones, west_ok, ones, east_ok, ones),
        values=(-1.0, -1.0, 4.0, -1.0, -1.0),
        dtype=dtype,
    )
    return dia if fmt == "dia" else _dia_to_csr(dia)


def poisson_3d(nx: int, ny: int | None = None, nz: int | None = None,
               dtype=np.float32, fmt: str = "csr"):
    """7-point 3D Laplacian on an nx x ny x nz grid: diag 6, neighbors -1."""
    ny = nx if ny is None else ny
    nz = nx if nz is None else nz
    n = nx * ny * nz
    i = np.arange(n)
    ix = i % nx
    iy = (i // nx) % ny
    ones = np.ones(n, dtype=bool)
    dia = _stencil_dia(
        n,
        offsets=(-nx * ny, -nx, -1, 0, 1, nx, nx * ny),
        boundary_masks=(
            ones,
            iy > 0,
            ix > 0,
            ones,
            ix < nx - 1,
            iy < ny - 1,
            ones,
        ),
        values=(-1.0, -1.0, -1.0, 6.0, -1.0, -1.0, -1.0),
        dtype=dtype,
    )
    return dia if fmt == "dia" else _dia_to_csr(dia)
