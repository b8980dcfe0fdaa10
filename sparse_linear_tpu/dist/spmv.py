"""Multi-chip SpMV: row-partitioned matrices over a jax.sharding Mesh.

The reference has zero parallelism (SURVEY.md §2.4); this is build component
P1: the serial column loop of the reference's ``axpy_``
(sparse-linear/src/Data/Matrix/Sparse.hs:447-451) re-designed as SPMD over a
device mesh.  Rows of the matrix (and of y) are sharded; the x vector is
exchanged over ICI.

Two exchange strategies:

* ``allgather`` (default): gather the full x on every device
  (`jax.lax.all_gather` rides ICI).  For stencil/DIA operators the matrix
  data stream (ndiag * n) dominates the x stream (n), so the gather is a
  small constant factor and is fully overlapped by XLA's latency hiding.
* ``halo``: for banded offsets, exchange only the boundary segments with the
  two ring neighbors via ``ppermute`` — O(halo) instead of O(n) traffic.
  Requires max|offset| <= local row count.

Both run under ``shard_map`` so the collectives are explicit and the local
compute is the single-chip kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparse_linear_tpu.formats.structured import DIA

__all__ = ["shard_dia_rows", "dia_spmv_sharded"]


def shard_dia_rows(dia: DIA, mesh: Mesh, axis: str = "rows") -> DIA:
    """Place a DIA matrix with its data row-sharded over ``mesh[axis]``.

    data has shape (ndiag, nrows): shard dim 1."""
    sharding = NamedSharding(mesh, P(None, axis))
    return DIA(
        data=jax.device_put(dia.data, sharding),
        shape=dia.shape,
        offsets=dia.offsets,
    )


def _local_dia_spmv(data_local, x_full, offsets, nr_total, axis):
    """Local rows x full x: y_local[i] = sum_d data[d, i] * x[r0 + i + off]."""
    n_local = data_local.shape[1]
    r0 = jax.lax.axis_index(axis) * n_local
    pad_lo = max(0, -min(offsets, default=0))
    pad_hi = max(0, max(offsets, default=0))
    xp = jnp.pad(x_full, (pad_lo, pad_hi))
    y = jnp.zeros((n_local,), dtype=jnp.result_type(data_local, x_full))
    for d, off in enumerate(offsets):
        seg = jax.lax.dynamic_slice_in_dim(xp, r0 + off + pad_lo, n_local)
        y = y + data_local[d] * seg
    return y


def dia_spmv_sharded(dia: DIA, x, mesh: Mesh, axis: str = "rows",
                     exchange: str = "halo"):
    """y = A @ x with A row-sharded and x/y sharded over ``mesh[axis]``.

    Square matrices with nrows divisible by the axis size.
    """
    nr, nc = dia.shape
    n_dev = mesh.shape[axis]
    if nr % n_dev or nc % n_dev:
        raise ValueError(
            f"dia_spmv_sharded: shape {dia.shape} not divisible by mesh "
            f"axis size {n_dev}"
        )
    offsets = dia.offsets
    n_local = nc // n_dev
    halo = max((abs(o) for o in offsets), default=0)
    if exchange == "halo" and halo > n_local:
        exchange = "allgather"

    if exchange == "allgather":

        def kernel(data_local, x_local):
            x_full = jax.lax.all_gather(x_local, axis, tiled=True)
            return _local_dia_spmv(data_local, x_full, offsets, nr, axis)

    elif exchange == "halo":

        def kernel(data_local, x_local):
            if halo == 0:
                x_ext = x_local
            else:
                # ship boundary segments to ring neighbors over ICI
                fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
                bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
                left = jax.lax.ppermute(x_local[-halo:], axis, fwd)
                right = jax.lax.ppermute(x_local[:halo], axis, bwd)
                x_ext = jnp.concatenate([left, x_local, right])
            # rows [r0, r0+n_local): x[r0 + i + off] = x_ext[halo + i + off].
            # Ring wrap-around at the global boundary is harmless: the DIA
            # constructors store 0 in data[d, i] whenever i+off falls outside
            # the matrix, so wrapped x values are multiplied by zero.
            y = jnp.zeros((n_local,), dtype=jnp.result_type(data_local, x_local))
            for d, off in enumerate(offsets):
                seg = jax.lax.slice_in_dim(
                    x_ext, halo + off, halo + off + n_local
                )
                y = y + data_local[d] * seg
            return y

    else:
        raise ValueError(f"unknown exchange strategy: {exchange}")

    f = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
    )
    return f(dia.data, jnp.asarray(x))
