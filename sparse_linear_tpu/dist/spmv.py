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

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sparse_linear_tpu.formats.structured import DIA

__all__ = [
    "shard_dia_rows", "dia_spmv_sharded",
    "ShardedELL", "ShardedBSR", "shard_ell_rows", "shard_bsr_rows",
    "shard_rows", "spmv_sharded", "ShardedWELL", "shard_well_rows",
    "window_exchange_elements",
]


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


# ------------------------------------------------------------------ generic
# Row-sharded unstructured SpMV (ELL / BSR / WELL shards of any CSR pattern).
#
# The DIA path above covers stencil operators; these cover arbitrary
# patterns: the matrix rows are block-partitioned across the mesh axis, each
# device holds its row-slab in a TPU fast format (ELL gather tiles, BSR MXU
# blocks, or a WELL packing), and the x segments are exchanged over ICI —
# by a per-device COLUMN-WINDOW ring exchange when the slab patterns are
# localized (each device receives only the x interval its rows touch,
# O(window) traffic), falling back to one tiled all_gather (O(nc) traffic)
# for patterns whose windows span the whole column space.  This is the full
# P1 deliverable of SURVEY.md §2.4: the reference's serial column loop
# (sparse-linear/src/Data/Matrix/Sparse.hs:447-451) re-designed as SPMD
# with explicit collectives.


from sparse_linear_tpu.formats.base import pytree_dataclass


def _col_window_plan(lo, hi, L, ndev, nc_pad, align: int = 1):
    """Static ring-exchange plan for per-device column windows.

    Device d's row slab touches columns [lo[d], hi[d]); x lives sharded in
    ``ndev`` segments of length ``L``.  The plan ships, per device, the tail
    of segment d+j_lo (length ``a``), full segments d+j_lo+1 .. d+j_hi-1,
    and the head of segment d+j_hi (length ``b``) — a contiguous coverage
    from which each device slices its width-``W`` window.  All slice bounds
    are static (identical across devices), so the exchange is j_hi-j_lo
    ``ppermute`` ring shifts over ICI.

    ``align`` forces lo and W to multiples (BSR block width).  Returns a
    dict with the static plan, the final per-device ``lo`` (int32), and
    ``shipped`` — the exchanged elements per device (the all_gather
    alternative ships (ndev-1)*L)."""
    lo = np.asarray(lo, dtype=np.int64).copy()
    hi = np.asarray(hi, dtype=np.int64)
    # slabs with no entries (row padding beyond nr): pin their window to
    # their own segment so they never widen the hop range
    empty = hi <= lo
    lo[empty] = (np.arange(ndev, dtype=np.int64) * L)[empty]
    hi = np.where(empty, lo, hi)
    W = int(max((hi - lo).max(), 1))
    W = -(-W // align) * align
    if W > nc_pad:
        return None
    lo = np.clip(np.minimum(lo, nc_pad - W), 0, None)
    lo = (lo // align) * align
    d = np.arange(ndev, dtype=np.int64)
    j_lo = int((lo // L - d).min())
    j_hi = int(((lo + W - 1) // L - d).max())
    a = int(np.clip(((d + j_lo + 1) * L - lo).max(), 0, L))
    b = int(np.clip((lo + W - (d + j_hi) * L).max(), 0, L))
    shipped = sum(
        (b if j == j_hi else L) - ((L - a) if j == j_lo else 0)
        for j in range(j_lo, j_hi + 1)
        if j != 0 and (b if j == j_hi else L) > ((L - a) if j == j_lo else 0)
    )
    return {
        "plan": (j_lo, j_hi, a, b, L, W),
        "lo": lo.astype(np.int32),
        "shipped": int(shipped),
    }


def _slab_col_ranges(indptr, indices, vals, ndev, rows_per_dev):
    """Per-device [lo, hi) of columns carrying a nonzero in its row slab."""
    lo = np.zeros(ndev, dtype=np.int64)
    hi = np.zeros(ndev, dtype=np.int64)
    nr_pad = ndev * rows_per_dev
    for dd in range(ndev):
        r0, r1 = dd * rows_per_dev, (dd + 1) * rows_per_dev
        s, e = indptr[min(r0, nr_pad)], indptr[min(r1, nr_pad)]
        cix = indices[s:e]
        if vals is not None:
            cix = cix[vals[s:e] != 0]
        if cix.size:
            lo[dd], hi[dd] = int(cix.min()), int(cix.max()) + 1
    return lo, hi


def window_exchange_elements(xplan) -> int:
    """Elements of x shipped over ICI per device per SpMV under ``xplan``
    (the all_gather alternative ships (ndev-1) * L)."""
    j_lo, j_hi, a, b, L, W = xplan
    return sum(
        (b if j == j_hi else L) - ((L - a) if j == j_lo else 0)
        for j in range(j_lo, j_hi + 1)
        if j != 0 and (b if j == j_hi else L) > ((L - a) if j == j_lo else 0)
    )


def _exchange_cols(x_local, lo_dev, axis, ndev, plan):
    """Assemble this device's width-W x window from the sharded segments
    with static ring ``ppermute`` shifts (see :func:`_col_window_plan`)."""
    j_lo, j_hi, a, b, L, W = plan
    pieces = []
    first = None
    for j in range(j_lo, j_hi + 1):
        s = (L - a) if j == j_lo else 0
        e = b if j == j_hi else L
        if e <= s:
            continue
        if first is None:
            first = (j, s)
        sl = jax.lax.slice_in_dim(x_local, s, e)
        if j != 0:
            perm = [((i + j) % ndev, i) for i in range(ndev)]
            sl = jax.lax.ppermute(sl, axis, perm)
        pieces.append(sl)
    cov = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    d = jax.lax.axis_index(axis)
    cov_start = (d + first[0]) * L + first[1]
    start = lo_dev - cov_start
    return jax.lax.dynamic_slice_in_dim(cov, start, W)


@pytree_dataclass(meta_fields=("shape", "axis", "xplan"))
class ShardedELL:
    """Row-partitioned ELL: device d owns rows [d*nr_local, (d+1)*nr_local).

    ``cols``/``vals`` are (ndev, nr_local, K) with the leading axis sharded
    over ``mesh[axis]``; padded rows (beyond the true nrows) hold
    (col=0, val=0).  With a column-window exchange plan (``xplan`` static
    tuple + per-device ``col_lo``), ``cols`` are WINDOW-LOCAL (global col -
    col_lo[d]) and SpMV exchanges only each device's x window over ICI."""

    cols: jax.Array
    vals: jax.Array
    shape: tuple
    axis: str
    col_lo: object = None   # (ndev,) int32 window starts, or None
    xplan: object = None    # static (j_lo, j_hi, a, b, L, W), or None


@pytree_dataclass(meta_fields=("shape", "block_shape", "axis", "xplan"))
class ShardedBSR:
    """Row-partitioned BSR: stacked per-device block slabs, zero-padded to
    the max per-device block count so the pytree is rectangular.

    ``brow`` is the precomputed (sorted) local block-row id of every block —
    the host-side materialization of ``expand_indptr`` so the device kernel
    is a pure segment-sum.  With ``xplan``/``col_lo`` (block-aligned),
    ``indices`` are window-local block columns."""

    brow: jax.Array     # (ndev, maxnb) int32, nondecreasing per device
    indices: jax.Array  # (ndev, maxnb) int32 block-column ids
    blocks: jax.Array   # (ndev, maxnb, bm, bn)
    shape: tuple
    block_shape: tuple
    axis: str
    col_lo: object = None
    xplan: object = None


def _pad_rows_csr(mat, nr_pad):
    """Return host CSR arrays (indptr, indices, data) padded to nr_pad rows."""
    import numpy as np

    indptr = np.asarray(mat.indptr)
    if nr_pad > mat.shape[0]:
        indptr = np.concatenate(
            [indptr, np.full(nr_pad - mat.shape[0], indptr[-1], indptr.dtype)]
        )
    return indptr, np.asarray(mat.indices), np.asarray(mat.data)


def shard_ell_rows(mat, mesh: Mesh, axis: str = "rows",
                   width: int | None = None,
                   exchange: str = "auto") -> ShardedELL:
    """Host-side: partition a CSR matrix's rows over ``mesh[axis]`` as ELL.

    ``exchange``: "auto" localizes each slab to its column window and plans
    the ring exchange when it ships fewer elements than the all_gather;
    "allgather" / "window" pin a strategy."""
    import numpy as np

    from sparse_linear_tpu.ops.build import trim

    csr = trim(mat.tocsr())
    nr, nc = csr.shape
    ndev = mesh.shape[axis]
    nr_local = -(-nr // ndev)
    nr_pad = nr_local * ndev
    indptr, cix, vals = _pad_rows_csr(csr, nr_pad)
    row_nnz = np.diff(indptr)
    k = int(row_nnz.max()) if width is None else int(width)
    k = max(k, 1)
    if row_nnz.max() > k:
        raise ValueError(
            f"shard_ell_rows: max row nnz {int(row_nnz.max())} exceeds "
            f"width {k}"
        )
    win = None
    if exchange in ("auto", "window"):
        nc_pad = -(-nc // ndev) * ndev
        L = nc_pad // ndev
        lo, hi = _slab_col_ranges(indptr, cix, vals, ndev, nr_local)
        win = _col_window_plan(lo, hi, L, ndev, nc_pad)
        if win is not None and exchange == "auto" and (
                win["shipped"] >= (ndev - 1) * L):
            win = None  # window ships no less than the all_gather
        if win is None and exchange == "window":
            raise ValueError("shard_ell_rows: no usable window plan")
    cols = np.zeros((nr_pad, k), dtype=np.int32)
    vs = np.zeros((nr_pad, k), dtype=vals.dtype)
    pos = np.arange(len(cix)) - np.repeat(indptr[:-1], row_nnz)
    rows = np.repeat(np.arange(nr_pad), row_nnz)
    cols[rows, pos] = cix
    vs[rows, pos] = vals
    col_lo = None
    xplan = None
    if win is not None:
        # window-local columns; padding slots (val 0) clamp to 0
        lo_per_row = np.repeat(win["lo"], nr_local)[:, None]
        cols = np.maximum(cols - lo_per_row, 0).astype(np.int32)
        col_lo = jax.device_put(
            jnp.asarray(win["lo"]), NamedSharding(mesh, P(axis))
        )
        xplan = win["plan"]
    sh = NamedSharding(mesh, P(axis, None, None))
    return ShardedELL(
        cols=jax.device_put(cols.reshape(ndev, nr_local, k), sh),
        vals=jax.device_put(vs.reshape(ndev, nr_local, k), sh),
        shape=(nr, nc),
        axis=axis,
        col_lo=col_lo,
        xplan=xplan,
    )


def shard_bsr_rows(mat, mesh: Mesh, axis: str = "rows",
                   block_shape=(8, 128),
                   exchange: str = "auto") -> ShardedBSR:
    """Host-side: partition a CSR matrix's rows over ``mesh[axis]`` as BSR.

    ``exchange`` as in :func:`shard_ell_rows` (window plans are block-column
    aligned)."""
    import numpy as np

    from sparse_linear_tpu.ops.build import trim

    csr = trim(mat.tocsr())
    nr, nc = csr.shape
    bm, bn = block_shape
    ndev = mesh.shape[axis]
    # pad the block-row grid so every device owns the same slab height
    nbr_local = -(-(-(-nr // bm)) // ndev)
    nr_pad = nbr_local * ndev * bm
    nc_pad = -(-nc // bn) * bn
    indptr, cix, vals = _pad_rows_csr(csr, nr_pad)
    win = None
    if exchange in ("auto", "window"):
        # exchange operates on the x-shard grid (ceil(nc/ndev) segments);
        # block alignment keeps window-local block columns exact
        ncs_pad = -(-nc // ndev) * ndev
        L = ncs_pad // ndev
        lo, hi = _slab_col_ranges(indptr, cix, vals, ndev, nbr_local * bm)
        win = _col_window_plan(lo, hi, L, ndev, ncs_pad, align=bn)
        if win is not None and exchange == "auto" and (
                win["shipped"] >= (ndev - 1) * L):
            win = None
        if win is None and exchange == "window":
            raise ValueError("shard_bsr_rows: no usable window plan")
    rows = np.repeat(np.arange(nr_pad), np.diff(indptr))
    br, bc = rows // bm, cix // bn
    dev = br // nbr_local
    nbc = nc_pad // bn
    key = (dev.astype(np.int64) * (nr_pad // bm) + br) * nbc + bc
    uniq, inv = np.unique(key, return_inverse=True)
    blocks_flat = np.zeros((uniq.size, bm, bn), dtype=vals.dtype)
    np.add.at(blocks_flat, (inv, rows % bm, cix % bn), vals)
    u_dev = (uniq // nbc) // (nr_pad // bm)
    u_brow_local = (uniq // nbc) % (nr_pad // bm) % nbr_local
    u_bc = (uniq % nbc).astype(np.int32)
    counts = np.bincount(u_dev, minlength=ndev)
    maxnb = max(int(counts.max()), 1)
    brow = np.full((ndev, maxnb), nbr_local - 1, dtype=np.int32)
    indices = np.zeros((ndev, maxnb), dtype=np.int32)
    blocks = np.zeros((ndev, maxnb, bm, bn), dtype=vals.dtype)
    # uniq is sorted by (dev, brow, bcol): per-device runs are contiguous
    # and brow stays nondecreasing after the split
    starts = np.concatenate([[0], np.cumsum(counts)])
    for d in range(ndev):
        s, e = starts[d], starts[d + 1]
        m = e - s
        brow[d, :m] = u_brow_local[s:e]
        # padding keeps brow nondecreasing: pad value is the max block row
        if m:
            brow[d, m:] = max(nbr_local - 1, int(u_brow_local[e - 1]))
        indices[d, :m] = u_bc[s:e]
        if win is not None:
            indices[d, :m] -= np.int32(win["lo"][d] // bn)
        blocks[d, :m] = blocks_flat[s:e]
    col_lo = None
    xplan = None
    if win is not None:
        col_lo = jax.device_put(
            jnp.asarray(win["lo"]), NamedSharding(mesh, P(axis))
        )
        xplan = win["plan"]
    sh2 = NamedSharding(mesh, P(axis, None))
    sh3 = NamedSharding(mesh, P(axis, None, None, None))
    return ShardedBSR(
        brow=jax.device_put(brow, sh2),
        indices=jax.device_put(indices, sh2),
        blocks=jax.device_put(blocks, sh3),
        shape=(nr, nc),
        block_shape=(bm, bn),
        axis=axis,
        col_lo=col_lo,
        xplan=xplan,
    )


def shard_rows(mat, mesh: Mesh, axis: str = "rows", fmt: str = "auto",
               **kw):
    """Partition any CSR/COO/CSC matrix's rows over a mesh axis.

    fmt: "dia" | "ell" | "bsr" | "auto" (pattern statistics pick the local
    format, mirroring formats.select)."""
    csr = mat.tocsr()
    if fmt == "auto":
        from sparse_linear_tpu.formats.select import recommend_format

        fmt = recommend_format(csr)
        if fmt not in ("dia", "ell", "bsr", "well"):
            fmt = "ell"
    if fmt == "dia":
        from sparse_linear_tpu.formats.structured import csr_to_dia

        return shard_dia_rows(csr_to_dia(csr), mesh, axis)
    if fmt == "well":
        return shard_well_rows(csr, mesh, axis, **kw)
    if fmt == "ell":
        return shard_ell_rows(csr, mesh, axis, **kw)
    if fmt == "bsr":
        return shard_bsr_rows(csr, mesh, axis, **kw)
    raise ValueError(f"unknown fmt: {fmt}")


def _gathered_x(x_local, axis, nc):
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)
    return x_full


def spmv_sharded(a, x, mesh: Mesh):
    """y = A @ x for a row-sharded matrix; y comes back sharded over the
    same axis.  x may be replicated or sharded; it is passed sharded and
    all-gathered over ICI inside the shard_map."""
    if isinstance(a, DIA):
        return dia_spmv_sharded(a, x, mesh)
    axis = a.axis
    nr, nc = a.shape
    ndev = mesh.shape[axis]
    nc_pad = -(-nc // ndev) * ndev
    x = jnp.asarray(x)
    if x.shape[0] != nc:
        raise ValueError(f"spmv_sharded: dimension mismatch {a.shape} @ {x.shape}")
    xp = jnp.pad(x, (0, nc_pad - nc)).reshape(ndev, nc_pad // ndev)

    if isinstance(a, ShardedWELL):
        import jax as _jax

        interpret = _jax.default_backend() != "tpu"
        return _sharded_well_spmv(a, xp, mesh, nc, nr, interpret)

    if isinstance(a, ShardedELL):
        if a.xplan is not None:

            def kernel(cols, vals, lo, x_local):
                xw = _exchange_cols(x_local[0], lo[0], axis, ndev, a.xplan)
                y = (vals[0] * xw[cols[0]]).sum(axis=1)
                return y[None]

            f = jax.shard_map(
                kernel, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis)),
                out_specs=P(axis),
            )
            return f(a.cols, a.vals, a.col_lo, xp).reshape(-1)[:nr]

        def kernel(cols, vals, x_local):
            x_full = _gathered_x(x_local[0], axis, nc)
            y = (vals[0] * x_full[cols[0]]).sum(axis=1)
            return y[None]

        f = jax.shard_map(
            kernel, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        y = f(a.cols, a.vals, xp).reshape(-1)[:nr]
        return y

    if isinstance(a, ShardedBSR):
        bm, bn = a.block_shape
        nbr_local = -(-(-(-nr // bm)) // ndev)

        def bsr_contract(brow, indices, blocks, xb, x_local):
            xg = xb[indices[0]]
            contrib = jnp.einsum(
                "kij,kj->ki", blocks[0], xg.astype(blocks.dtype),
                preferred_element_type=jnp.result_type(blocks, x_local),
            )
            y = jax.ops.segment_sum(
                contrib, brow[0], num_segments=nbr_local,
                indices_are_sorted=True,
            )
            return y.reshape(1, -1)

        if a.xplan is not None:

            def kernel(brow, indices, blocks, lo, x_local):
                xw = _exchange_cols(x_local[0], lo[0], axis, ndev, a.xplan)
                # W is bn-aligned by plan construction
                xb = xw.reshape(-1, bn)
                return bsr_contract(brow, indices, blocks, xb, x_local)

            f = jax.shard_map(
                kernel, mesh=mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
                out_specs=P(axis),
            )
            return f(a.brow, a.indices, a.blocks, a.col_lo, xp
                     ).reshape(-1)[:nr]

        def kernel(brow, indices, blocks, x_local):
            x_full = _gathered_x(x_local[0], axis, nc)
            nc_blk = -(-nc // bn) * bn
            xb = jnp.pad(x_full[:nc], (0, nc_blk - nc)).reshape(-1, bn)
            return bsr_contract(brow, indices, blocks, xb, x_local)

        f = jax.shard_map(
            kernel, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
        y = f(a.brow, a.indices, a.blocks, xp).reshape(-1)[:nr]
        return y

    raise TypeError(f"spmv_sharded: unsupported type {type(a)}")


@pytree_dataclass(meta_fields=("shape", "c_max", "axis", "xplan"))
class ShardedWELL:
    """Row-partitioned WELL: each device owns a WELL packing of its row slab,
    padded to the max per-device chunk count so the stacked pytree is
    rectangular.  The local kernel is the Pallas in-register-gather SpMV
    (kernels/spmv_well.py).  With an ``xplan``/``col_lo`` window plan the
    slab packings are COLUMN-WINDOW-LOCAL and SpMV ships only each device's
    x window over ICI (ring ppermutes); otherwise x is all-gathered."""

    bases: jax.Array  # (ndev, nv_local, c_max) int32
    idx: jax.Array    # (ndev, nv_local, c_max, 8, 128) int32
    vals: jax.Array   # (ndev, nv_local, c_max, 8, 128) real part (or values)
    vals_im: object   # None for real matrices; imaginary plane otherwise
    shape: tuple
    c_max: int
    axis: str
    col_lo: object = None
    xplan: object = None


def shard_well_rows(mat, mesh: Mesh, axis: str = "rows",
                    exchange: str = "auto") -> ShardedWELL:
    """Host-side: partition a CSR matrix's rows over ``mesh[axis]``, packing
    each slab as WELL.  Slab heights are multiples of 1024 rows (the WELL
    vreg granularity).  ``exchange`` as in :func:`shard_ell_rows`."""
    import numpy as np

    from sparse_linear_tpu.formats.matrix import CSR
    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.ops.build import trim

    csr = trim(mat.tocsr())
    nr, nc = csr.shape
    ndev = mesh.shape[axis]
    nv_local = max(-(-(-(-nr // 1024)) // ndev), 1)
    rows_local = nv_local * 1024
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)
    win = None
    if exchange in ("auto", "window"):
        nc_pad = -(-nc // ndev) * ndev
        L = nc_pad // ndev
        nr_pad_w = ndev * rows_local
        ip_w = indptr
        if ip_w.size < nr_pad_w + 1:
            ip_w = np.concatenate(
                [ip_w, np.full(nr_pad_w + 1 - ip_w.size, ip_w[-1],
                               ip_w.dtype)]
            )
        lo, hi = _slab_col_ranges(ip_w, indices, np.abs(data), ndev,
                                  rows_local)
        win = _col_window_plan(lo, hi, L, ndev, nc_pad)
        if win is not None and exchange == "auto" and (
                win["shipped"] >= (ndev - 1) * L):
            win = None
        if win is None and exchange == "window":
            raise ValueError("shard_well_rows: no usable window plan")
    packs = []
    for d in range(ndev):
        r0 = min(d * rows_local, nr)
        r1 = min(r0 + rows_local, nr)
        lp = indptr[r0:r1 + 1]
        if lp.size < rows_local + 1:  # last slab: pad empty rows
            lp = np.concatenate(
                [lp, np.full(rows_local + 1 - lp.size, lp[-1], lp.dtype)]
            )
        six = indices[lp[0]:lp[-1]]
        ncl = nc
        if win is not None:
            six = np.maximum(six - win["lo"][d], 0)
            ncl = win["plan"][5]  # W
        local = CSR(
            indptr=(lp - lp[0]).astype(indptr.dtype),
            indices=six,
            data=data[lp[0]:lp[-1]],
            shape=(rows_local, ncl),
        )
        packs.append(csr_to_well(local))
    cm = max(p.c_max for p in packs)
    is_c = packs[0].is_complex

    def pad(p, arr_name):
        a = np.asarray(getattr(p, arr_name))
        if a.shape[1] < cm:
            padw = [(0, 0)] * a.ndim
            padw[1] = (0, cm - a.shape[1])
            a = np.pad(a, padw)
        return a

    bases = np.stack([pad(p, "bases") for p in packs])
    idx = np.stack([pad(p, "idx") for p in packs])
    vals = np.stack([pad(p, "vals") for p in packs])
    # complex: the two real planes share one packing (same bases/idx); the
    # sharded kernel runs one real pass per (A-plane, x-plane) pair
    vals_im = (np.stack([pad(p, "vals_im") for p in packs]) if is_c
               else None)
    sh3 = NamedSharding(mesh, P(axis, None, None))
    sh5 = NamedSharding(mesh, P(axis, None, None, None, None))
    return ShardedWELL(
        bases=jax.device_put(bases, sh3),
        idx=jax.device_put(idx, sh5),
        vals=jax.device_put(vals, sh5),
        vals_im=(None if vals_im is None
                 else jax.device_put(vals_im, sh5)),
        shape=(nr, nc),
        c_max=cm,
        axis=axis,
        col_lo=(None if win is None else jax.device_put(
            jnp.asarray(win["lo"]), NamedSharding(mesh, P(axis)))),
        xplan=(None if win is None else win["plan"]),
    )


def _sharded_well_spmv(a: ShardedWELL, xp, mesh, nc, nr, interpret):
    from sparse_linear_tpu.formats.well import WELL
    from sparse_linear_tpu.kernels.spmv_well import well_spmv

    axis = a.axis
    ndev = mesh.shape[axis]
    # packed vreg count may exceed the true slab height (the packer pads
    # the vreg axis to the kernel's widest grid step): slice the local
    # result back to the slab
    nv_pack = int(a.bases.shape[1])
    rows_local = max(-(-(-(-nr // 1024)) // ndev), 1) * 1024
    has_ai = a.vals_im is not None
    has_xi = jnp.iscomplexobj(xp)
    windowed = a.xplan is not None
    # window-local packings address a width-W x window; full packings the
    # whole column space
    nc_local = a.xplan[5] if windowed else nc
    rdtype = jnp.real(jnp.zeros((), a.vals.dtype)).dtype

    def _local_spmv(bases, idx, vals, x_full):
        local = WELL(
            bases=bases, idx=idx, vals=vals, vals_im=None,
            shape=(nv_pack * 1024, nc_local), c_max=a.c_max, fill=1.0,
        )
        return well_spmv(local, x_full[:nc_local], interpret=interpret)

    def kernel(bases, idx, vals, *rest):
        rest = list(rest)
        vals_im = rest.pop(0)[0] if has_ai else None
        lo = rest.pop(0)[0] if windowed else None

        def get_x(x_local):
            if windowed:
                return _exchange_cols(x_local, lo, axis, ndev, a.xplan)
            return jax.lax.all_gather(x_local, axis, tiled=True)

        xr_full = get_x(rest[0][0])
        xi_full = get_x(rest[1][0]) if has_xi else None
        y_re = _local_spmv(bases[0], idx[0], vals[0], xr_full)
        y_im = jnp.zeros_like(y_re)
        if has_xi:
            y_im = y_im + _local_spmv(bases[0], idx[0], vals[0], xi_full)
        if has_ai:
            y_im = y_im + _local_spmv(bases[0], idx[0], vals_im, xr_full)
            if has_xi:
                y_re = y_re - _local_spmv(bases[0], idx[0], vals_im, xi_full)
        y2 = jnp.stack([y_re[:rows_local], y_im[:rows_local]], axis=0)
        return y2[None]

    args = [a.bases, a.idx, a.vals]
    if has_ai:
        args.append(a.vals_im)
    if windowed:
        args.append(a.col_lo)
    args.append(jnp.real(xp).astype(rdtype))
    if has_xi:
        args.append(jnp.imag(xp).astype(rdtype))

    # check_vma=False: pallas_call does not yet annotate varying-mesh-axes
    f = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=tuple(P(axis) for _ in args),
        out_specs=P(axis, None),
        check_vma=False,
    )
    y2 = f(*args)  # (ndev, 2, rows_local)
    y_re = y2[:, 0].reshape(-1)[:nr]
    if not (has_ai or has_xi):
        return y_re
    y_im = y2[:, 1].reshape(-1)[:nr]
    cdtype = jnp.complex128 if rdtype == jnp.float64 else jnp.complex64
    return (y_re + 1j * y_im).astype(cdtype)
