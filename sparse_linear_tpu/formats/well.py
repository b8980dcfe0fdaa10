"""WELL — windowed gathered-ELL: the TPU-native format for *unstructured*
sparse matrices.

Motivation.  XLA's TPU gather executes ``x[cols]`` at ~1 GB/s (measured:
64 ms for a 4M-element gather on v5e) — 800x off the HBM roofline — because
TPUs have no scattered memory access; the reference's SpMV inner loop
(reference: sparse-linear/src/Data/Matrix/Sparse.hs:447-451 ``axpy_``) is a
scattered read-modify-write and cannot be translated.  The only fast
data-dependent addressing on the chip is the *in-register* gather
(``tpu.dynamic_gather``): within one (8, 128) vreg it can permute lanes
(``take_along_axis(.., axis=1)``) or sublanes (``axis=0``) at VPU speed.

Design.  WELL restructures the matrix at analyze time (host, per-pattern,
cached — like the reference's symbolic analysis artifacts, Umfpack.hs:56-58)
so SpMV needs *only* in-register gathers:

* y is produced one **vreg** (8x128 = 1024 consecutive rows) at a time.
* The entries of each output vreg are grouped into **chunks**.  A chunk owns
  one 1024-aligned window of x (one x vreg) and at most one entry per output
  element; slot (i, j) of the chunk feeds output row ``1024*v + 128*i + j``.
* For entry at (row, col): the window is ``col >> 10``, the in-window
  position splits into sublane ``r = (col >> 7) & 7`` and lane
  ``l = col & 127``.  The kernel computes the 2D in-vreg gather as two
  1D gathers:  ``P[i,j] = W[r'[i,j], j]`` then ``G[i,j] = P[i, l[i,j]]``,
  which equals ``W[r[i,j], l[i,j]]`` provided the packed plane satisfies
  ``r'[i, l[i,j]] = r[i,j]``.  Two slots in the same sublane may share a
  source lane ``l`` only if they also share ``r`` (duplicate reads are
  fine); genuine conflicts are split into separate chunks by the packer.
* Per chunk the kernel does 2 gathers + 1 fma on (8,128) tiles — pure VPU
  work — so the op is HBM-bound on the chunk stream (12 B/entry:
  val f32 + two index planes int16).

The packer below is fully vectorized numpy (sort/rank/fixpoint), no Python
per-entry loops; cost is O(nnz log nnz) at analyze time.

Capacity model: like ELL, padding grows with row-nnz skew and window
fragmentation; ``csr_to_well`` reports the fill ratio so format selection
can fall back to BSR/DIA when WELL is wasteful.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sparse_linear_tpu.formats.base import pytree_dataclass

__all__ = ["WELL", "csr_to_well"]

_VREG_ROWS = 1024  # 8 sublanes x 128 lanes
_LANES = 128


@pytree_dataclass(meta_fields=("shape", "c_max", "fill", "win_uvr",
                               "win_nunits", "win_vb"))
class WELL:
    """Windowed gathered-ELL storage.

    bases[v, c] — x-window start of chunk c of output vreg v, in x2-row
    units (multiples of 8, so a window is one aligned (8, 128) x vreg).
    idx[v, c] — one bit-packed (8, 128) int32 plane per chunk holding BOTH
    gather planes: bits 0-6 = lane index ``l`` of the entry in slot (i, j),
    bits 7-9 = the sublane plane ``r'`` destined for source lane j (the two
    fields address independent positions, so they pack without conflict).
    vals[v, c] — (8, 128) coefficients; padding slots are 0.
    """

    bases: jax.Array  # (n_vregs, c_max) int32
    idx: jax.Array    # (n_vregs, c_max, 8, 128) int32, r'<<7 | l
    vals: jax.Array   # (n_vregs, c_max, 8, 128) real part (or the values)
    vals_im: object   # None for real matrices; imaginary plane otherwise
    shape: tuple
    c_max: int
    fill: float  # nnz / padded capacity (diagnostic for format selection)
    # per-vreg x-activity range over ACTIVE (nonzero-value) chunks, in
    # x2-row units: lo > hi means no active chunk.  The windowed SpMM
    # kernel derives per-row-tile x windows from these (kernels/spmv_well);
    # None on packings predating the field — consumers must fall back.
    base_lo: object = None  # (n_vregs,) int32, or None
    base_hi: object = None  # (n_vregs,) int32, or None
    # precomputed window plan for the SpMM kernel at tile width ``win_vb``
    # (kernels/spmv_well._window_plan, materialized at PACK time so the plan
    # survives jit tracing — a traced WELL argument cannot derive it on the
    # fly, and without it jitted consumers silently fell back to the
    # resident kernel at tiny mt, streaming A m/mt times).
    win_ub: object = None   # (n_vregs // win_vb,) int32 first-unit table
    win_rel: object = None  # (n_vregs * c_max,) int32 window-relative bases
    win_uvr: object = None    # static: unit height in x2 rows
    win_nunits: object = None  # static: number of x units
    win_vb: object = None      # static: tile width the plan was built for

    @property
    def is_complex(self) -> bool:
        return self.vals_im is not None

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def n_vregs(self) -> int:
        return int(self.bases.shape[0])

    def todense(self):
        nr, nc = self.shape
        nv, cm = self.bases.shape
        out = np.zeros((nv * _VREG_ROWS, -(-nc // _VREG_ROWS) * _VREG_ROWS),
                       dtype=np.asarray(self.vals).dtype)
        bases = np.asarray(self.bases)
        lidx = np.asarray(self.idx) & 127
        ridx = np.asarray(self.idx) >> 7
        vals = np.asarray(self.vals)
        ii = np.arange(8)[:, None] * _LANES
        jj = np.arange(_LANES)[None, :]
        if self.vals_im is not None:
            out = out.astype(np.result_type(out.dtype, np.complex64))
            vals = vals + 1j * np.asarray(self.vals_im)
        for v in range(nv):
            for c in range(cm):
                val = vals[v, c]
                nzm = val != 0
                l = lidx[v, c]
                r = np.take_along_axis(ridx[v, c], l, axis=1)
                col = bases[v, c] * _LANES + r * _LANES + l
                row = v * _VREG_ROWS + ii + jj
                out[row[nzm], col[nzm]] += val[nzm]
        return jnp.asarray(out[:nr, :nc])

    def __matmul__(self, x):
        from sparse_linear_tpu.kernels.spmv_well import well_spmv

        return well_spmv(self, jnp.asarray(x))




_BASE_LO_EMPTY = np.int32(2 ** 30)  # sentinel: vreg has no active chunk


def _base_ranges(bases, vals, vals_im):
    """Per-vreg (lo, hi) over chunks that carry any nonzero value.

    Padding chunks store base 0 and all-zero values; including them would
    drag every row-tile's x window to the origin and defeat the windowed
    SpMM kernel, so they are masked out here.  Empty vregs report
    (lo, hi) = (2^30, -1) — lo > hi.
    """
    active = (np.asarray(vals) != 0).any(axis=(2, 3))
    if vals_im is not None:
        active |= (np.asarray(vals_im) != 0).any(axis=(2, 3))
    b = np.asarray(bases).astype(np.int64)
    lo = np.where(active, b, np.int64(_BASE_LO_EMPTY)).min(axis=1)
    hi = np.where(active, b, np.int64(-1)).max(axis=1)
    return lo.astype(np.int32), hi.astype(np.int32)


def _pad_vregs(bases, idx, vals, vals_im, multiple=16):
    """Pad the vreg axis so the kernel can always run its widest grid step
    (vb=16); padding vregs are all-zero chunks."""
    nv = bases.shape[0]
    nv_pad = -(-nv // multiple) * multiple
    if nv_pad == nv:
        return bases, idx, vals, vals_im
    pb = [(0, nv_pad - nv)] + [(0, 0)] * (bases.ndim - 1)
    p4 = [(0, nv_pad - nv)] + [(0, 0)] * (idx.ndim - 1)
    bases = np.pad(bases, pb)
    idx = np.pad(idx, p4)
    vals = np.pad(vals, p4)
    if vals_im is not None:
        vals_im = np.pad(vals_im, p4)
    return bases, idx, vals, vals_im


def csr_to_well(mat, c_max: int | None = None) -> WELL:
    """Host-side CSR -> WELL packing (vectorized; analyze-time artifact).

    Raises if the pattern needs more than ``c_max`` chunks per output vreg
    (then the pattern is too scattered for WELL at this size — use BSR).
    """
    from sparse_linear_tpu.ops.build import trim

    csr = trim(mat.tocsr())
    nr, nc = csr.shape
    vals = np.asarray(csr.data)
    # complex matrices: one packing, two value planes (TPU gathers have no
    # complex dtype; this is the RealOf-style promotion of reference C1,
    # Data/Complex/Enhanced.hs:19-34, applied to storage)
    vals_im = None
    if np.iscomplexobj(vals):
        vals_im = np.ascontiguousarray(vals.imag)
        vals = np.ascontiguousarray(vals.real)
    indptr = np.asarray(csr.indptr)
    cols = np.asarray(csr.indices).astype(np.int64)
    rows = np.repeat(np.arange(nr, dtype=np.int64), np.diff(indptr))
    nnz = cols.size

    n_vregs = max(-(-nr // _VREG_ROWS), 1)
    n_vregs = -(-n_vregs // 16) * 16
    if nnz == 0:
        cm = c_max or 1
        z = np.zeros((n_vregs, cm, 8, _LANES))
        return WELL(
            bases=jnp.zeros((n_vregs, cm), np.int32),
            idx=jnp.asarray(z.astype(np.int32)),
            vals=jnp.asarray(z.astype(vals.dtype)),
            vals_im=(None if vals_im is None
                     else jnp.asarray(z.astype(vals.dtype))),
            shape=(nr, nc), c_max=cm, fill=0.0,
            base_lo=jnp.full((n_vregs,), _BASE_LO_EMPTY, jnp.int32),
            base_hi=jnp.full((n_vregs,), -1, jnp.int32),
        )

    # ---- native fast path ---------------------------------------------------
    # The C++ greedy packer (native/wellpack.cpp) enforces the same two
    # constraints in one O(nnz) pass; the numpy pipeline below is the
    # fallback (same chunks semantics, ~20x slower).
    from sparse_linear_tpu.utils.native import native_wellpack

    packed = native_wellpack(
        nr, nc, indptr, cols, vals, vals_im, cap=c_max or 0
    )
    if packed is not None:
        cm = int(packed["bases"].shape[1])
        pb, pi, pv, pim = _pad_vregs(
            packed["bases"], packed["idx"],
            packed["vals"].astype(vals.dtype),
            (packed["vals_im"].astype(vals.dtype)
             if vals_im is not None else None),
        )
        blo, bhi = _base_ranges(pb, pv, pim)
        from sparse_linear_tpu.kernels.spmv_well import attach_window_plan

        return attach_window_plan(WELL(
            # int32 explicitly: with x64 enabled jnp.asarray keeps the
            # packer's int64, which Mosaic cannot lower in the kernel
            bases=jnp.asarray(np.asarray(pb, dtype=np.int32)),
            idx=jnp.asarray(np.asarray(pi, dtype=np.int32)),
            vals=jnp.asarray(pv),
            vals_im=None if pim is None else jnp.asarray(pim),
            shape=(nr, nc),
            c_max=cm,
            fill=float(nnz / max(packed["vals"].size, 1)),
            base_lo=jnp.asarray(blo),
            base_hi=jnp.asarray(bhi),
        ))

    v = rows >> 10                 # output vreg
    slot = rows & (_VREG_ROWS - 1)  # 0..1023: i = slot>>7, j = slot&127
    i_sub = slot >> 7
    win = cols >> 10               # x window id
    r = (cols >> 7) & 7
    l = cols & (_LANES - 1)

    # ---- depth assignment -------------------------------------------------
    # depth = chunk index within the (vreg, window) group.  Constraints:
    #   (1) one entry per slot per (v, win, depth)
    #   (2) within (v, win, depth, sublane): same l  =>  same r
    # Start with rank within (v, win, slot), then bump (2)-conflicting
    # entries to deeper chunks until a fixpoint; after every bump, (1) is
    # restored by the monotone run-max separation below.
    n_win = int(win.max()) + 1
    key_slot = (v * n_win + win) * _VREG_ROWS + slot
    ar = np.arange(nnz, dtype=np.int64)

    def _separate(depth):
        """Within each key_slot group make depths strictly increasing (in
        current depth order) without ever lowering one:
        d_new[k] = rank_k + runmax(depth_sorted - rank)."""
        srt = np.lexsort((depth, key_slot))
        ks = key_slot[srt]
        new = np.empty(nnz, dtype=bool)
        new[0] = True
        np.not_equal(ks[1:], ks[:-1], out=new[1:])
        gid = np.cumsum(new, dtype=np.int64) - 1
        start = np.maximum.accumulate(np.where(new, ar, 0))
        rank = ar - start
        t = depth[srt] - rank
        big = int(depth.max()) + nnz + 2
        run = np.maximum.accumulate(t + gid * big) - gid * big
        out = np.empty(nnz, dtype=np.int64)
        out[srt] = rank + run
        return out

    # Initial depth: rank within the (row, window) group.  Canonical CSR is
    # sorted by (row, col), so these groups are contiguous runs — ranking
    # needs no sort at all.
    new = np.empty(nnz, dtype=bool)
    new[0] = True
    new[1:] = (rows[1:] != rows[:-1]) | (win[1:] != win[:-1])
    depth = ar - np.maximum.accumulate(np.where(new, ar, 0))
    vals_s = vals

    srt = None
    for _ in range(64):  # fixpoint: resolve (2) by deepening
        # group by (v, win, depth, sublane, l): all entries must share r
        gk = (((v * n_win + win) * (int(depth.max()) + 1) + depth) * 8
              + i_sub) * _LANES + l
        srt = np.argsort(gk, kind="stable")
        gs, rs = gk[srt], r[srt]
        new = np.empty(nnz, dtype=bool)
        new[0] = True
        np.not_equal(gs[1:], gs[:-1], out=new[1:])
        # leader's r, broadcast over the group
        lead_idx = np.maximum.accumulate(np.where(new, ar, 0))
        conflict_s = rs != rs[lead_idx]
        if not conflict_s.any():
            break
        conflict = np.zeros(nnz, dtype=bool)
        conflict[srt] = conflict_s
        depth[conflict] += 1
        depth = _separate(depth)
    else:
        raise ValueError("csr_to_well: packer failed to converge")

    # ---- chunk ids --------------------------------------------------------
    # chunks of a vreg = all (win, depth) groups, laid out consecutively.
    # The final conflict-check sort above is ordered by (v, win, depth, ...),
    # so chunk boundaries are run boundaries of (gk >> 10) in that order —
    # no separate np.unique pass.
    wd_sorted = gk[srt] >> 10  # (v, win, depth) composite, sorted
    new_wd = np.empty(nnz, dtype=bool)
    new_wd[0] = True
    np.not_equal(wd_sorted[1:], wd_sorted[:-1], out=new_wd[1:])
    chunk_sorted = np.cumsum(new_wd, dtype=np.int64) - 1
    chunk_of = np.empty(nnz, dtype=np.int64)
    chunk_of[srt] = chunk_sorted
    n_chunks = int(chunk_sorted[-1]) + 1
    u_v = np.empty(n_chunks, dtype=np.int64)
    u_win = np.empty(n_chunks, dtype=np.int64)
    firsts = srt[new_wd]
    u_v[chunk_sorted[new_wd]] = v[firsts]
    u_win[chunk_sorted[new_wd]] = win[firsts]
    # chunk index within its vreg
    per_v = np.bincount(u_v, minlength=n_vregs)
    needed = int(per_v.max()) if per_v.size else 1
    if c_max is None:
        c_max = max(needed, 1)
    elif needed > c_max:
        raise ValueError(
            f"csr_to_well: pattern needs {needed} chunks/vreg > c_max={c_max}"
        )
    first_of_v = np.concatenate([[0], np.cumsum(per_v)])[:-1]
    local_c = np.arange(n_chunks, dtype=np.int64) - first_of_v[u_v]

    # ---- emit planes -------------------------------------------------------
    bases = np.zeros((n_vregs, c_max), dtype=np.int32)
    bases[u_v, local_c] = (u_win * 8).astype(np.int32)
    idx = np.zeros((n_vregs, c_max, 8, _LANES), dtype=np.int32)
    out_vals = np.zeros((n_vregs, c_max, 8, _LANES), dtype=vals.dtype)

    cc = local_c[chunk_of]
    vv = u_v[chunk_of]
    jj = slot & (_LANES - 1)
    out_vals[vv, cc, i_sub, jj] = vals_s
    np.bitwise_or.at(idx, (vv, cc, i_sub, jj), l.astype(np.int32))
    # r' plane: destined for source-lane positions; collision-free by (2)
    np.bitwise_or.at(idx, (vv, cc, i_sub, l), (r.astype(np.int32) << 7))
    out_im = None
    if vals_im is not None:
        out_im = np.zeros_like(out_vals)
        out_im[vv, cc, i_sub, jj] = vals_im

    fill = nnz / max(out_vals.size, 1)
    bases, idx, out_vals, out_im = _pad_vregs(bases, idx, out_vals, out_im)
    blo, bhi = _base_ranges(bases, out_vals, out_im)
    from sparse_linear_tpu.kernels.spmv_well import attach_window_plan

    return attach_window_plan(WELL(
        bases=jnp.asarray(bases),
        idx=jnp.asarray(idx),
        vals=jnp.asarray(out_vals),
        vals_im=None if out_im is None else jnp.asarray(out_im),
        shape=(nr, nc),
        c_max=int(c_max),
        fill=float(fill),
        base_lo=jnp.asarray(blo),
        base_hi=jnp.asarray(bhi),
    ))
