"""Pallas TPU SpMV kernel for the WELL format (unstructured patterns).

One grid step produces ``VB`` output vregs (VB x 1024 rows).  The full x
vector sits in VMEM (constant index map — fetched once, reused by every
step); per chunk the kernel dynamically slices the chunk's (8, 128)
x-window out of it and resolves the 2D in-register gather as two
``tpu.dynamic_gather`` ops (see formats/well.py for the packing
invariants):

    W = x2[base : base+8, :]            # one x vreg
    P[i, j] = W[idx[i, j] >> 7, j]      # sublane gather (r' plane)
    G[i, j] = P[i, idx[i, j] & 127]     # lane gather
    acc    += vals * G

The chunk loop is fully unrolled (c_max and VB are compile-time constants)
so there is no scalar-loop overhead between vector ops; the op streams
8 B/slot (f32 val + packed int32 index plane) and is HBM-bound.

This replaces the reference's scattered column loop
(reference: sparse-linear/src/Data/Matrix/Sparse.hs:447-451) for patterns
with no DIA/BSR structure; XLA's own gather executes the same op ~800x off
the HBM roofline (measured ~1 GB/s on v5e).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["well_spmv", "well_spmm", "well_spmm_planes",
           "well_planes_width", "attach_window_plan"]

_LANES = 128
_VREG_ROWS = 1024
# int32 constant for BlockSpec index maps: Python int literals trace as
# int64 under x64 and Mosaic has no 64-bit lowering
_I0 = np.int32(0)


def _gather_sublanes(w, idx):
    """p[i, j] = w[idx[i, j], j] — tpu.dynamic_gather along sublanes.

    Direct lax.gather with int32 indices: jnp.take_along_axis converts
    indices to the default int dtype, which is int64 under x64 and Mosaic
    has no 64-bit lowering (its convert rule recurses)."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,),
        operand_batching_dims=(1,), start_indices_batching_dims=(1,),
    )
    return jax.lax.gather(
        w, idx.astype(jnp.int32)[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _gather_lanes(p, idx):
    """g[i, j] = p[i, idx[i, j]] — tpu.dynamic_gather along lanes."""
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    return jax.lax.gather(
        p, idx.astype(jnp.int32)[..., None], dnums, (1, 1),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _kernel(bases_ref, x_ref, idx_ref, vals_ref, o_ref, *, c_max: int,
            vb: int):
    step = pl.program_id(0)
    out_dtype = o_ref.dtype
    for b in range(vb):
        acc = jnp.zeros((8, _LANES), out_dtype)
        for c in range(c_max):
            base = bases_ref[(step * vb + b) * c_max + c]
            w = x_ref[pl.ds(base, 8), :]
            packed = idx_ref[b, c]
            p = _gather_sublanes(w, packed >> 7)
            g = _gather_lanes(p, packed & 127)
            acc = acc + vals_ref[b, c] * g
        o_ref[pl.ds(b * 8, 8), :] = acc


@functools.partial(jax.jit, static_argnames=("interpret", "vb"))
def _well_spmv_real(a, x, interpret=False, vb=16):
    nr, nc = a.shape
    nv, cm = a.bases.shape
    while nv % vb:
        vb //= 2
    vb = max(vb, 1)
    nc_pad = max(-(-nc // _VREG_ROWS) * _VREG_ROWS, _VREG_ROWS)
    # windows may start in the last (partial) vreg of x: pad one extra vreg
    # so every base+8 slice is in bounds
    x2 = jnp.pad(x.astype(a.vals.dtype), (0, nc_pad + _VREG_ROWS - nc))
    x2 = x2.reshape(-1, _LANES)

    grid = (nv // vb,)
    # the resident x (+ double buffering) exceeds Mosaic's 16 MB default
    # scoped-vmem budget once nc reaches tens of millions (the SpGEMM
    # gather sources hit ~26M elements at 1M-dof operators — compile
    # failed with a scoped-vmem stack OOM); the chip has 128 MB.  Raised
    # ONLY for oversized x: a blanket override regressed the normal-size
    # SpMV ~12% (the budget steers Mosaic's scheduling)
    kw = {}
    if x2.nbytes > 32 * 2 ** 20:  # 4.2M-dof f32 (16.8 MB) compiles under
                                  # the default budget; the 104 MB SpGEMM
                                  # gather source does not
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
        )
    f = pl.pallas_call(
        functools.partial(_kernel, c_max=cm, vb=vb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(x2.shape, lambda v, s: (_I0, _I0)),  # x resident
                pl.BlockSpec((vb, cm, 8, _LANES), lambda v, s: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES), lambda v, s: (v, _I0, _I0, _I0)),
            ],
            out_specs=pl.BlockSpec((vb * 8, _LANES), lambda v, s: (v, _I0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nv * 8, _LANES), a.vals.dtype),
        interpret=interpret,
        **kw,
    )
    y2 = f(a.bases.reshape(-1), x2, a.idx, a.vals)
    return y2.reshape(-1)[:nr]


def _spmm_kernel(bases_ref, x_ref, idx_ref, vals_ref, o_ref, *, c_max: int,
                 vb: int, mt: int):
    """Multi-RHS WELL kernel: the index planes of each chunk are loaded once
    and reused by every RHS column of the tile (the FEAST ijob=30/40 hot op,
    reference Feast.hs:203-208, at block width m0)."""
    step_v = pl.program_id(1)
    out_dtype = o_ref.dtype
    for b in range(vb):
        accs = [jnp.zeros((8, _LANES), out_dtype) for _ in range(mt)]
        for c in range(c_max):
            # chunk metadata decoded ONCE, reused by all mt resident columns
            base = bases_ref[(step_v * vb + b) * c_max + c]
            packed = idx_ref[b, c]
            hi = packed >> 7
            lo = packed & 127
            val = vals_ref[b, c]
            for t in range(mt):
                w = x_ref[t, pl.ds(base, 8), :]
                p = _gather_sublanes(w, hi)
                g = _gather_lanes(p, lo)
                accs[t] = accs[t] + val * g
        for t in range(mt):
            o_ref[t, pl.ds(b * 8, 8), :] = accs[t]


def _spmm_kernel_win(bases_ref, ub_ref, xa_ref, xb_ref, idx_ref, vals_ref,
                     o_ref, xw_ref, *, c_max: int, vb: int, mt: int,
                     uvr: int):
    """Windowed multi-RHS WELL kernel.

    Each row tile sees only its own 2-unit x window (selected per tile by
    the scalar-prefetched unit table ``ub_ref`` through the BlockSpec index
    maps), so ALL mt RHS columns stay VMEM-resident regardless of nc and the
    A stream is read once per ceil(m/mt) — for typical m, exactly once.
    The two units are merged into the ``xw_ref`` VMEM scratch (copied only
    when the tile's unit pair changes), so the hot loop runs ONE dynamic
    window load + two gathers + one fma per (chunk, RHS) — no per-chunk
    unit select.  Bases arrive window-relative in [0, 2*uvr-8]; bases are
    8-aligned and uvr is a multiple of 8, so a window never straddles the
    unit-pair boundary."""
    step_v = pl.program_id(1)
    out_dtype = o_ref.dtype

    # refresh the merged window only when the unit pair changes (ub is the
    # per-tile first unit; BlockSpec re-fetches xa/xb on the same condition)
    prev = ub_ref[jnp.maximum(step_v - 1, 0)]

    @pl.when((step_v == 0) | (ub_ref[step_v] != prev))
    def _refresh():
        xw_ref[:, :uvr, :] = xa_ref[...]
        xw_ref[:, uvr:, :] = xb_ref[...]

    for b in range(vb):
        accs = [jnp.zeros((8, _LANES), out_dtype) for _ in range(mt)]
        for c in range(c_max):
            base = bases_ref[(step_v * vb + b) * c_max + c]
            packed = idx_ref[b, c]
            hi = packed >> 7
            lo = packed & 127
            val = vals_ref[b, c]
            # ONE dynamic window load for all mt resident RHS planes
            wall = xw_ref[:, pl.ds(base, 8), :]
            for t in range(mt):
                p = _gather_sublanes(wall[t], hi)
                g = _gather_lanes(p, lo)
                accs[t] = accs[t] + val * g
        for t in range(mt):
            o_ref[t, pl.ds(b * 8, 8), :] = accs[t]


# VMEM budget for the resident X tile (bytes).  The gather windows may land
# anywhere in a column, so a whole zero-padded column must sit in VMEM; the
# RHS tile height adapts to fit (double-buffered by Pallas).
_X_TILE_BUDGET = 40 * 2 ** 20
# unrolled inner-body budget: vb * c_max * mt bodies
_MT_CAP = 16

_WIN_PLAN_CACHE: dict = {}
_WIN_PLAN_CACHE_MAX = 16


def _compute_window_plan(bases_np, lo_np, hi_np, vb: int):
    """Host-side window-plan computation from concrete packing arrays.

    The unit size ``uvr`` is the max tile span rounded to x-vreg alignment,
    ``ub[tile]`` the tile's first unit, and ``rel`` the window-relative chunk
    bases.  Returns ``(uvr, ub, rel, n_units)`` or None."""
    nv, cm = bases_np.shape
    n_t = nv // vb
    lo_t = lo_np.astype(np.int64).reshape(n_t, vb).min(1)
    hi_t = hi_np.astype(np.int64).reshape(n_t, vb).max(1)
    empty = hi_t < lo_t  # all-padding tiles: pin their window to unit 0
    lo_t = np.where(empty, 0, lo_t)
    hi_t = np.where(empty, 0, hi_t)
    span = int((hi_t + 8 - lo_t).max())
    uvr = max(-(-span // 8) * 8, 8)
    ub = lo_t // uvr
    # coverage: lo_t >= ub*uvr and hi_t + 8 <= lo_t + span <= (ub+2)*uvr
    if not ((hi_t + 8) <= (ub + 2) * uvr).all():  # pragma: no cover
        return None
    off = np.repeat(ub * uvr, vb)[:, None]
    rel = np.clip(bases_np.astype(np.int64) - off, 0, 2 * uvr - 8
                  ).astype(np.int32)
    return (int(uvr), ub.astype(np.int32), rel.reshape(-1),
            int(ub.max()) + 2)


def attach_window_plan(a, vb: int = 8):
    """Materialize the SpMM window plan ON the packing (host-side).

    ``csr_to_well`` calls this at pack time so the plan survives jit
    tracing: a WELL passed as a jit ARGUMENT has traced arrays, from which
    no plan can be derived on the fly — without a stored plan, jitted
    consumers silently fell back to the resident kernel at tiny mt
    (A streamed m/mt times; measured 113 vs 400+ GB/s at m=16)."""
    import dataclasses

    lo = getattr(a, "base_lo", None)
    hi = getattr(a, "base_hi", None)
    if lo is None or hi is None or getattr(a, "win_vb", None) is not None:
        return a
    if any(isinstance(v, jax.core.Tracer) for v in (lo, hi, a.bases)):
        return a
    nv = a.bases.shape[0]
    while nv % vb:
        vb //= 2
    vb = max(vb, 1)
    plan = _compute_window_plan(
        np.asarray(a.bases), np.asarray(lo), np.asarray(hi), vb
    )
    if plan is None:
        return a
    uvr, ub, rel, n_units = plan
    return dataclasses.replace(
        a, win_ub=jnp.asarray(ub), win_rel=jnp.asarray(rel),
        win_uvr=uvr, win_nunits=n_units, win_vb=vb,
    )


def _window_plan(a, vb: int):
    """Per-row-tile x-window plan for the windowed SpMM kernel, or None.

    Prefers the plan materialized on the packing (``attach_window_plan`` —
    works even when the arrays are traced); otherwise derives it host-side
    from the per-vreg activity ranges (formats/well.py
    ``base_lo``/``base_hi``).  Returns ``(uvr, ub, rel, n_units)``; None
    when no plan applies (then only the resident kernel runs)."""
    if (getattr(a, "win_vb", None) == vb
            and getattr(a, "win_ub", None) is not None):
        return (int(a.win_uvr), a.win_ub, a.win_rel, int(a.win_nunits))
    lo = getattr(a, "base_lo", None)
    hi = getattr(a, "base_hi", None)
    if lo is None or hi is None:
        return None
    if any(isinstance(v, jax.core.Tracer) for v in (lo, hi, a.bases)):
        return None
    nv, cm = a.bases.shape
    bases_np = np.asarray(a.bases).astype(np.int64)
    key = (nv, cm, vb, hash(bases_np.tobytes()))
    plan = _WIN_PLAN_CACHE.get(key)
    if plan is not None:
        return plan
    plan = _compute_window_plan(bases_np, np.asarray(lo), np.asarray(hi), vb)
    if plan is None:
        return None
    if len(_WIN_PLAN_CACHE) >= _WIN_PLAN_CACHE_MAX:
        _WIN_PLAN_CACHE.pop(next(iter(_WIN_PLAN_CACHE)))
    _WIN_PLAN_CACHE[key] = plan
    return plan


@functools.partial(jax.jit, static_argnames=("interpret", "vb", "mt"))
def _spmm_resident(a, xp, interpret=False, vb=8, mt=8):
    """Plane-major resident-X SpMM: xp (m, nc) -> (m, nr).

    Grid (RHS tiles, vreg tiles) with the vreg axis minor: the X tile stays
    VMEM-resident across the whole A sweep (fetched once per RHS tile), and
    each vreg tile's chunk index/value planes are shared by the mt resident
    RHS columns — the A stream is read ceil(m/mt) times total.  The
    fallback path when no window plan exists (traced WELL, pre-range
    packings) or when windows would not beat full residency."""
    nr, nc = a.shape
    nv, cm = a.bases.shape
    m = xp.shape[0]
    while nv % vb:
        vb //= 2
    vb = max(vb, 1)
    nc_pad = max(-(-nc // _VREG_ROWS) * _VREG_ROWS, _VREG_ROWS)
    itemsize = jnp.dtype(a.vals.dtype).itemsize
    col_bytes = (nc_pad + _VREG_ROWS) * itemsize
    mt = max(1, min(mt, _X_TILE_BUDGET // max(col_bytes, 1)))
    m_pad = -(-m // mt) * mt
    # windows may start in the last (partial) vreg of x: pad one extra vreg
    x2 = jnp.pad(
        xp.astype(a.vals.dtype),
        ((0, m_pad - m), (0, nc_pad + _VREG_ROWS - nc)),
    ).reshape(m_pad, -1, _LANES)

    grid = (m_pad // mt, nv // vb)
    f = pl.pallas_call(
        functools.partial(_spmm_kernel, c_max=cm, vb=vb, mt=mt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((mt,) + x2.shape[1:],
                             lambda t, v, s: (t, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, s: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, s: (v, _I0, _I0, _I0)),
            ],
            out_specs=pl.BlockSpec((mt, vb * 8, _LANES),
                                   lambda t, v, s: (t, v, _I0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, nv * 8, _LANES), a.vals.dtype),
        # the resident X tile (+ double buffering) exceeds Mosaic's 16 MB
        # default scoped-vmem budget at large nc; the chip has 128 MB
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
        ),
        interpret=interpret,
    )
    y2 = f(a.bases.reshape(-1), x2, a.idx, a.vals)
    return y2.reshape(m_pad, -1)[:m, :nr]


@functools.partial(jax.jit, static_argnames=(
    "interpret", "vb", "mt", "uvr", "n_units"))
def _spmm_windowed(a, xp, rel, ub, interpret=False, vb=8, mt=8, uvr=8,
                   n_units=2):
    """Plane-major windowed SpMM: xp (m, nc) -> (m, nr); see
    :func:`_spmm_kernel_win`."""
    nr, nc = a.shape
    nv, cm = a.bases.shape
    m = xp.shape[0]
    m_pad = -(-m // mt) * mt
    rows_x = n_units * uvr
    target = rows_x * _LANES
    xp = xp.astype(a.vals.dtype)
    if target < nc:
        # active windows never reach past ``target`` columns (the plan is
        # built from the activity ranges): the tail of x is dead weight
        xp = xp[:, :target]
    x3 = jnp.pad(
        xp, ((0, m_pad - m), (0, target - xp.shape[1]))
    ).reshape(m_pad, rows_x, _LANES)

    grid = (m_pad // mt, nv // vb)
    f = pl.pallas_call(
        functools.partial(_spmm_kernel_win, c_max=cm, vb=vb, mt=mt, uvr=uvr),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((mt, uvr, _LANES),
                             lambda t, v, sb, su: (t, su[v], _I0)),
                pl.BlockSpec((mt, uvr, _LANES),
                             lambda t, v, sb, su: (t, su[v] + 1, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, sb, su: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, sb, su: (v, _I0, _I0, _I0)),
            ],
            out_specs=pl.BlockSpec((mt, vb * 8, _LANES),
                                   lambda t, v, sb, su: (t, v, _I0)),
            scratch_shapes=[pltpu.VMEM((mt, 2 * uvr, _LANES), a.vals.dtype)],
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, nv * 8, _LANES), a.vals.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
        ),
        interpret=interpret,
    )
    y3 = f(rel, ub, x3, x3, a.idx, a.vals)
    return y3.reshape(m_pad, -1)[:m, :nr]


def _spmm_planes_real(a, xp, interpret, vb, mt, force=None):
    """Route a real plane-major SpMM to the windowed or resident kernel.

    Windowed wins whenever it makes more RHS columns resident than full-x
    residency allows (A then streams fewer times); ``force`` pins a path
    for tests."""
    nv = a.bases.shape[0]
    while nv % vb:
        vb //= 2
    vb = max(vb, 1)
    nr, nc = a.shape
    m = xp.shape[0]
    itemsize = jnp.dtype(a.vals.dtype).itemsize
    nc_pad = max(-(-nc // _VREG_ROWS) * _VREG_ROWS, _VREG_ROWS)
    mt_res = max(1, min(mt, _X_TILE_BUDGET
                        // ((nc_pad + _VREG_ROWS) * itemsize)))
    plan = None if force == "resident" else _window_plan(a, vb)
    if plan is not None:
        uvr, ub, rel, n_units = plan
        mt_win = max(1, min(m, _MT_CAP,
                            _X_TILE_BUDGET // (2 * uvr * _LANES * itemsize)))
        if force == "windowed" or (mt_win > mt_res and mt_win >= min(m, 4)):
            return _spmm_windowed(
                a, xp, jnp.asarray(rel), jnp.asarray(ub),
                interpret=interpret, vb=vb, mt=mt_win, uvr=uvr,
                n_units=n_units,
            )
    if force == "windowed":
        raise ValueError("well_spmm: no window plan available "
                         "(packing has no base ranges or operands traced)")
    if xp.shape[1] > nc:
        xp = xp[:, :nc]  # pre-padded planes: the resident path wants (m, nc)
    return _spmm_resident(a, xp, interpret=interpret, vb=vb, mt=mt)


def well_planes_width(a, vb: int = 8) -> int:
    """Kernel-native padded plane width for :func:`well_spmm_planes`.

    Iterative consumers that allocate their RHS block at this many columns
    (the tail beyond ``a.shape[1]`` MUST be zero) skip the wrapper's
    per-call pad/relayout of the whole block entirely — the pad becomes a
    no-op and the reshape a bitcast.  Falls back to ``a.shape[1]`` when
    the packing carries no window plan."""
    plan = _window_plan(a, vb)
    if plan is None:
        return int(a.shape[1])
    uvr, _, _, n_units = plan
    return n_units * uvr * _LANES


def well_spmm_planes(a, xp, interpret: bool | None = None, vb: int = 8,
                     mt: int = 8, _force=None):
    """Plane-major multi-RHS SpMM: ``xp`` of shape (m, nc), one RHS per ROW,
    returns (m, nr).  The kernel-native layout — iterative consumers that
    keep their block in plane-major chain SpMMs with zero transposes
    (:func:`well_spmm` is this plus a transpose on each side).  ``xp`` may
    also arrive pre-padded to ``well_planes_width(a)`` columns (tail
    zeros): then no per-call relayout happens at all."""
    xp = jnp.asarray(xp)
    ok_width = xp.ndim == 2 and (
        xp.shape[1] == a.shape[1]
        or xp.shape[1] == well_planes_width(a, vb)
    )
    if not ok_width:
        raise ValueError(
            f"well_spmm_planes: expected (m, {a.shape[1]}) planes (or the "
            f"pre-padded width well_planes_width(a)), got {xp.shape}"
        )
    if interpret is None:
        interpret = _interpret_default()
    if not interpret and jnp.dtype(a.vals.dtype).itemsize == 8:
        raise TypeError(
            "well_spmm: the TPU in-register gather has no 64-bit support; "
            "store the WELL in f32 (pair with iterative refinement), use "
            "BSR for f64 SpMM, or run off-TPU"
        )
    run = functools.partial(_spmm_planes_real, interpret=interpret, vb=vb,
                            mt=mt, force=_force)
    a_im = getattr(a, "vals_im", None)
    if a_im is None and not jnp.iscomplexobj(xp):
        return run(a, xp)
    return _complex_planes(run, a, xp)


def well_spmm(a, x, interpret: bool | None = None, vb: int = 8, mt: int = 8):
    """Y = A @ X for WELL storage, X dense (nc, m).  Real dtypes on TPU
    (32-bit); complex and f64 compose from real plane passes exactly like
    :func:`well_spmv`.  Column-major convenience over
    :func:`well_spmm_planes` — chained/iterative callers should hold their
    block plane-major and call that directly (saves two (n, m) relayouts
    per product)."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        return well_spmv(a, x, interpret=interpret)
    if x.shape[0] != a.shape[1]:
        raise ValueError(
            f"well_spmm: dimension mismatch {a.shape} @ {x.shape}"
        )
    return well_spmm_planes(a, x.T, interpret=interpret, vb=vb, mt=mt).T


def _complex_planes(run, a, x):
    """(Ar + iAi)(Xr + iXi) from real kernel passes: TPU gathers have no
    complex dtype, so each product runs the real kernel once; absent
    planes (real A or real X) are skipped entirely."""
    import dataclasses

    a_im = getattr(a, "vals_im", None)
    ar = a if a_im is None else dataclasses.replace(a, vals_im=None)
    xr = jnp.real(x).astype(a.vals.dtype)
    xi = (jnp.imag(x).astype(a.vals.dtype)
          if jnp.iscomplexobj(x) else None)
    y_re = run(ar, xr)
    y_im = jnp.zeros_like(y_re)
    if xi is not None:
        y_im = y_im + run(ar, xi)
    if a_im is not None:
        ai = dataclasses.replace(a, vals=a.vals_im, vals_im=None)
        y_im = y_im + run(ai, xr)
        if xi is not None:
            y_re = y_re - run(ai, xi)
    cdtype = jnp.complex128 if a.vals.dtype == jnp.float64 else jnp.complex64
    return (y_re + 1j * y_im).astype(cdtype)


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def well_spmv(a, x, interpret: bool | None = None, vb: int = 16):
    """y = A @ x for WELL storage.  ``interpret`` defaults to True off-TPU
    (CPU test meshes run the kernel through the Pallas interpreter)."""
    x = jnp.asarray(x)
    if x.shape[0] != a.shape[1]:
        raise ValueError(
            f"well_spmv: dimension mismatch {a.shape} @ {x.shape}"
        )
    if interpret is None:
        interpret = _interpret_default()
    if not interpret and jnp.dtype(a.vals.dtype).itemsize == 8:
        raise TypeError(
            "well_spmv: the TPU in-register gather has no 64-bit support; "
            "store the WELL in f32 and recover accuracy with iterative "
            "refinement (solve.api.solve_refined pattern), or run off-TPU"
        )
    a_im = getattr(a, "vals_im", None)
    if a_im is None and not jnp.iscomplexobj(x):
        return _well_spmv_real(a, x, interpret=interpret, vb=vb)
    run = functools.partial(_well_spmv_real, interpret=interpret, vb=vb)
    return _complex_planes(run, a, x)
