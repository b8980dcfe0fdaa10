"""Double-float f64 SpMV for WELL storage (unstructured patterns, 64-bit).

The reference is Double-native end to end (SPECIALIZE pragmas,
reference: sparse-linear/src/Data/Matrix/Sparse.hs:456-457); the TPU has no
64-bit in-register gather, so :mod:`spmv_well`'s kernels are 32-bit by
design.  This module closes the dtype gap with the classic double-float
(paired-f32) representation:

    a = hi + lo,   |lo| <= ulp(hi)/2        (hi = f32(a), lo = f32(a - hi))

Storage: ONE WELL packing (placement computed from the f64 values) carrying
two f32 value planes; x is split into hi/lo planes at call time.  Per chunk
the kernel gathers BOTH x planes with the same index plane and accumulates

    a.x  ~=  sum  TwoProd(v_hi, g_hi)  +  v_hi*g_lo  +  v_lo*g_hi

into a compensated (hi, lo) accumulator pair:

  * ``TwoProd`` uses an explicit Veltkamp split (exact 12+12-bit factor
    halves) so the error term is exact whether or not the compiler
    contracts mul+add into fma — the usual trap in compensated kernels.
  * The dominant product enters via ``TwoSum`` (6 flops, exact); the
    O(2^-24)-relative cross terms and errors accumulate in the plain f32
    ``lo`` plane, whose own rounding is O(2^-48) relative to the result.

Final y = hi + lo summed in f64 outside the kernel.  Accuracy: ~1e-13
relative worst case at c_max ~ 64 (vs ~1e-7 for naive f32 and ~1e-16 for
hardware f64) — within iterative-refinement reach of full f64, at the
16 B/entry streaming rate of the chunk planes instead of XLA's ~1 GB/s
scattered f64 gather.

The reference op this accelerates: ``mulV``/``axpy_`` at Double
(reference: sparse-linear/src/Data/Matrix/Sparse.hs:433-471).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sparse_linear_tpu.formats.base import pytree_dataclass
from sparse_linear_tpu.kernels.spmv_well import (
    _gather_lanes, _gather_sublanes, _I0, _LANES, _VREG_ROWS,
)

__all__ = ["WELL64", "csr_to_well64", "well_spmv64", "well_spmm64_planes"]

_SPLIT = np.float32(4097.0)  # Veltkamp constant for f32: 2^ceil(24/2) + 1


def _require_x64(name: str) -> None:
    """The apply-side interface arrays (x split, y = hi + lo) are f64; with
    x64 disabled they silently truncate to f32 and the kernel's ~1e-13
    contract degrades to ~5e-8 with only a generic dtype warning (ADVICE
    r4).  Packing (:func:`csr_to_well64`) works either way — it scopes x64
    itself."""
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            f"{name}: jax_enable_x64 is disabled — the f64 input/output "
            "arrays would silently truncate to f32. Enable x64 "
            "(jax.config.update('jax_enable_x64', True)) or use the f32 "
            "WELL kernels."
        )


@pytree_dataclass(meta_fields=())
class WELL64:
    """Double-float WELL: the hi plane rides a standard f32 WELL packing
    (so every 32-bit kernel/plan applies to it), vals_lo is the matching
    low-order plane."""

    well: object       # WELL with f32 vals = hi plane (window plan attached)
    vals_lo: jax.Array  # (n_vregs, c_max, 8, 128) f32 low-order plane

    @property
    def shape(self):
        return self.well.shape

    @property
    def dtype(self):
        return jnp.float64

    def __matmul__(self, x):
        return well_spmv64(self, jnp.asarray(x))


def csr_to_well64(mat, c_max: int | None = None) -> WELL64:
    """Pack an f64 CSR into double-float WELL storage (host-side,
    analyze-time artifact like :func:`csr_to_well`)."""
    import dataclasses

    from sparse_linear_tpu.formats.well import csr_to_well

    if np.iscomplexobj(np.asarray(mat.data)):
        raise TypeError("csr_to_well64: complex input — use csr_to_well "
                        "(two value planes) instead")
    # pack under a SCOPED x64 so the f64 value planes survive jnp
    # conversion even when the global flag is off — without this the hi
    # plane silently absorbed the full value and lo came out all zero,
    # degrading well_spmv64 to ~1e-7 f32 accuracy against its ~1e-13
    # contract (ADVICE r4)
    with jax.enable_x64():
        w64 = csr_to_well(mat, c_max=c_max)  # f64 planes, placement from values
        v64 = np.asarray(w64.vals, dtype=np.float64)
    if v64.dtype != np.float64:  # pragma: no cover - defensive
        raise TypeError("csr_to_well64: value planes lost f64 precision "
                        "during packing")
    hi = v64.astype(np.float32)
    lo = (v64 - hi.astype(np.float64)).astype(np.float32)
    w_hi = dataclasses.replace(w64, vals=jnp.asarray(hi))
    return WELL64(well=w_hi, vals_lo=jnp.asarray(lo))


def _two_prod(a, b, z):
    """(p, e) with a*b = p + e exactly; explicit Veltkamp split so the
    error term survives both fma-contracting and non-contracting
    compilations.

    ``z`` is a RUNTIME zero plane: ``p + z`` forces the rounded product to
    materialize before it reaches the accumulator.  Without it the backend
    contracts the downstream ``acc + p`` into ``fma(a, b, acc)`` — a
    differently-rounded sum than the ``p`` the error term was computed
    against, silently un-compensating the accumulator pair (observed:
    f32-level error on XLA:CPU; ``lax.optimization_barrier`` does NOT
    survive to the LLVM stage where the contraction happens).  The trick is
    sound even if ``p + z`` itself contracts: fma(a, b, 0) rounds to
    exactly ``p``, and an add/fma result is never fused into a later add."""
    p = a * b + z
    ca = a * _SPLIT
    a1 = ca - (ca - a)
    a2 = a - a1
    cb = b * _SPLIT
    b1 = cb - (cb - b)
    b2 = b - b1
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def _two_sum(a, b):
    """(s, e) with a + b = s + e exactly (Knuth; no magnitude ordering)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _kernel_df64(bases_ref, zero_ref, xh_ref, xl_ref, idx_ref, vh_ref,
                 vl_ref, oh_ref, ol_ref, *, c_max: int, vb: int):
    step = pl.program_id(0)
    z = zero_ref[...]  # runtime zeros: anti-contraction (see _two_prod)
    for b in range(vb):
        acc_h = jnp.zeros((8, _LANES), jnp.float32)
        acc_l = jnp.zeros((8, _LANES), jnp.float32)
        for c in range(c_max):
            base = bases_ref[(step * vb + b) * c_max + c]
            packed = idx_ref[b, c]
            hi = packed >> 7
            lo = packed & 127
            wh = xh_ref[pl.ds(base, 8), :]
            wl = xl_ref[pl.ds(base, 8), :]
            gh = _gather_lanes(_gather_sublanes(wh, hi), lo)
            gl = _gather_lanes(_gather_sublanes(wl, hi), lo)
            vh = vh_ref[b, c]
            vl = vl_ref[b, c]
            p, pe = _two_prod(vh, gh, z)
            small = pe + vh * gl + vl * gh
            acc_h, se = _two_sum(acc_h, p)
            acc_l = acc_l + (se + small)
        oh_ref[pl.ds(b * 8, 8), :] = acc_h
        ol_ref[pl.ds(b * 8, 8), :] = acc_l


@functools.partial(jax.jit, static_argnames=("interpret", "vb"))
def _well_spmv_df64(a64, x, zero, interpret=False, vb=16):
    a = a64.well
    nr, nc = a.shape
    nv, cm = a.bases.shape
    while nv % vb:
        vb //= 2
    vb = max(vb, 1)
    nc_pad = max(-(-nc // _VREG_ROWS) * _VREG_ROWS, _VREG_ROWS)
    x64 = x.astype(jnp.float64)
    xh = x64.astype(jnp.float32)
    xl = (x64 - xh.astype(jnp.float64)).astype(jnp.float32)
    pad = (0, nc_pad + _VREG_ROWS - nc)
    xh2 = jnp.pad(xh, pad).reshape(-1, _LANES)
    xl2 = jnp.pad(xl, pad).reshape(-1, _LANES)

    grid = (nv // vb,)
    f = pl.pallas_call(
        functools.partial(_kernel_df64, c_max=cm, vb=vb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, _LANES), lambda v, s: (_I0, _I0)),
                pl.BlockSpec(xh2.shape, lambda v, s: (_I0, _I0)),
                pl.BlockSpec(xl2.shape, lambda v, s: (_I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda v, s: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda v, s: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda v, s: (v, _I0, _I0, _I0)),
            ],
            out_specs=[
                pl.BlockSpec((vb * 8, _LANES), lambda v, s: (v, _I0)),
                pl.BlockSpec((vb * 8, _LANES), lambda v, s: (v, _I0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nv * 8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((nv * 8, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )
    yh, yl = f(a.bases.reshape(-1), zero, xh2, xl2, a.idx, a.vals,
               a64.vals_lo)
    y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return y.reshape(-1)[:nr]


def _kernel_spmm_df64(bases_ref, zero_ref, xh_ref, xl_ref, idx_ref, vh_ref,
                      vl_ref, oh_ref, ol_ref, *, c_max: int, vb: int,
                      mt: int):
    """Multi-RHS double-float kernel: resident-X plane-major layout (the
    f32 :func:`spmv_well._spmm_kernel` structure) with the compensated
    (hi, lo) accumulation of :func:`_kernel_df64` per RHS plane."""
    step_v = pl.program_id(1)
    z = zero_ref[...]
    for b in range(vb):
        acc_h = [jnp.zeros((8, _LANES), jnp.float32) for _ in range(mt)]
        acc_l = [jnp.zeros((8, _LANES), jnp.float32) for _ in range(mt)]
        for c in range(c_max):
            base = bases_ref[(step_v * vb + b) * c_max + c]
            packed = idx_ref[b, c]
            hi = packed >> 7
            lo = packed & 127
            vh = vh_ref[b, c]
            vl = vl_ref[b, c]
            for t in range(mt):
                gh = _gather_lanes(_gather_sublanes(
                    xh_ref[t, pl.ds(base, 8), :], hi), lo)
                gl = _gather_lanes(_gather_sublanes(
                    xl_ref[t, pl.ds(base, 8), :], hi), lo)
                p, pe = _two_prod(vh, gh, z)
                small = pe + vh * gl + vl * gh
                acc_h[t], se = _two_sum(acc_h[t], p)
                acc_l[t] = acc_l[t] + (se + small)
        for t in range(mt):
            oh_ref[t, pl.ds(b * 8, 8), :] = acc_h[t]
            ol_ref[t, pl.ds(b * 8, 8), :] = acc_l[t]


@functools.partial(jax.jit, static_argnames=("interpret", "vb", "mt"))
def _well_spmm_df64(a64, xp, zero, interpret=False, vb=8, mt=8):
    a = a64.well
    nr, nc = a.shape
    nv, cm = a.bases.shape
    m = xp.shape[0]
    while nv % vb:
        vb //= 2
    vb = max(vb, 1)
    nc_pad = max(-(-nc // _VREG_ROWS) * _VREG_ROWS, _VREG_ROWS)
    # both x planes sit resident in VMEM: halve the f32 kernel's tile budget
    from sparse_linear_tpu.kernels.spmv_well import _X_TILE_BUDGET

    col_bytes = (nc_pad + _VREG_ROWS) * 4
    mt = max(1, min(mt, _X_TILE_BUDGET // max(2 * col_bytes, 1)))
    m_pad = -(-m // mt) * mt
    x64 = xp.astype(jnp.float64)
    xh = x64.astype(jnp.float32)
    xl = (x64 - xh.astype(jnp.float64)).astype(jnp.float32)
    pad = ((0, m_pad - m), (0, nc_pad + _VREG_ROWS - nc))
    xh3 = jnp.pad(xh, pad).reshape(m_pad, -1, _LANES)
    xl3 = jnp.pad(xl, pad).reshape(m_pad, -1, _LANES)

    grid = (m_pad // mt, nv // vb)
    f = pl.pallas_call(
        functools.partial(_kernel_spmm_df64, c_max=cm, vb=vb, mt=mt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, _LANES), lambda t, v, s: (_I0, _I0)),
                pl.BlockSpec((mt,) + xh3.shape[1:],
                             lambda t, v, s: (t, _I0, _I0)),
                pl.BlockSpec((mt,) + xl3.shape[1:],
                             lambda t, v, s: (t, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, s: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, s: (v, _I0, _I0, _I0)),
                pl.BlockSpec((vb, cm, 8, _LANES),
                             lambda t, v, s: (v, _I0, _I0, _I0)),
            ],
            out_specs=[
                pl.BlockSpec((mt, vb * 8, _LANES),
                             lambda t, v, s: (t, v, _I0)),
                pl.BlockSpec((mt, vb * 8, _LANES),
                             lambda t, v, s: (t, v, _I0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, nv * 8, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, nv * 8, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
        ),
        interpret=interpret,
    )
    yh, yl = f(a.bases.reshape(-1), zero, xh3, xl3, a.idx, a.vals,
               a64.vals_lo)
    y = yh.astype(jnp.float64) + yl.astype(jnp.float64)
    return y.reshape(m_pad, -1)[:m, :nr]


def well_spmm64_planes(a64: WELL64, xp, interpret: bool | None = None,
                       vb: int = 8, mt: int = 8):
    """Y = A @ X in double-float precision, plane-major: ``xp`` (m, nc),
    one RHS per row; returns (m, nr) f64 at ~1e-13 relative.

    The f64 analog of :func:`spmv_well.well_spmm_planes` (the FEAST
    ijob=30/40 hot multiply, reference Feast.hs:203-208, at Double)."""
    from sparse_linear_tpu.kernels.spmv_well import _interpret_default

    _require_x64("well_spmm64_planes")
    xp = jnp.asarray(xp)
    if xp.ndim != 2 or xp.shape[1] != a64.shape[1]:
        raise ValueError(
            f"well_spmm64_planes: expected (m, {a64.shape[1]}) planes, "
            f"got {xp.shape}"
        )
    if jnp.iscomplexobj(xp):
        yr = well_spmm64_planes(a64, jnp.real(xp), interpret=interpret,
                                vb=vb, mt=mt)
        yi = well_spmm64_planes(a64, jnp.imag(xp), interpret=interpret,
                                vb=vb, mt=mt)
        return yr + 1j * yi
    if interpret is None:
        interpret = _interpret_default()
    zero = jnp.zeros((8, _LANES), jnp.float32)
    return _well_spmm_df64(a64, xp, zero, interpret=interpret, vb=vb, mt=mt)


def well_spmv64(a64: WELL64, x, interpret: bool | None = None):
    """y = A @ x in double-float precision; x any real dtype, returns f64.

    Relative accuracy ~1e-13 (see module docstring) — pair with one step of
    f64 iterative refinement where full 1e-16 dot products are required.
    """
    from sparse_linear_tpu.kernels.spmv_well import _interpret_default

    _require_x64("well_spmv64")
    x = jnp.asarray(x)
    if x.ndim != 1 or x.shape[0] != a64.shape[1]:
        raise ValueError(
            f"well_spmv64: dimension mismatch {a64.shape} @ {x.shape}"
        )
    if jnp.iscomplexobj(x):
        yr = well_spmv64(a64, jnp.real(x), interpret=interpret)
        yi = well_spmv64(a64, jnp.imag(x), interpret=interpret)
        return yr + 1j * yi
    if interpret is None:
        interpret = _interpret_default()
    # runtime zeros: MUST be a device argument, not a traced constant —
    # a constant zero gets folded and re-exposes the fma contraction that
    # un-compensates the accumulator (see _two_prod)
    zero = jnp.zeros((8, _LANES), jnp.float32)
    return _well_spmv_df64(a64, x, zero, interpret=interpret)
