"""Exact f64 matrix products on TPU.

The TPU's f64 emulation routes matrix contractions through MXU passes whose
*accumulation* carries f32-level rounding: a plain ``a @ b`` in f64 is exact
for short contraction dims (measured 2e-15 at k=256) but floors at ~2e-8
relative error once the contraction dimension reaches a few thousand,
REGARDLESS of ``default_matmul_precision`` and regardless of double-float
operand splitting (measured: native 6.1e-8, split-only 5.5e-8 at k=36864).
That silently floors any f64 algorithm built on tall-skinny matmuls (Gram
matrices, orthonormalization, Rayleigh-Ritz) around 1e-7.

``dot64`` restores ~1e-14 accuracy by combining TWO transformations:

1. double-float operand split: a = a_hi + a_lo with a_hi = f32(a), so each
   cross product has exactly-f32-representable operands (removes operand
   truncation error),
2. **chunked accumulation**: the contraction dimension is tiled into
   <=256-wide chunks contracted as a batched dot_general with
   ``preferred_element_type=f64`` (each chunk's accumulation is exact at
   that length — measured), and the per-chunk partial results are summed in
   true f64 on the VPU (exact adds).

Cost: 3 batched matmuls + one chunk-axis reduction.  On CPU (exact f64
matmuls) it passes through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dot64"]

_CHUNK = 256  # contraction lengths <= this accumulate exactly (measured)
_ROW_SEG = 1 << 17  # rows per scan step of the tall small-k path
_SUPER = 512  # chunks per scan step: bounds the (chunks, m, n) f64 temps —
              # an unbounded batched product at k=1M and (80, 80) output is
              # ~840 MB PER TERM of transient HBM (OOM observed in the 1M-dof
              # streaming-FEAST Gram); 512 chunks cap it at ~26 MB/step


def _needs_split(*arrays) -> bool:
    if jax.default_backend() == "cpu":
        return False
    return any(jnp.asarray(a).dtype == jnp.float64 for a in arrays)


def dot64(a, b):
    """Exact-f64 ``a @ b`` (2-D x 2-D) on TPU; plain matmul elsewhere.

    Error measured at 1e-14 relative for contraction dim 36864 (vs 6e-8 for
    the native f64 matmul and for split-only variants — the MXU accumulates
    at f32 resolution over long contractions, so the split must be paired
    with chunked f64 reaccumulation)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not _needs_split(a, b):
        return a @ b
    return _dot64_split(a, b)


def _dot64_split(a, b):
    """The split+chunked implementation (runs on any backend — CPU tests
    drive it directly, since ``dot64`` passes through to ``@`` off-TPU)."""
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"dot64: inner dims mismatch {a.shape} @ {b.shape}")

    a_hi = a.astype(jnp.float32)
    a_lo = (a - a_hi.astype(jnp.float64)).astype(jnp.float32)
    b_hi = b.astype(jnp.float32)
    b_lo = (b - b_hi.astype(jnp.float64)).astype(jnp.float32)

    if k <= _CHUNK:
        def mm(p, q):
            return jax.lax.dot_general(
                p, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float64,
            )

        def block_mm(p_hi, p_lo):
            if 3 * k <= _CHUNK:
                # fuse the three cross terms into ONE contraction of
                # length 3k (still inside the exact-accumulation bound):
                # a single f64 output instead of three coexisting ones
                return mm(
                    jnp.concatenate([p_hi, p_hi, p_lo], axis=1),
                    jnp.concatenate([b_hi, b_lo, b_hi], axis=0),
                )
            return (mm(p_hi, b_hi) + mm(p_hi, b_lo)) + mm(p_lo, b_hi)

        if m > 2 * _ROW_SEG:
            # tall-m: scan row blocks so the transient arena stays
            # bounded whatever m is — the 1M x 80 FEAST whiten/Ritz
            # rotations OOMed the runtime's per-program temp budget with
            # the full-height operand splits + output all live at once
            nb = -(-m // _ROW_SEG)
            mpad = nb * _ROW_SEG
            if mpad != m:
                a_hi = jnp.pad(a_hi, ((0, mpad - m), (0, 0)))
                a_lo = jnp.pad(a_lo, ((0, mpad - m), (0, 0)))

            def step(c, i):
                p_hi = jax.lax.dynamic_slice_in_dim(
                    a_hi, i * _ROW_SEG, _ROW_SEG, 0)
                p_lo = jax.lax.dynamic_slice_in_dim(
                    a_lo, i * _ROW_SEG, _ROW_SEG, 0)
                return c, block_mm(p_hi, p_lo)

            _, blocks = jax.lax.scan(step, 0, jnp.arange(nb))
            return blocks.reshape(mpad, n)[:m]
        return block_mm(a_hi, a_lo)

    nc = -(-k // _CHUNK)
    pad = nc * _CHUNK - k
    if pad:
        a_hi = jnp.pad(a_hi, ((0, 0), (0, pad)))
        a_lo = jnp.pad(a_lo, ((0, 0), (0, pad)))
        b_hi = jnp.pad(b_hi, ((0, pad), (0, 0)))
        b_lo = jnp.pad(b_lo, ((0, pad), (0, 0)))
    # batch over chunks WITHOUT materializing a chunk-major lhs: the batch
    # dim can sit at axis 1 of the (m, nc, C) reshape (dot_general allows
    # batch dims anywhere) — the old .transpose(1, 0, 2) copied the whole
    # lhs, +1 GB of transient HBM per Gram at (1M, 128) blocks
    ar_hi = a_hi.reshape(m, nc, _CHUNK)
    ar_lo = a_lo.reshape(m, nc, _CHUNK)
    br_hi = b_hi.reshape(nc, _CHUNK, n)
    br_lo = b_lo.reshape(nc, _CHUNK, n)

    def bmm(p, q):
        return jax.lax.dot_general(
            p, q, (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.float64,
        )

    # chunk-sum each term IMMEDIATELY: the batched (nc, m, n) f64 products
    # are ~1 GB each at (1M, 128) blocks, and holding all three before the
    # final reduction tripled the transient HBM (OOM observed in the
    # eigensolver's expanded Rayleigh-Ritz)
    if nc <= _SUPER:
        out = bmm(ar_hi, br_hi).sum(axis=0)
        out = out + bmm(ar_hi, br_lo).sum(axis=0)
        return out + bmm(ar_lo, br_hi).sum(axis=0)

    # very long contractions (k > _SUPER*_CHUNK = 128k): scan over
    # super-chunks so the batched temp stays (_SUPER, m, n) regardless of k
    ns = -(-nc // _SUPER)
    spad = ns * _SUPER - nc
    if spad:
        ar_hi = jnp.pad(ar_hi, ((0, 0), (0, spad), (0, 0)))
        ar_lo = jnp.pad(ar_lo, ((0, 0), (0, spad), (0, 0)))
        br_hi = jnp.pad(br_hi, ((0, spad), (0, 0), (0, 0)))
        br_lo = jnp.pad(br_lo, ((0, spad), (0, 0), (0, 0)))

    def step(acc, i):
        p_hi = jax.lax.dynamic_slice_in_dim(ar_hi, i * _SUPER, _SUPER, 1)
        p_lo = jax.lax.dynamic_slice_in_dim(ar_lo, i * _SUPER, _SUPER, 1)
        q_hi = jax.lax.dynamic_slice_in_dim(br_hi, i * _SUPER, _SUPER, 0)
        q_lo = jax.lax.dynamic_slice_in_dim(br_lo, i * _SUPER, _SUPER, 0)
        t = bmm(p_hi, q_hi).sum(axis=0)
        t = t + bmm(p_hi, q_lo).sum(axis=0)
        t = t + bmm(p_lo, q_hi).sum(axis=0)
        return acc + t, None

    out, _ = jax.lax.scan(
        step, jnp.zeros((m, n), jnp.float64), jnp.arange(ns)
    )
    return out
