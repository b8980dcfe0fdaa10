"""Exact f64 matrix products on TPU.

The TPU's f64 emulation routes matrix-matrix contractions through MXU
passes that truncate the operands to f32: a plain ``a @ b`` in f64 carries
a ~2.6e-8 relative error on this stack REGARDLESS of the
``default_matmul_precision`` setting (measured; matrix-VECTOR products on
the VPU are exact).  That silently floors any f64 algorithm built on
matmuls (Gram matrices, tall-skinny orthonormalization, Rayleigh-Ritz)
around 1e-7.

``dot64`` restores full f64 accuracy with the classic double-float split:
a = a_hi + a_lo with a_hi = f32(a); each of the three cross products has
exactly-f32-representable operands, so the truncating matmul loses
nothing, and the f64 accumulation keeps ~1e-15:

    a @ b = a_hi b_hi + a_hi b_lo + a_lo b_hi   (+ a_lo b_lo ~ 1e-32)

Cost: 3 matmuls + 4 casts.  On CPU (exact f64 matmuls) it passes through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dot64"]


def _needs_split(*arrays) -> bool:
    if jax.default_backend() == "cpu":
        return False
    return any(jnp.asarray(a).dtype == jnp.float64 for a in arrays)


def dot64(a, b):
    """Exact-f64 ``a @ b`` (2-D x 2-D) on TPU; plain matmul elsewhere.

    The split pieces are contracted as f32 dot_generals with
    ``preferred_element_type=f64`` — XLA then emulates an exact f64
    accumulation of exact f32 products (measured 4e-15 vs 2.6e-8 for the
    native f64 matmul).  Splitting alone is NOT enough: an f64 matmul of
    the f32-exact pieces still accumulates in the truncating pipeline."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if not _needs_split(a, b):
        return a @ b
    a_hi32 = a.astype(jnp.float32)
    a_lo32 = (a - a_hi32.astype(jnp.float64)).astype(jnp.float32)
    b_hi32 = b.astype(jnp.float32)
    b_lo32 = (b - b_hi32.astype(jnp.float64)).astype(jnp.float32)

    def mm(p, q):
        return jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float64,
        )

    return (mm(a_hi32, b_hi32) + mm(a_hi32, b_lo32)) + mm(a_lo32, b_hi32)
