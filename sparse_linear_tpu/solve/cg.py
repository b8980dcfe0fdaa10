"""Iterative Krylov solvers (CG) over the sparse formats.

Not present in the reference (which only has the UMFPACK direct solver,
suitesparse/src/Numeric/LinearAlgebra/Umfpack.hs:38-50), but a first-class
TPU component: SpMV-rich iteration is exactly what the streaming formats are
fast at, and CG doubles as the iterative-refinement engine for the direct
solver's mixed-precision path.

All loops are ``lax`` control flow — single compiled XLA program per solve.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["cg", "CgResult"]


class CgResult(NamedTuple):
    """Structured solver report (SURVEY.md §5: return a SolveInfo instead of
    discarding convergence data like the reference does)."""

    x: jax.Array
    iterations: jax.Array
    residual_norm: jax.Array
    converged: jax.Array


def cg(
    matvec: Callable,
    b,
    x0=None,
    *,
    tol: float = 1e-10,
    maxiter: int = 1000,
    m_inv: Callable | None = None,
) -> CgResult:
    """Preconditioned conjugate gradients for SPD operators.

    ``matvec``: x -> A @ x (any callable closing over a sparse format).
    ``m_inv``: optional preconditioner r -> M^{-1} r.
    Stops at ||r|| <= tol * ||b|| or maxiter; always jit-safe
    (``lax.while_loop``).
    """
    b = jnp.asarray(b)
    x0 = jnp.zeros_like(b) if x0 is None else jnp.asarray(x0)
    precond = m_inv if m_inv is not None else (lambda r: r)

    r0 = b - matvec(x0)
    z0 = precond(r0)
    p0 = z0
    gamma0 = jnp.vdot(r0, z0).real
    bnorm = jnp.maximum(jnp.linalg.norm(b), jnp.finfo(b.dtype).tiny)
    atol2 = (tol * bnorm) ** 2

    def cond(state):
        _, r, _, _, k = state
        return (jnp.vdot(r, r).real > atol2) & (k < maxiter)

    def body(state):
        x, r, p, gamma, k = state
        ap = matvec(p)
        alpha = gamma / jnp.vdot(p, ap).real
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        gamma_new = jnp.vdot(r, z).real
        beta = gamma_new / gamma
        p = z + beta * p
        return (x, r, p, gamma_new, k + 1)

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x0, r0, p0, gamma0, 0))
    rnorm = jnp.linalg.norm(r)
    return CgResult(
        x=x,
        iterations=k,
        residual_norm=rnorm,
        converged=rnorm <= tol * bnorm,
    )
