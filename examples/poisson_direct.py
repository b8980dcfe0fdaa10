"""Direct solve walkthrough: the staged analyze -> factor -> solve pipeline.

Covers what the reference's UMFPACK layer offers (Umfpack.hs:38-102) plus
the extended factor-query surface.  Runs on CPU or TPU; f64 everywhere.

    python examples/poisson_direct.py
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import sparse_linear_tpu as sl
from sparse_linear_tpu.solve import api as solve
from sparse_linear_tpu.solve import multifrontal as mf
from sparse_linear_tpu.utils.grids import poisson_2d


def main():
    g = 64
    n = g * g
    a = poisson_2d(g, dtype=np.float64)  # 5-point stencil, CSR
    b = jnp.ones((n,), jnp.float64)

    # one-shot convenience (reference `linearSolve` / <\>)
    x = solve.linear_solve(a, b)
    print("one-shot residual:", float(solve.residual_norm(a, x, b)))

    # staged: one symbolic analysis, many numeric factorizations
    # (the FEAST usage pattern, Feast.hs:210-218)
    sym = mf.analyze(a, dims=(g, g))  # geometric nested dissection
    f = mf.factor(a, sym, kind="cholesky")  # SPD -> Cholesky fronts
    x = mf.solve(f, b)
    print("multifrontal residual:",
          float(jnp.linalg.norm(a @ x - b) / jnp.linalg.norm(b)))

    # transpose solves reuse the same factors (UMFPACK sys=0/1/2)
    xt = mf.solve(f, b, trans=True)
    del xt

    # mixed-precision refinement: f32 MXU factors + f64 residuals
    a32 = a.map_values(lambda v: v.astype(np.float32))
    f32 = mf.factor(a32, mf.analyze(a32, dims=(g, g)), kind="cholesky")
    x64, info = solve.solve_refined(f32, a, b, tol=1e-10)
    print("refined residual:", float(info.residual_norm),
          "steps:", info.refinement_steps, "converged:", info.converged)

    # factor queries (umfpack get_determinant / Info[RCOND] / get_numeric)
    sign, logabs = solve.slogdet(f)
    print("slogdet:", float(np.real(sign)), float(logabs))
    print("rcond estimate:", float(solve.rcond(f)))
    print("condest (1-norm):", solve.condest(f, a))
    L, U, rp, cp = solve.get_factors(f)
    print("factor nnz:", solve.lunz(f))

    # shifted batch: factor many value-sets over one pattern in one call
    shifts = [0.5, 1.0, 2.0]
    eye = sl.eye(n, dtype=jnp.float64)
    stacks = np.stack([
        np.asarray(sl.lin(1.0, a, -s, eye).data) for s in shifts
    ])
    pattern = sl.lin(1.0, a, -shifts[0], eye)
    fb = solve.factor_batched(pattern, stacks, mf.analyze(pattern,
                                                          dims=(g, g)))
    xs = solve.solve_batched(fb, jnp.broadcast_to(b, (3, n))[..., None])
    print("batched shifted solves:", xs.shape)


if __name__ == "__main__":
    main()
