#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.md config 1 analog, scaled to fill the chip): SpMV
effective bandwidth on a 2D Poisson operator in DIA format, f32, on the
default accelerator.  ``vs_baseline`` is the achieved fraction of the
BASELINE.json target (80% of v5e HBM roofline ~819 GB/s -> 655 GB/s).

Usage: python bench.py [--all]   (--all prints extra per-op lines to stderr)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBS = 819.0
TARGET_GBS = 0.8 * V5E_HBM_GBS


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
    from sparse_linear_tpu.kernels.spmv import dia_spmv
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(grid, dtype=np.dtype(dtype), fmt="dia")
    n = grid * grid
    x = jnp.ones((n,), dtype)
    f = jax.jit(dia_spmv)
    dt = _time_fn(f, a, x)
    itemsize = jnp.dtype(dtype).itemsize
    bytes_moved = (a.data.size + 2 * n) * itemsize  # diagonals + x + y
    gbs = bytes_moved / dt / 1e9
    return {
        "metric": f"spmv_dia_2d_poisson_{n}_f32_GBs",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbs / TARGET_GBS, 4),
    }


def bench_spmv_csr(grid=512, dtype=jnp.float32):
    """Secondary: general CSR path (gather + segment-sum)."""
    from sparse_linear_tpu.ops.linalg import spmv
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(grid, dtype=np.dtype(dtype))
    n = grid * grid
    x = jnp.ones((n,), dtype)
    f = jax.jit(spmv)
    dt = _time_fn(f, a, x, iters=20)
    itemsize = jnp.dtype(dtype).itemsize
    nnz = a.nnz
    bytes_moved = nnz * (itemsize + 4) + 2 * n * itemsize
    gbs = bytes_moved / dt / 1e9
    return {
        "metric": f"spmv_csr_2d_poisson_{n}_f32_GBs",
        "value": round(gbs, 2),
        "unit": "GB/s",
        "vs_baseline": round(gbs / TARGET_GBS, 4),
    }


def main():
    result = bench_spmv_dia()
    if "--all" in sys.argv:
        print(json.dumps(bench_spmv_csr()), file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
