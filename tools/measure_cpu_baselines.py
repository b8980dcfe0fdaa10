#!/usr/bin/env python
"""Measure the constant CPU-side baselines ONCE and write CPU_BASELINES.json.

Rationale (VERDICT r4, weak #1): bench.py re-measured in-process CPU
baselines (SuperLU 3D factorization, ARPACK shift-invert eigensolves) every
round, burning >300 s of the bench deadline on numbers that are constants of
the environment.  This script measures them once; bench.py reads the file
and re-measures only when ``BENCH_REMEASURE_CPU=1``.

Each entry records methodology + environment so the numbers stay auditable.
Run pieces selectively:  python tools/measure_cpu_baselines.py superlu_3d_64
"""

from __future__ import annotations

import json
import os
import platform
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "CPU_BASELINES.json")


def _load():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)
    return {"_environment": {
        "cpu": platform.processor() or platform.machine(),
        "n_cores": os.cpu_count(),
        "numpy": np.__version__,
        "note": "single-core VM host of the TPU tunnel; all baselines are "
                "in-process single-threaded scipy/numpy (the reference's "
                "own platform class)",
    }}


def _save(d):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=2, sort_keys=True)
    os.replace(tmp, OUT)


def measure_superlu_3d_64():
    """scipy SuperLU factorization of the 64^3 3D Poisson operator —
    the bench_lu_3d baseline (previously a 240 s timeout box each round)."""
    import scipy
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from sparse_linear_tpu.utils.grids import poisson_3d

    a = poisson_3d(64, dtype=np.float64)
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    ).tocsc()
    t0 = time.perf_counter()
    spl.splu(As)
    t = time.perf_counter() - t0
    return {
        "value_s": round(t, 2),
        "what": "scipy.sparse.linalg.splu on 64^3 (262144 dof) 3D Poisson, "
                "f64, COLAMD default ordering, single run (minutes-scale; "
                "run-to-run noise is irrelevant at this magnitude)",
        "scipy": scipy.__version__,
        "measured": "2026-08-21 round 5",
    }


def measure_arpack_36k():
    """ARPACK shift-invert (SuperLU factors) for 50 lowest eigenpairs of the
    192^2 2D Poisson operator — the bench_feast_50 baseline.  Records BOTH a
    cold (first-call, includes scipy import-side setup already done here) and
    warm (best of 3 repeat) number so the TPU warm-best-of-3 comparison is
    symmetric (VERDICT r4 weak #4)."""
    import scipy
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 192
    a = poisson_2d(g, dtype=np.float64)
    i = np.arange(1, g + 1)
    lam1d = 4 * np.sin(i * np.pi / (2 * (g + 1))) ** 2
    lam2d = np.sort((lam1d[:, None] + lam1d[None, :]).ravel())
    emax = float((lam2d[49] + lam2d[50]) / 2)
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    ).tocsc()

    t0 = time.perf_counter()
    spl.eigsh(As, k=50, sigma=emax / 2, which="LM")
    cold = time.perf_counter() - t0
    warm = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        spl.eigsh(As, k=50, sigma=emax / 2, which="LM")
        warm = min(warm, time.perf_counter() - t0)
    return {
        "cold_s": round(cold, 3),
        "warm_best3_s": round(warm, 3),
        "value_s": round(warm, 3),
        "what": "scipy eigsh shift-invert (SuperLU) k=50 sigma=mid-interval "
                "on 192^2 2D Poisson f64; value_s = warm best-of-3 "
                "(symmetric with the TPU side's warm best-of-3)",
        "scipy": scipy.__version__,
        "measured": "2026-08-21 round 5",
    }


def measure_arpack_1m():
    """ARPACK shift-invert for 50 lowest eigenpairs of the 1024^2 (1M dof)
    2D Poisson operator — the bench_feast_1m baseline."""
    import scipy
    import scipy.sparse as sp
    import scipy.sparse.linalg as spl

    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 1024
    a = poisson_2d(g, dtype=np.float64)
    i = np.arange(1, g + 1)
    lam1d = 4 * np.sin(i * np.pi / (2 * (g + 1))) ** 2
    lam2d = np.sort((lam1d[:, None] + lam1d[None, :]).ravel())
    emax = float((lam2d[49] + lam2d[50]) / 2)
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    ).tocsc()
    t0 = time.perf_counter()
    spl.eigsh(As, k=50, sigma=emax / 2, which="LM")
    t = time.perf_counter() - t0
    return {
        "value_s": round(t, 2),
        "what": "scipy eigsh shift-invert (SuperLU) k=50 sigma=mid-interval "
                "on 1024^2 (1048576 dof) 2D Poisson f64, single run "
                "(minutes-scale)",
        "scipy": scipy.__version__,
        "measured": "2026-08-21 round 5",
    }


def measure_spgemm_1m():
    """scipy CSR A@A on the 1024^2 2D Poisson operator — the bench_spgemm
    baseline (numeric+symbolic; scipy has no warm-pattern mode)."""
    import scipy
    import scipy.sparse as sp

    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(1024, dtype=np.float32)
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    As @ As
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        As @ As
        best = min(best, time.perf_counter() - t0)
    return {
        "value_s": round(best, 4),
        "what": "scipy csr_matrix A@A (both phases) on 1024^2 2D Poisson "
                "f32, best of 5",
        "scipy": scipy.__version__,
        "measured": "2026-08-21 round 5",
    }


def measure_numpy_f64_spmv():
    """numpy f64 shifted-fma DIA SpMV on 1448^2 2D Poisson — the
    bench_spmv_dia_f64 CPU baseline (GB/s over diagonals + x + y)."""
    from sparse_linear_tpu.utils.grids import poisson_2d

    grid = 1448
    a = poisson_2d(grid, dtype=np.float64, fmt="dia")
    n = grid * grid
    data_np = np.asarray(a.data)
    x_np = np.ones((n,), np.float64) / n
    offs = [int(o) for o in np.asarray(a.offsets)]
    pad_lo = max(0, -min(offs))
    pad_hi = max(0, max(offs))
    xp_np = np.pad(x_np, (pad_lo, pad_hi))
    bytes_moved = (data_np.size + 2 * n) * 8

    def cpu_spmv():
        y = np.zeros(n)
        for d, off in enumerate(offs):
            s = off + pad_lo
            y += data_np[d] * xp_np[s:s + n]
        return y

    cpu_spmv()
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        cpu_spmv()
        best = min(best, time.perf_counter() - t0)
    gbs = bytes_moved / best / 1e9
    return {
        "value_GBs": round(gbs, 2),
        "value_s": round(best, 4),
        "bytes_moved": bytes_moved,
        "what": "numpy f64 shifted-fma DIA SpMV on 1448^2 2D Poisson "
                "(diagonals + x + y streams), best of 5",
        "measured": "2026-08-21 round 5",
    }


MEASURES = {
    "superlu_3d_64": measure_superlu_3d_64,
    "arpack_36k": measure_arpack_36k,
    "arpack_1m": measure_arpack_1m,
    "spgemm_1m": measure_spgemm_1m,
    "numpy_f64_spmv_1448": measure_numpy_f64_spmv,
}


def main():
    names = sys.argv[1:] or list(MEASURES)
    for name in names:
        print(f"[{time.strftime('%H:%M:%S')}] measuring {name} ...",
              flush=True)
        t0 = time.perf_counter()
        result = MEASURES[name]()
        result["measure_wall_s"] = round(time.perf_counter() - t0, 1)
        d = _load()
        d[name] = result
        _save(d)
        print(f"[{time.strftime('%H:%M:%S')}] {name}: "
              f"{json.dumps(result)}", flush=True)


if __name__ == "__main__":
    main()
