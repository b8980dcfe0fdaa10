"""Interop + serialization tests.

The roundtrip invariant mirrors the reference's FFI test
(fromForeign . withConstMatrix == id, sparse-linear/tests/Sparse.hs:139-145).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from sparse_linear_tpu.interop.scipy_io import (
    from_arrays,
    from_scipy,
    to_arrays,
    to_scipy,
)
from sparse_linear_tpu.ops.linalg import spmv
from sparse_linear_tpu.solve import api as solve_api
from sparse_linear_tpu.solve import multifrontal as mf
from sparse_linear_tpu.utils.grids import poisson_2d
from sparse_linear_tpu.utils.serialize import (
    load_factors,
    load_subspace,
    save_factors,
    save_subspace,
)
from tests.conftest import random_coo


def rand_csr(rng, nr, nc, dtype):
    rows, cols, vals = random_coo(rng, nr, nc, dtype)
    return sl.from_triples((nr, nc), rows, cols, vals).tocsr()


@pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
def test_arrays_roundtrip(fmt, rng, dtype):
    m = rand_csr(rng, 7, 9, dtype)
    m = getattr(m, f"to{fmt}")()
    d = to_arrays(m)
    back = from_arrays(d)
    np.testing.assert_array_equal(
        np.asarray(back.todense()), np.asarray(m.todense())
    )
    sl.check_matrix(back if fmt != "coo" else sl.trim(back))


@pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
def test_scipy_roundtrip(fmt, rng, dtype):
    pytest.importorskip("scipy.sparse")
    m = rand_csr(rng, 6, 8, dtype)
    m = getattr(m, f"to{fmt}")()
    sp = to_scipy(m)
    assert sp.format == fmt
    back = from_scipy(sp)
    np.testing.assert_array_equal(
        np.asarray(back.todense()), np.asarray(m.todense())
    )


def test_scipy_import_renormalizes(rng):
    """Import path dedups like the reference fromForeign (Foreign.hs:74-78)."""
    sp_sparse = pytest.importorskip("scipy.sparse")
    # scipy COO with duplicate coordinates
    m = sp_sparse.coo_matrix(
        (np.array([1.0, 2.0, 5.0]), (np.array([0, 0, 1]), np.array([0, 0, 1]))),
        shape=(2, 2),
    )
    back = from_scipy(m, fmt="csr")
    sl.check_matrix(back)
    np.testing.assert_array_equal(
        np.asarray(back.todense()), np.array([[3.0, 0.0], [0.0, 5.0]])
    )


def test_columns_roundtrip(rng, dtype):
    m = rand_csr(rng, 6, 5, dtype)
    cols = sl.to_columns(m)
    assert len(cols) == 5
    back = sl.from_columns(cols)
    np.testing.assert_array_equal(
        np.asarray(back.todense()), np.asarray(m.todense())
    )
    rows = sl.to_rows(m)
    back2 = sl.from_rows(rows)
    np.testing.assert_array_equal(
        np.asarray(back2.todense()), np.asarray(m.todense())
    )


def test_save_load_dense_factors(tmp_path, rng):
    a = poisson_2d(6, dtype=np.float64)
    f = solve_api.factor(a)
    p = tmp_path / "dense.npz"
    save_factors(p, f)
    f2 = load_factors(p)
    b = rng.standard_normal(36)
    x = solve_api.solve(f2, jnp.asarray(b))
    assert float(solve_api.residual_norm(a, x, b)) < 1e-12


def test_save_load_multifrontal_factors(tmp_path, rng):
    g = 8
    a = poisson_2d(g, dtype=np.float64)
    f = mf.factor(a, mf.analyze(a, dims=(g, g)))
    p = tmp_path / "mf.npz"
    save_factors(p, f)
    f2 = load_factors(p, mat=a)
    b = rng.standard_normal(g * g)
    x = mf.solve(f2, jnp.asarray(b))
    r = float(jnp.linalg.norm(spmv(a, x) - jnp.asarray(b)) / np.linalg.norm(b))
    assert r < 1e-12
    # same size but different pattern rejected
    from sparse_linear_tpu.utils.grids import laplacian_1d

    with pytest.raises(ValueError, match="pattern"):
        load_factors(p, mat=laplacian_1d(g * g, dtype=np.float64))
    # wrong size rejected
    with pytest.raises(ValueError, match="perm"):
        load_factors(p, mat=poisson_2d(7, dtype=np.float64))


def test_save_load_scaled_batched_factors(tmp_path, rng):
    """Round-trip of the equilibration pseudo-bucket and the batch count:
    a scaled batched artifact restores to working solves with per-set
    unscaling intact."""
    g = 6
    n = g * g
    a = poisson_2d(g, dtype=np.float64)
    sym = mf.analyze(a, dims=(g, g))
    data0 = np.asarray(a.tocsr().data)
    fb = mf.factor_batched(np.stack([data0, 3.0 * data0]), sym, scale="sum")
    p = tmp_path / "mf_scaled.npz"
    save_factors(p, fb)
    f2 = load_factors(p, mat=a)
    assert getattr(f2, "batch", None) == 2
    np.testing.assert_allclose(f2.row_scale, fb.row_scale)
    b = rng.standard_normal(n)
    xb = mf.solve_batched(f2, np.stack([b[:, None]] * 2))
    dense = np.asarray(a.todense())
    for e, m in enumerate((dense, 3.0 * dense)):
        r = np.linalg.norm(m @ np.asarray(xb[e][:, 0]) - b)
        assert r / np.linalg.norm(b) < 1e-10


def test_save_load_dense_batched_factors(tmp_path, rng):
    """Dense batched artifacts keep their batch count across a round-trip,
    so the batch-aware queries (get_factors index guard, slogdet shapes)
    keep working on restored factors."""
    n = 12
    from sparse_linear_tpu.utils.grids import laplacian_1d

    a = laplacian_1d(n, dtype=np.float64)
    sym = solve_api.analyze(a)
    data0 = np.asarray(a.tocsr().data)
    fb = solve_api.factor_batched(a, np.stack([data0, 2.0 * data0]), sym)
    p = tmp_path / "dense_batched.npz"
    save_factors(p, fb)
    f2 = load_factors(p)
    assert getattr(f2, "batch", None) == 2
    with pytest.raises(ValueError, match="index"):
        solve_api.get_factors(f2)
    L, U, rp, cp = solve_api.get_factors(f2, index=1)
    dense = 2.0 * np.asarray(a.todense())
    err = np.max(np.abs(
        np.asarray(L.todense()) @ np.asarray(U.todense())
        - dense[np.ix_(rp, cp)]
    ))
    assert err < 1e-12 * np.max(np.abs(dense))
    s, l = solve_api.slogdet(f2)
    assert s.shape == (2,) and l.shape == (2,)


def test_save_load_subspace(tmp_path):
    from sparse_linear_tpu.eig.feast import FeastParams, eigsh
    from sparse_linear_tpu.utils.grids import laplacian_1d

    a = laplacian_1d(16, dtype=np.float64)
    res = eigsh(6, (0.2, 1.2), a, FeastParams(tol=1e-12))
    p = tmp_path / "sub.npz"
    save_subspace(p, res)
    sub = load_subspace(p)
    res2 = eigsh(6, (0.2, 1.2), a, FeastParams(tol=1e-12), guess=sub)
    assert res2.iterations <= res.iterations
    np.testing.assert_allclose(res2.values, res.values, rtol=1e-10)


@pytest.mark.slow
def test_well_checkpoint_roundtrip(tmp_path, rng):
    """WELL packings persist and reload bit-identically (the SpMV analyze
    artifact; reference had reuse but no persistence, SURVEY.md §5)."""
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.kernels.spmv_well import well_spmv
    from sparse_linear_tpu.utils.serialize import load_well, save_well

    nr, nc = 700, 900
    n = 4000
    a = sl.from_triples(
        (nr, nc), rng.integers(0, nr, n), rng.integers(0, nc, n),
        rng.standard_normal(n),
    ).tocsr()
    w = csr_to_well(a)
    p = tmp_path / "well.npz"
    save_well(p, w)
    w2 = load_well(p)
    assert w2.shape == w.shape and w2.c_max == w.c_max
    x = rng.standard_normal(nc)
    np.testing.assert_array_equal(
        np.asarray(well_spmv(w, jnp.asarray(x))),
        np.asarray(well_spmv(w2, jnp.asarray(x))),
    )
