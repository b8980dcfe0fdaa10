"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sparse_linear_tpu.dist.spmv import dia_spmv_sharded, shard_dia_rows
from sparse_linear_tpu.utils.grids import poisson_2d


@pytest.fixture
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("rows",))


@pytest.mark.parametrize("exchange", ["allgather", "halo"])
def test_sharded_dia_spmv_matches_single(mesh, exchange):
    nx = 16  # n = 256, divisible by 8
    a_dia = poisson_2d(nx, dtype=np.float64, fmt="dia")
    a_csr = poisson_2d(nx, dtype=np.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(nx * nx))
    a_sharded = shard_dia_rows(a_dia, mesh)
    y = dia_spmv_sharded(a_sharded, x, mesh, exchange=exchange)
    ref = np.asarray(a_csr.todense()) @ np.asarray(x)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


def test_sharded_spmv_under_jit(mesh):
    nx = 16
    a_dia = poisson_2d(nx, dtype=np.float64, fmt="dia")
    x = jnp.ones(nx * nx)

    f = jax.jit(
        lambda d, x: dia_spmv_sharded(d, x, mesh, exchange="halo")
    )
    y = f(shard_dia_rows(a_dia, mesh), x)
    ref = np.asarray(poisson_2d(nx, dtype=np.float64).todense()) @ np.ones(nx * nx)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


def test_halo_fallback_when_band_too_wide(mesh):
    # 2D poisson on 8x8 grid: 64 rows over 8 devices = 8 local rows < halo 8?
    # halo = nx = 8 == n_local -> halo path valid; use 4x4 to force fallback
    nx = 4
    a_dia = poisson_2d(nx, dtype=np.float64, fmt="dia")  # n=16, local=2, halo=4
    x = jnp.ones(16)
    y = dia_spmv_sharded(shard_dia_rows(a_dia, mesh), x, mesh, exchange="halo")
    ref = np.asarray(poisson_2d(nx, dtype=np.float64).todense()) @ np.ones(16)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


def test_distributed_feast_contour_sharding():
    """FEAST with the contour-node axis sharded over the mesh (P3/P4):
    results must match the single-device run to machine precision."""
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.eig.feast import FeastParams, eigsh
    from sparse_linear_tpu.utils.grids import laplacian_1d

    devs = np.array(jax.devices()[:8])
    cp_mesh = Mesh(devs, ("cp",))
    a = laplacian_1d(24, dtype=np.float64)
    p = FeastParams(tol=1e-12, contour_points=8)
    res_single = eigsh(8, (0.5, 1.5), a, p)
    res_dist = eigsh(8, (0.5, 1.5), a, p, mesh=cp_mesh)
    assert res_dist.n_found == res_single.n_found
    np.testing.assert_allclose(res_dist.values, res_single.values, rtol=1e-12)
    assert res_dist.epsout < 1e-10


def test_distributed_feast_2d_mesh():
    """2D mesh (cp x rows): contour axis sharded, rest replicated."""
    from sparse_linear_tpu.eig.feast import FeastParams, eigsh
    from sparse_linear_tpu.utils.grids import laplacian_1d

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh2 = Mesh(devs, ("cp", "rows"))
    a = laplacian_1d(16, dtype=np.float64)
    res = eigsh(6, (0.2, 1.2), a, FeastParams(tol=1e-12), mesh=mesh2)
    assert res.n_found > 0 and res.epsout < 1e-10


def test_multichip_multifrontal_factor_solve(mesh):
    """Front-batch-sharded factorization over the 8-device mesh matches the
    single-device result (multi-chip multifrontal)."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 24
    a = poisson_2d(g, dtype=np.float64)
    n = g * g
    sym = mf.analyze(a, dims=(g, g))
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(n))

    mesh_f = Mesh(np.array(jax.devices()[:8]), ("fronts",))
    f_sharded = mf.factor(a, sym, kind="cholesky", mesh=mesh_f)
    f_single = mf.factor(a, sym, kind="cholesky")
    x_sh = np.asarray(mf.solve(f_sharded, b))
    x_si = np.asarray(mf.solve(f_single, b))
    np.testing.assert_allclose(x_sh, x_si, atol=1e-11)
    r = np.linalg.norm(np.asarray(a @ x_sh) - np.asarray(b))
    assert r / np.linalg.norm(np.asarray(b)) < 1e-12


@pytest.mark.parametrize("fmt", ["ell", "bsr"])
def test_sharded_unstructured_spmv(mesh, fmt, dtype):
    """Row-sharded ELL/BSR SpMV on an arbitrary (non-stencil) pattern must
    match the dense product — P1 for unstructured matrices."""
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.dist.spmv import shard_rows, spmv_sharded

    rng = np.random.default_rng(7)
    nr, nc = 100, 84  # deliberately not divisible by 8 / block shapes
    n = nr * nc // 6
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n)
    if np.issubdtype(dtype, np.complexfloating):
        vals = vals + 1j * rng.standard_normal(n)
    a = sl.from_triples((nr, nc), rows, cols, vals.astype(dtype)).tocsr()
    x = rng.standard_normal(nc)
    if np.issubdtype(dtype, np.complexfloating):
        x = x + 1j * rng.standard_normal(nc)
    kw = {"block_shape": (4, 8)} if fmt == "bsr" else {}
    ash = shard_rows(a, mesh, fmt=fmt, **kw)
    y = spmv_sharded(ash, jnp.asarray(x), mesh)
    ref = np.asarray(a.todense()) @ x
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-11)


def test_shard_rows_auto_picks_dia_for_stencil(mesh):
    """fmt='auto' routes a stencil pattern onto the DIA fast path."""
    from sparse_linear_tpu.dist.spmv import shard_rows, spmv_sharded
    from sparse_linear_tpu.formats.structured import DIA

    a = poisson_2d(16, dtype=np.float64)
    ash = shard_rows(a, mesh, fmt="auto")
    x = np.random.default_rng(2).standard_normal(256)
    if isinstance(ash, DIA):
        y = spmv_sharded(ash, jnp.asarray(x), mesh)
    else:
        y = spmv_sharded(ash, jnp.asarray(x), mesh)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(a.todense()) @ x, atol=1e-12
    )


@pytest.mark.slow
def test_sharded_well_spmv(mesh, dtype):
    """Row-sharded WELL (in-register-gather kernel under shard_map) matches
    the dense product for real AND complex values (the two complex planes
    share one packing; one real pass per plane pair)."""
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.dist.spmv import ShardedWELL, shard_rows, spmv_sharded

    rng = np.random.default_rng(11)
    if np.issubdtype(dtype, np.complexfloating):
        # interpret-mode kernel runs 4 real passes for complex: keep small
        nr, nc, n = 2200, 1800, 20000
    else:
        nr, nc, n = 5000, 4200, 60000
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n)
    x = rng.standard_normal(nc)
    if np.issubdtype(dtype, np.complexfloating):
        vals = vals + 1j * rng.standard_normal(n)
        x = x + 1j * rng.standard_normal(nc)
    a = sl.from_triples((nr, nc), rows, cols, vals.astype(dtype)).tocsr()
    ash = shard_rows(a, mesh, fmt="well")
    assert isinstance(ash, ShardedWELL)
    y = spmv_sharded(ash, jnp.asarray(x), mesh)
    import scipy.sparse as sp

    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    np.testing.assert_allclose(np.asarray(y), As @ x, atol=1e-10)


@pytest.mark.slow
def test_sharded_well_spmv_mixed_real_complex(mesh):
    """Real sharded WELL times a complex vector (the FEAST contour case)."""
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.dist.spmv import shard_rows, spmv_sharded

    rng = np.random.default_rng(3)
    nr, nc = 1500, 1500
    n = 15000
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    a = sl.from_triples(
        (nr, nc), rows, cols, rng.standard_normal(n)
    ).tocsr()
    x = rng.standard_normal(nc) + 1j * rng.standard_normal(nc)
    ash = shard_rows(a, mesh, fmt="well")
    y = spmv_sharded(ash, jnp.asarray(x), mesh)
    ref = np.asarray(a.todense()) @ x
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-10)


def test_sharded_3d_poisson_spmv(mesh):
    """Config-5 rehearsal (BASELINE: multi-chip row-partitioned SpMV on 3D
    Poisson): the 7-point DIA operator row-sharded over the mesh, halo
    exchange over the +-nx*ny band, vs the dense product."""
    from sparse_linear_tpu.utils.grids import poisson_3d

    nx = 16  # n = 4096, 512 rows/device > halo width nx*ny = 256
    a_dia = poisson_3d(nx, dtype=np.float64, fmt="dia")
    a_csr = poisson_3d(nx, dtype=np.float64)
    x = np.random.default_rng(5).standard_normal(nx ** 3)
    a_sh = shard_dia_rows(a_dia, mesh)
    for exchange in ("halo", "allgather"):
        y = dia_spmv_sharded(a_sh, jnp.asarray(x), mesh, exchange=exchange)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(a_csr.todense()) @ x, atol=1e-11
        )


@pytest.mark.slow
def test_sharded_window_exchange_3d_poisson(mesh):
    """Unstructured-shard halo exchange (SURVEY P1, VERDICT r3 item 5):
    ELL/BSR/WELL row shards of the 3D Poisson operator exchange only each
    device's x column window over the ring (ppermutes) instead of
    all-gathering the full x — results identical to the dense product,
    exchanged elements strictly fewer than the all_gather's."""
    from sparse_linear_tpu.dist.spmv import (
        shard_bsr_rows, shard_ell_rows, shard_well_rows, spmv_sharded,
        window_exchange_elements,
    )
    from sparse_linear_tpu.utils.grids import poisson_3d

    nx = 16
    a = poisson_3d(nx, dtype=np.float64)
    n = nx ** 3
    x = np.random.default_rng(3).standard_normal(n)
    ref = np.asarray(a.todense()) @ x
    ndev = 8
    L = n // ndev
    for name, sh in (
        ("ell", shard_ell_rows(a, mesh)),
        ("bsr", shard_bsr_rows(a, mesh, block_shape=(8, 16))),
        ("well", shard_well_rows(a, mesh)),
    ):
        assert sh.xplan is not None, name
        shipped = window_exchange_elements(sh.xplan)
        assert shipped < (ndev - 1) * L, (name, shipped)
        y = spmv_sharded(sh, jnp.asarray(x), mesh)
        np.testing.assert_allclose(
            np.asarray(y), ref, atol=1e-10, err_msg=name
        )
        # pinned all_gather strategy must agree exactly with the windowed one
        if name == "ell":
            sh_ag = shard_ell_rows(a, mesh, exchange="allgather")
            assert sh_ag.xplan is None
            y_ag = spmv_sharded(sh_ag, jnp.asarray(x), mesh)
            np.testing.assert_allclose(np.asarray(y), np.asarray(y_ag),
                                       atol=1e-12)


def test_distributed_feast_3d_poisson(mesh):
    """Config-5 rehearsal, eigensolver side: distributed FEAST (contour axis
    over the mesh) on the 3D Poisson operator, checked against the analytic
    spectrum lambda_{ijk} = sum of the three 1D eigenvalues."""
    from sparse_linear_tpu.eig.feast import FeastParams, eigsh
    from sparse_linear_tpu.utils.grids import poisson_3d

    g = 8
    a = poisson_3d(g, dtype=np.float64)
    k = np.arange(1, g + 1)
    lam1 = 4 * np.sin(k * np.pi / (2 * (g + 1))) ** 2
    lam3 = np.sort(
        (lam1[:, None, None] + lam1[None, :, None] + lam1[None, None, :])
        .ravel()
    )
    # 3D spectra are riddled with permutation multiplets: lam3[4:7] is the
    # degenerate (2,2,1) triple, so the cut must sit in the strict gap before
    # the singleton (2,2,2) at index 7.
    assert lam3[6] < lam3[7]
    hi = float((lam3[6] + lam3[7]) / 2)
    cp_mesh = Mesh(np.array(jax.devices()[:8]), ("cp",))
    res = eigsh(
        12, (0.0, hi), a,
        FeastParams(tol=1e-10, contour_points=8, complex_strategy="native"),
        mesh=cp_mesh,
    )
    assert res.n_found == 7
    np.testing.assert_allclose(
        np.sort(np.asarray(res.values)), lam3[:7], rtol=1e-10
    )
