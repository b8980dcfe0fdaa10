"""WELL (windowed gathered-ELL) format + kernel tests.

The kernel runs through the Pallas interpreter on the CPU test mesh; the
same code lowers to tpu.dynamic_gather pairs on hardware.  Mirrors the
reference's constructor-invariant strategy (checkMatrix applied to every
constructor output, sparse-linear/tests/Test/LinearAlgebra.hs:40-67):
``todense`` round-trips prove the packing stores exactly the matrix.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from sparse_linear_tpu.formats.well import WELL, csr_to_well
from sparse_linear_tpu.kernels.spmv_well import well_spmv
from sparse_linear_tpu.utils.grids import laplacian_1d, poisson_2d


def _random_csr(rng, nr, nc, density=0.05):
    n = int(nr * nc * density) + 1
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n)
    return sl.from_triples((nr, nc), rows, cols, vals).tocsr()


@pytest.mark.parametrize(
    "nr,nc,density",
    [(50, 70, 0.2), (1100, 900, 0.05), (2100, 2100, 0.004), (8, 5000, 0.01)],
)
def test_well_packing_roundtrip(rng, nr, nc, density):
    a = _random_csr(rng, nr, nc, density)
    w = csr_to_well(a)
    np.testing.assert_array_equal(
        np.asarray(w.todense())[:nr, :nc], np.asarray(a.todense())
    )


@pytest.mark.parametrize("nr,nc,density", [(100, 80, 0.15), (1500, 2100, 0.01)])
def test_well_spmv_matches_dense(rng, nr, nc, density):
    a = _random_csr(rng, nr, nc, density)
    w = csr_to_well(a)
    x = rng.standard_normal(nc)
    y = well_spmv(w, jnp.asarray(x))
    ref = np.asarray(a.todense()) @ x
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-12)


def test_well_poisson_operator(rng):
    a = poisson_2d(48, dtype=np.float64)
    w = csr_to_well(a)
    assert w.fill > 0.3  # stencil patterns pack densely (0.83 at 2048^2)
    x = rng.standard_normal(48 * 48)
    np.testing.assert_allclose(
        np.asarray(w @ jnp.asarray(x)),
        np.asarray(a.todense()) @ x,
        atol=1e-12,
    )


def test_well_collision_splitting(rng):
    """A matrix engineered so many rows in one sublane group read the same
    source lane with different sublanes — exercises the conflict fixpoint."""
    nr = 256
    rows = np.arange(nr)
    # row k reads column (k % 8) * 128  -> same lane 0, eight different
    # sublanes, all within one window: guaranteed (2)-conflicts
    cols = (rows % 8) * 128
    vals = np.arange(1.0, nr + 1)
    a = sl.from_triples((nr, 1024), rows, cols, vals).tocsr()
    w = csr_to_well(a)
    x = rng.standard_normal(1024)
    np.testing.assert_allclose(
        np.asarray(well_spmv(w, jnp.asarray(x))),
        np.asarray(a.todense()) @ x,
        atol=1e-12,
    )


def test_well_1d_laplacian(rng):
    a = laplacian_1d(3000, dtype=np.float64)
    w = csr_to_well(a)
    x = rng.standard_normal(3000)
    np.testing.assert_allclose(
        np.asarray(w @ jnp.asarray(x)),
        np.asarray(a.todense()) @ x,
        atol=1e-12,
    )


def test_well_c_max_cap_errors(rng):
    a = _random_csr(rng, 64, 64, 0.5)
    with pytest.raises(ValueError, match="chunks/vreg"):
        csr_to_well(a, c_max=1)


def test_well_dimension_mismatch(rng):
    a = _random_csr(rng, 32, 48, 0.2)
    w = csr_to_well(a)
    with pytest.raises(ValueError, match="mismatch"):
        well_spmv(w, jnp.ones(47))


def test_well_complex_roundtrip_small(rng):
    a = _random_csr(rng, 16, 16, 0.2)
    ac = a.map_values(lambda v: v.astype(np.complex128) * (1 + 0.5j))
    w = csr_to_well(ac)
    np.testing.assert_allclose(
        np.asarray(w.todense())[:16, :16], np.asarray(ac.todense()), atol=0
    )


def test_well_empty_matrix():
    a = sl.zeros((100, 100), dtype=np.float64).tocsr()
    w = csr_to_well(a)
    y = well_spmv(w, jnp.ones(100))
    np.testing.assert_array_equal(np.asarray(y), np.zeros(100))


def test_select_routes_unstructured_to_well(rng):
    from sparse_linear_tpu.formats.select import recommend_format, to_fast_format

    a = _random_csr(rng, 300, 300, 0.03)
    assert recommend_format(a) == "well"
    w = to_fast_format(a)
    assert isinstance(w, WELL)


def test_well_complex_two_planes(rng):
    """Complex matrices pack once and run four real kernel passes:
    (Ar + iAi)(xr + ixi)."""
    nr, nc = 200, 150
    n = 900
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    a = sl.from_triples((nr, nc), rows, cols, vals).tocsr()
    w = csr_to_well(a)
    assert w.is_complex
    np.testing.assert_allclose(
        np.asarray(w.todense())[:nr, :nc], np.asarray(a.todense()), atol=0
    )
    x = rng.standard_normal(nc) + 1j * rng.standard_normal(nc)
    y = well_spmv(w, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(a.todense()) @ x, atol=1e-12
    )
    # real x against complex A, and real A against complex x
    yr = well_spmv(w, jnp.asarray(x.real))
    np.testing.assert_allclose(
        np.asarray(yr), np.asarray(a.todense()) @ x.real, atol=1e-12
    )


# ------------------------------------------------------------- multi-RHS SpMM


def test_well_spmm_matches_dense(rng):
    """Multi-RHS kernel vs dense ground truth, f32 (the FEAST ijob=30/40
    hot multiply at block width m)."""
    from sparse_linear_tpu.kernels.spmv_well import well_spmm

    nr, nc, m = 700, 520, 9
    a = _random_csr(rng, nr, nc, 0.03)
    a32 = sl.from_triples(
        (nr, nc), np.asarray(a.tocoo().row), np.asarray(a.tocoo().col),
        np.asarray(a.tocoo().data).astype(np.float32),
    ).tocsr()
    w = csr_to_well(a32)
    x = rng.standard_normal((nc, m)).astype(np.float32)
    y = well_spmm(w, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(a32.todense()) @ x, rtol=2e-5, atol=2e-4
    )


def test_well_spmm_complex_planes(rng):
    """Complex A x complex X composes from real plane passes."""
    from sparse_linear_tpu.kernels.spmv_well import well_spmm

    nr, nc, m = 300, 240, 5
    n = 2500
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    a = sl.from_triples((nr, nc), rows, cols, vals).tocsr()
    w = csr_to_well(a)
    x = (rng.standard_normal((nc, m))
         + 1j * rng.standard_normal((nc, m)))
    y = well_spmm(w, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(a.todense()) @ x, atol=1e-10
    )
    # real A x complex X (the FEAST contour case)
    ar = sl.from_triples((nr, nc), rows, cols, vals.real).tocsr()
    wr = csr_to_well(ar)
    yr = well_spmm(wr, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(yr), np.asarray(ar.todense()) @ x, atol=1e-10
    )


def test_well_spmm_vector_and_mismatch(rng):
    """1-D x falls through to well_spmv; dimension mismatch raises."""
    from sparse_linear_tpu.kernels.spmv_well import well_spmm

    a = _random_csr(rng, 100, 80, 0.05)
    w = csr_to_well(a)
    x = rng.standard_normal(80)
    y = well_spmm(w, jnp.asarray(x))
    assert y.ndim == 1
    with pytest.raises(ValueError, match="mismatch"):
        well_spmm(w, jnp.asarray(rng.standard_normal((7, 3))))
