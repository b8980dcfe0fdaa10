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
@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_well_spmm_windowed_matches_resident(rng):
    """The windowed kernel (per-row-tile x windows from the packing's
    activity ranges) must agree with the resident kernel and dense ground
    truth on both banded and unstructured patterns."""
    from sparse_linear_tpu.kernels.spmv_well import (
        _window_plan, well_spmm_planes)

    nr = nc = 1800
    m = 6
    x = rng.standard_normal((m, nc)).astype(np.float32)
    # banded: windows are tight, the plan engages with a small unit size
    rows = np.concatenate([np.arange(nr)] * 3)
    cols = np.concatenate([
        np.arange(nr),
        np.clip(np.arange(nr) + 64, 0, nc - 1),
        np.clip(np.arange(nr) - 512, 0, nc - 1),
    ])
    vals = rng.standard_normal(rows.size).astype(np.float32)
    # unstructured: windows span everything, still must be correct
    u_rows = rng.integers(0, nr, size=4000)
    u_cols = rng.integers(0, nc, size=4000)
    u_vals = rng.standard_normal(4000).astype(np.float32)
    for r, c, v in ((rows, cols, vals), (u_rows, u_cols, u_vals)):
        a = sl.from_triples((nr, nc), r, c, v).tocsr()
        w = csr_to_well(a)
        assert _window_plan(w, 8) is not None
        ref = (np.asarray(a.todense()) @ x.T).T
        y_win = well_spmm_planes(w, jnp.asarray(x), _force="windowed")
        y_res = well_spmm_planes(w, jnp.asarray(x), _force="resident")
        np.testing.assert_allclose(np.asarray(y_win), ref, rtol=2e-5,
                                   atol=2e-4)
        np.testing.assert_array_equal(np.asarray(y_win), np.asarray(y_res))


@pytest.mark.slow
def test_well_spmm_windowed_complex(rng):
    """Complex planes route through the windowed kernel too."""
    from sparse_linear_tpu.kernels.spmv_well import well_spmm_planes

    nr, nc, m = 600, 500, 4
    n = 3000
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    a = sl.from_triples((nr, nc), rows, cols, vals).tocsr()
    w = csr_to_well(a)
    x = (rng.standard_normal((m, nc)) + 1j * rng.standard_normal((m, nc)))
    y = well_spmm_planes(w, jnp.asarray(x), _force="windowed")
    ref = (np.asarray(a.todense()) @ x.T).T
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-10)


def test_well_base_ranges_serialize_roundtrip(rng, tmp_path):
    """base_lo/base_hi survive a save/load cycle; legacy checkpoints
    (no ranges) re-derive them on load."""
    from sparse_linear_tpu.utils.serialize import load_well, save_well

    a = _random_csr(rng, 300, 260, 0.03)
    w = csr_to_well(a)
    p = tmp_path / "w.npz"
    save_well(p, w)
    w2 = load_well(p)
    np.testing.assert_array_equal(np.asarray(w2.base_lo),
                                  np.asarray(w.base_lo))
    np.testing.assert_array_equal(np.asarray(w2.base_hi),
                                  np.asarray(w.base_hi))
    # strip the ranges to emulate a pre-windowed-kernel checkpoint
    with np.load(p, allow_pickle=False) as z:
        payload = {k: z[k] for k in z.files if not k.startswith("base_")}
    p_old = tmp_path / "w_old.npz"
    np.savez_compressed(p_old, **payload)
    w3 = load_well(p_old)
    np.testing.assert_array_equal(np.asarray(w3.base_lo),
                                  np.asarray(w.base_lo))


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


def test_well_spmm_planes_prepadded_width():
    """Planes pre-padded to well_planes_width(a) (tail zeros) must match
    the (m, nc) call — the documented zero-relayout contract."""
    import numpy as np

    import jax.numpy as jnp

    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.kernels.spmv_well import (
        well_planes_width, well_spmm_planes,
    )
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 40
    a = poisson_2d(g, dtype=np.float32)
    w = csr_to_well(a)
    n = g * g
    m = 4
    X = np.random.default_rng(9).standard_normal((m, n)).astype(np.float32)
    y_ref = np.asarray(well_spmm_planes(w, jnp.asarray(X)))
    wpw = well_planes_width(w)
    assert wpw >= n
    Xp = np.zeros((m, wpw), np.float32)
    Xp[:, :n] = X
    y_pad = np.asarray(well_spmm_planes(w, jnp.asarray(Xp)))
    assert np.array_equal(y_ref, y_pad)
    # wrong width still rejected
    import pytest

    with pytest.raises(ValueError):
        well_spmm_planes(w, jnp.zeros((m, n + 1), jnp.float32))
