"""On-TPU smoke tests: catch kernel-lowering regressions before the bench.

The default test session pins the virtual CPU mesh (conftest.py), where the
Pallas kernels run through the interpreter only — a TPU lowering regression
would surface only as a bench crash at round end.  This suite runs the hot
kernels on the REAL chip at tiny sizes (<2 min total):

    SLT_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_smoke.py -q

Skipped automatically when no TPU is attached (including the default
CPU-pinned session).  Mirrors the reference's "golden ratio" smoke idea —
fast end-to-end checks on the production backend (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="requires the real TPU chip (run with SLT_TEST_PLATFORM=tpu)",
)


def _random_csr(rng, nr, nc, density=0.05, dtype=np.float32):
    import sparse_linear_tpu as sl

    n = int(nr * nc * density) + 1
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n).astype(dtype)
    return sl.from_triples((nr, nc), rows, cols, vals).tocsr()


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_well_spmv_on_chip(rng):
    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.kernels.spmv_well import well_spmv

    a = _random_csr(rng, 1200, 900, 0.02)
    w = csr_to_well(a)
    x = rng.standard_normal(900).astype(np.float32)
    y = well_spmv(w, jnp.asarray(x), interpret=False)
    ref = np.asarray(a.todense()) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_well_spmm_on_chip(rng):
    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.kernels.spmv_well import well_spmm

    a = _random_csr(rng, 800, 600, 0.03)
    w = csr_to_well(a)
    x = rng.standard_normal((600, 24)).astype(np.float32)
    y = well_spmm(w, jnp.asarray(x), interpret=False)
    ref = np.asarray(a.todense()) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_well_spmm_wide_x_on_chip(rng):
    """Column space too large for a full VMEM-resident X block: exercises
    the VMEM-adaptive RHS tile + raised scoped-vmem limit (the config that
    OOM'd Mosaic at 16 MB default in round 2's first bench run)."""
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.kernels.spmv_well import well_spmm

    nr, nc, n, m = 1024, 2_000_000, 20000, 16
    rows = rng.integers(0, nr, size=n)
    cols = rng.integers(0, nc, size=n)
    vals = rng.standard_normal(n).astype(np.float32)
    a = sl.from_triples((nr, nc), rows, cols, vals).tocsr()
    w = csr_to_well(a)
    x = rng.standard_normal((nc, m)).astype(np.float32)
    y = well_spmm(w, jnp.asarray(x), interpret=False)
    import scipy.sparse as sp

    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    np.testing.assert_allclose(
        np.asarray(y), As @ x, rtol=2e-5, atol=2e-4
    )


def test_dia_spmv_pallas_on_chip(rng):
    from sparse_linear_tpu.kernels.spmv_pallas import dia_spmv_pallas
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 64
    a = poisson_2d(g, dtype=np.float32, fmt="dia")
    x = rng.standard_normal(g * g).astype(np.float32)
    y = dia_spmv_pallas(a, jnp.asarray(x))
    a_csr = poisson_2d(g, dtype=np.float32)
    ref = np.asarray(a_csr.todense()) @ x
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-4)


def test_multifrontal_factor_solve_on_chip():
    from sparse_linear_tpu.solve import multifrontal as mf
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 24
    a = poisson_2d(g, dtype=np.float32)
    sym = mf.analyze(a, dims=(g, g))
    fac = mf.factor(a, sym, kind="cholesky")
    b = jnp.ones((g * g,), jnp.float32)
    x = mf.solve(fac, b)
    r = np.asarray(a.todense()) @ np.asarray(x, dtype=np.float64) - 1.0
    assert np.linalg.norm(r) / np.sqrt(g * g) < 1e-4
    assert not fac.breakdown


def test_eigsh_on_chip():
    import sparse_linear_tpu as sl
    from sparse_linear_tpu.eig.feast import FeastParams, eigsh

    # analytic {1, 3} spectrum
    a = sl.from_triples(
        (2, 2), [0, 0, 1, 1], [0, 1, 0, 1],
        np.array([2.0, 1.0, 1.0, 2.0])
    )
    res = eigsh(2, (0.5, 3.5), a, FeastParams(tol=1e-8, contour_points=4))
    np.testing.assert_allclose(np.sort(res.values), [1.0, 3.0], atol=1e-6)


def test_well_spmm_windowed_jit_on_chip(rng):
    """The windowed SpMM kernel engaged THROUGH jit via the pack-time
    window plan (round-4 regression guard: without the stored plan a
    traced WELL silently fell back to the resident kernel at tiny mt)."""
    from sparse_linear_tpu.formats.well import csr_to_well
    from sparse_linear_tpu.kernels.spmv_well import well_spmm_planes
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(128, dtype=np.float32)
    w = csr_to_well(a)
    assert w.win_vb is not None  # pack-time plan present
    xp = rng.standard_normal((8, 128 * 128)).astype(np.float32)

    @jax.jit
    def f(w, xp):
        return well_spmm_planes(w, xp, interpret=False)

    y = f(w, xp)
    import scipy.sparse as sp

    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    np.testing.assert_allclose(
        np.asarray(y), (As @ xp.T).T, rtol=2e-5, atol=2e-4
    )


def test_f64_lu_fronts_fail_fast_on_chip():
    """f64 pivoted-LU fronts have no TPU lowering (XLA LuDecomposition is
    F32/C64-only) — factor() must raise the actionable TypeError instead
    of dying in the remote compiler with an HTTP 500."""
    from sparse_linear_tpu.solve import api as solve_api
    from sparse_linear_tpu.utils.grids import poisson_2d

    a64 = poisson_2d(16, dtype=np.float64)
    sym = solve_api.analyze(a64, backend="multifrontal")
    with pytest.raises(TypeError, match="f64 LU front"):
        solve_api.factor(a64, sym)


def test_planes_protocol_on_chip(rng):
    """Plane-major structured-op protocol: op.planes == op.T on the chip
    for both the WELL (f32 unstructured) and DIA (banded f64) routes."""
    from sparse_linear_tpu.eig.real_pipeline import _structured_op
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = _random_csr(rng, 640, 640, 0.02)
    op, _ = _structured_op(a)
    assert op.prefers_planes
    x = rng.standard_normal((640, 8)).astype(np.float32)
    y_cm = np.asarray(op(jnp.asarray(x)))
    y_pl = np.asarray(op.planes(jnp.asarray(x.T)))
    np.testing.assert_allclose(y_pl, y_cm.T, rtol=1e-5, atol=1e-5)

    d_op, _ = _structured_op(poisson_2d(24, dtype=np.float64).tocsr())
    xd = rng.standard_normal((576, 4))
    np.testing.assert_allclose(
        np.asarray(d_op.planes(jnp.asarray(xd.T))),
        np.asarray(d_op(jnp.asarray(xd))).T, rtol=1e-12, atol=1e-12,
    )
