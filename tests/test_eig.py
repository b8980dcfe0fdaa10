"""Eigensolver tests.

Includes the reference's analytic gate: the 2x2 pencil [[2,-1],[-1,2]] has
eigenvalues {1, 3}; found values must match to relative error < 1e-10
(feast/tests/test-feast.hs:14-32).  Extended with analytic Laplacian spectra
and generalized pencils (SURVEY.md §4d)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from sparse_linear_tpu.eig.feast import (
    INFO_NO_EIGENVALUES,
    INFO_OK,
    EigResult,
    FeastParams,
    eigsh,
    geigsh,
)
from sparse_linear_tpu.utils.grids import laplacian_1d


def test_analytic_2x2():
    """The reference's test-feast.hs gate, at the same 1e-10 tolerance."""
    a = sl.from_triples(
        (2, 2), [0, 0, 1, 1], [0, 1, 0, 1], [2.0, -1.0, -1.0, 2.0]
    ).tocsr()
    res = eigsh(2, (0.0, 4.0), a)
    assert res.n_found == 2
    np.testing.assert_allclose(res.values, [1.0, 3.0], rtol=1e-10)
    assert res.epsout < 1e-10


def test_analytic_2x2_complex_hermitian():
    """sigma_y-like Hermitian complex matrix: [[2, -i], [i, 2]] has
    eigenvalues {1, 3}."""
    a = sl.from_triples(
        (2, 2), [0, 0, 1, 1], [0, 1, 0, 1],
        np.array([2.0, -1j, 1j, 2.0], dtype=np.complex128),
    ).tocsr()
    res = eigsh(2, (0.0, 4.0), a)
    assert res.n_found == 2
    np.testing.assert_allclose(res.values, [1.0, 3.0], rtol=1e-10)


def test_laplacian_interior_eigenvalues():
    """1D Laplacian eigenvalues are 2 - 2 cos(k pi / (n+1)) — find the ones
    inside a chosen window and match analytically to 1e-10."""
    n = 24
    a = laplacian_1d(n, dtype=np.float64)
    exact = 2.0 - 2.0 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    lo, hi = 0.5, 1.5
    want = np.sort(exact[(exact >= lo) & (exact <= hi)])
    res = eigsh(len(want) + 6, (lo, hi), a, FeastParams(tol=1e-13))
    assert res.n_found == len(want)
    np.testing.assert_allclose(res.values, want, rtol=1e-10)
    assert res.info == INFO_OK
    # eigenvectors satisfy the residual gate
    ax = np.asarray(a.todense()) @ res.vectors
    for i, lam in enumerate(res.values):
        r = np.linalg.norm(ax[:, i] - lam * res.vectors[:, i])
        assert r < 1e-9


def test_generalized_pencil():
    """A x = lambda B x with B = diag(d): eigenvalues of D^{-1/2} A D^{-1/2}."""
    n = 16
    a = laplacian_1d(n, dtype=np.float64)
    d = np.linspace(1.0, 2.0, n)
    b = sl.diag(jnp.asarray(d))
    ad = np.asarray(a.todense())
    exact = np.sort(
        np.linalg.eigvalsh(
            np.diag(d ** -0.5) @ ad @ np.diag(d ** -0.5)
        )
    )
    lo, hi = 0.3, 1.2
    want = exact[(exact >= lo) & (exact <= hi)]
    res = geigsh(len(want) + 4, (lo, hi), a, b, FeastParams(tol=1e-13))
    assert res.n_found == len(want)
    np.testing.assert_allclose(res.values, want, rtol=1e-10)
    # B-orthonormality
    gram = res.vectors.T @ (np.diag(d) @ res.vectors)
    np.testing.assert_allclose(gram, np.eye(res.n_found), atol=1e-8)


def test_empty_interval_info():
    a = laplacian_1d(10, dtype=np.float64)
    res = eigsh(4, (100.0, 200.0), a, FeastParams(max_loops=6))
    assert res.n_found == 0
    assert res.info == INFO_NO_EIGENVALUES


def test_warm_restart_converges_faster():
    n = 24
    a = laplacian_1d(n, dtype=np.float64)
    p = FeastParams(tol=1e-13)
    first = eigsh(8, (0.5, 1.5), a, p)
    again = eigsh(8, (0.5, 1.5), a, p, guess=first.subspace)
    assert again.iterations <= first.iterations
    np.testing.assert_allclose(again.values, first.values, rtol=1e-10)


def test_non_hermitian_rejected():
    a = sl.from_triples((2, 2), [0], [1], [1.0]).tocsr()
    with pytest.raises(ValueError, match="hermitian"):
        eigsh(1, (0.0, 1.0), a)


def test_invalid_args():
    a = laplacian_1d(4, dtype=np.float64)
    with pytest.raises(ValueError, match="interval"):
        eigsh(2, (1.0, 1.0), a)
    with pytest.raises(ValueError, match="m0"):
        eigsh(0, (0.0, 1.0), a)


def test_embedded_strategy_matches_native():
    """Complex solves through the real 2n embedding (the TPU path) must
    reproduce the native-complex results exactly."""
    a = laplacian_1d(24, dtype=np.float64)
    p_nat = FeastParams(tol=1e-12, complex_strategy="native")
    p_emb = FeastParams(tol=1e-12, complex_strategy="embedded")
    r_nat = eigsh(8, (0.5, 1.5), a, p_nat)
    r_emb = eigsh(8, (0.5, 1.5), a, p_emb)
    assert r_emb.n_found == r_nat.n_found
    np.testing.assert_allclose(r_emb.values, r_nat.values, rtol=1e-12)
    assert r_emb.epsout < 1e-12


def test_embedded_multifrontal_loop_batching():
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 12
    a = poisson_2d(g, dtype=np.float64)
    exact = np.sort(np.linalg.eigvalsh(np.asarray(a.todense())))
    res = eigsh(
        8, (0.0, float(exact[3]) + 1e-9), a,
        FeastParams(tol=1e-11, complex_strategy="embedded",
                    backend="multifrontal", dims=(g, g),
                    contour_batching="loop"),
    )
    assert res.n_found == 4
    np.testing.assert_allclose(res.values, exact[:4], rtol=1e-10)


def test_embedded_complex_hermitian_pencil():
    """Complex-Hermitian inputs through the full embedded pipeline (the TPU
    path: real SpMMs, embedded solves, Gram/whitening as real matmuls) must
    match the native complex path."""
    rng = np.random.default_rng(0)
    n = 48
    d = np.arange(1, n + 1).astype(np.complex128)
    off = rng.standard_normal(n - 1) * 0.3 + 1j * rng.standard_normal(n - 1) * 0.3
    rows = list(range(n)) + list(range(n - 1)) + list(range(1, n))
    cols = list(range(n)) + list(range(1, n)) + list(range(n - 1))
    vals = np.concatenate([d, off, off.conj()])
    a = sl.from_triples((n, n), rows, cols, vals).tocsr()
    ev = np.linalg.eigvalsh(np.asarray(a.todense()))
    lo, hi = 4.5, 12.5
    expect = ev[(ev >= lo) & (ev <= hi)]

    p_emb = FeastParams(tol=1e-10, complex_strategy="embedded",
                        contour_points=8)
    r = eigsh(16, (lo, hi), a, p_emb)
    assert r.n_found == len(expect)
    np.testing.assert_allclose(np.sort(r.values), np.sort(expect), atol=1e-12)
    assert r.epsout < 1e-10
    # eigenvectors: residual check in complex arithmetic
    x = r.vectors
    dense = np.asarray(a.todense())
    res = np.linalg.norm(dense @ x - x * r.values[None, :], axis=0)
    assert res.max() < 1e-9


def test_embedded_complex_analytic_2x2():
    """The reference's analytic gate (test-feast.hs:14-32) with a complex
    Hermitian matrix, through the embedded path."""
    a = sl.from_triples(
        (2, 2), [0, 0, 1, 1], [0, 1, 0, 1],
        np.array([2, -1j, 1j, 2], np.complex128),
    ).tocsr()
    r = eigsh(2, (0.5, 1.5), a,
              FeastParams(complex_strategy="embedded", tol=1e-10))
    assert r.n_found == 1
    np.testing.assert_allclose(r.values, [1.0], rtol=1e-10)


def test_real_tpu_fast_path_on_cpu():
    """The accelerator fast path (eig/real_pipeline.geigsh_real_tpu) called
    directly: the 485-line driver is gated off the CPU backend in geigsh,
    so exercise its loop logic, warm restart, and result bookkeeping here."""
    from sparse_linear_tpu.eig.real_pipeline import (
        clear_pipeline_cache, geigsh_real_tpu,
    )

    n = 64
    a = laplacian_1d(n, dtype=np.float64)
    lam = 4 * np.sin(np.arange(1, n + 1) * np.pi / (2 * (n + 1))) ** 2
    lo, hi = 0.05, 0.5
    want = np.sort(lam[(lam >= lo) & (lam <= hi)])
    b = sl.eye(n, dtype=jnp.float64)
    p = FeastParams(tol=1e-12, backend="dense")
    res = geigsh_real_tpu(len(want) + 4, (lo, hi), a, b, p)
    assert res.n_found == len(want)
    assert res.info == INFO_OK
    np.testing.assert_allclose(np.sort(res.values), want, rtol=1e-10)
    # vectors are device arrays with valid residuals
    x = np.asarray(res.vectors)
    ax = np.asarray(a.todense()) @ x
    r = np.linalg.norm(ax - x * res.values[None, :], axis=0)
    assert r.max() < 1e-8
    # warm restart from the device-resident subspace converges faster
    again = geigsh_real_tpu(len(want) + 4, (lo, hi), a, b, p,
                            guess=res.subspace)
    assert again.iterations <= res.iterations
    np.testing.assert_allclose(
        np.sort(again.values), want, rtol=1e-10
    )
    # empty interval reports INFO_NO_EIGENVALUES
    empty = geigsh_real_tpu(4, (100.0, 200.0), a, b,
                            FeastParams(max_loops=6, backend="dense"))
    assert empty.n_found == 0
    clear_pipeline_cache()


def test_real_pipeline_streaming_contour(monkeypatch):
    """Large-n HBM guard: when all ne contour factor sets cannot fit the
    device budget, the pipeline streams the contour (one node's
    factorization resident at a time, quadrature accumulated immediately)
    and must converge identically.  Budget pinned to 1 byte to force the
    streaming path at test scale."""
    from sparse_linear_tpu.eig.real_pipeline import (
        clear_pipeline_cache, geigsh_real_tpu,
    )
    from sparse_linear_tpu.utils.grids import poisson_2d

    monkeypatch.setenv("SLT_FEAST_STREAM_BUDGET", "1")
    g = 16
    a = poisson_2d(g, dtype=np.float64)
    i = np.arange(1, g + 1)
    lam1 = 4 * np.sin(i * np.pi / (2 * (g + 1))) ** 2
    lam2 = np.sort((lam1[:, None] + lam1[None, :]).ravel())
    k = 8
    emax = float((lam2[k - 1] + lam2[k]) / 2)
    b = sl.eye(g * g, dtype=jnp.float64)
    p = FeastParams(tol=1e-10, dims=(g, g), backend="multifrontal")
    res = geigsh_real_tpu(16, (0.0, emax), a, b, p)
    assert res.n_found == k
    assert res.info == INFO_OK
    np.testing.assert_allclose(np.sort(res.values), lam2[:k], rtol=1e-10)
    clear_pipeline_cache()


@pytest.mark.slow
def test_count_eigenvalues():
    """FEAST 4.x stochastic estimate (fpm(14)=2 analog): the Hutchinson
    trace of the spectral projector sizes m0 to within a few pairs, on
    real-symmetric (pipeline path) and complex-Hermitian (embedded-real
    accelerator path) pencils."""
    from sparse_linear_tpu.eig.feast import count_eigenvalues
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 16
    a = poisson_2d(g, dtype=np.float64)
    i = np.arange(1, g + 1)
    lam1 = 4 * np.sin(i * np.pi / (2 * (g + 1))) ** 2
    lam2 = np.sort((lam1[:, None] + lam1[None, :]).ravel())
    k = 30
    emax = float((lam2[k - 1] + lam2[k]) / 2)
    est = count_eigenvalues((0.0, emax), a, probes=32,
                            params=FeastParams(dims=(g, g),
                                               backend="multifrontal"))
    assert abs(est - k) < 0.25 * k

    # complex Hermitian + generalized
    n = 32
    rng = np.random.default_rng(0)
    h = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    h = (h + h.conj().T) / 2
    r, c = np.nonzero(h)
    ac = sl.from_triples((n, n), r, c, h[r, c]).tocsr()
    d = rng.uniform(0.5, 2.0, n)
    bc = sl.from_triples((n, n), np.arange(n), np.arange(n), d).tocsr()
    gev = np.sort(np.real(np.linalg.eigvals(np.diag(1 / d) @ h)))
    lo, hi = float((gev[9] + gev[10]) / 2), float((gev[24] + gev[25]) / 2)
    est = count_eigenvalues((lo, hi), ac, bc, probes=32)
    assert abs(est - 15) < 5

    with pytest.raises(ValueError, match="empty"):
        count_eigenvalues((1.0, 0.5), a)


def test_quadrature_trapezoid():
    """FEAST fpm(16) integration-type switch: trapezoid nodes converge on
    the analytic 1D Laplacian interval (a couple more refinement loops than
    Gauss, per the documented filter analysis)."""
    n = 48
    a = laplacian_1d(n, dtype=np.float64)
    lam = 4 * np.sin(np.arange(1, n + 1) * np.pi / (2 * (n + 1))) ** 2
    lo, hi = 0.05, 0.5
    want = np.sort(lam[(lam >= lo) & (lam <= hi)])
    res = eigsh(len(want) + 4, (lo, hi), a,
                FeastParams(tol=1e-11, quadrature="trapezoid",
                            contour_points=12))
    assert res.n_found == len(want)
    np.testing.assert_allclose(np.sort(res.values), want, rtol=1e-10)
    with pytest.raises(ValueError, match="quadrature"):
        eigsh(4, (lo, hi), a, FeastParams(quadrature="bogus"))


@pytest.mark.slow
def test_spectrum_slicing():
    """eigsh_sliced solves a wide interval whose count exceeds one
    subspace: stochastic-count-driven bisection, per-slice solves, merged
    ascending result with boundary dedup (FEAST 4.x contour-splitting
    workflow; the reference's 2.x binding has no analog)."""
    from sparse_linear_tpu.eig.feast import eigsh_sliced
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 12
    a = poisson_2d(g, dtype=np.float64)
    i = np.arange(1, g + 1)
    lam1 = 4 * np.sin(i * np.pi / (2 * (g + 1))) ** 2
    lam2 = np.sort((lam1[:, None] + lam1[None, :]).ravel())
    # cut at the widest gap near 40 pairs: the 2D Poisson spectrum has
    # degeneracies, and a cut THROUGH a multiple eigenvalue makes "the
    # first k" ill-defined
    cand = np.arange(35, 46)
    k = int(cand[np.argmax(lam2[cand] - lam2[cand - 1])])
    emax = float((lam2[k - 1] + lam2[k]) / 2)
    res = eigsh_sliced((0.0, emax), a, m0_max=20,
                       params=FeastParams(tol=1e-10, dims=(g, g),
                                          backend="multifrontal"))
    assert res.n_found == k
    np.testing.assert_allclose(np.sort(res.values), lam2[:k], rtol=1e-9)
    assert float(np.max(res.residuals)) < 1e-8
    assert np.all(np.diff(res.values) >= 0)  # merged ascending
    # empty interval
    empty = eigsh_sliced((100.0, 200.0), a, m0_max=20,
                         params=FeastParams(max_loops=4, dims=(g, g)))
    assert empty.n_found == 0 and empty.info == INFO_NO_EIGENVALUES


def test_chebyshev_filtered_lowest():
    """Factorization-free Chebyshev-filtered subspace iteration
    (eig/chebyshev.py): the k lowest 2D Poisson eigenpairs to 1e-10
    without a single sparse factorization — the TPU-first large-scale
    complement to the FEAST rational filter."""
    from sparse_linear_tpu.eig.chebyshev import eigsh_filtered
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 24
    a = poisson_2d(g, dtype=np.float64)
    i = np.arange(1, g + 1)
    lam1 = 4 * np.sin(i * np.pi / (2 * (g + 1))) ** 2
    lam2 = np.sort((lam1[:, None] + lam1[None, :]).ravel())
    k = 10
    emax = float((lam2[k - 1] + lam2[k]) / 2)
    res = eigsh_filtered(24, (0.0, emax), a, tol=1e-10)
    assert res.info == INFO_OK
    assert res.n_found == k
    np.testing.assert_allclose(np.sort(res.values), lam2[:k], rtol=1e-10)
    # residual check against the operator itself
    x = np.asarray(res.vectors)
    ax = np.asarray(a.todense()) @ x
    r = np.linalg.norm(ax - x * res.values[None, :], axis=0)
    assert r.max() < 1e-8

    with pytest.raises(ValueError, match="empty"):
        eigsh_filtered(8, (1.0, 0.5), a)
    with pytest.raises(ValueError, match="upper bound"):
        eigsh_filtered(8, (0.0, 9.0), a)
