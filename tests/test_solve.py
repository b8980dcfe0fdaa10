"""Direct-solver API tests (dense backend): staged analyze/factor/solve,
trans mode, batched RHS, residual gates.

Goes beyond the reference's plumbing-only test (``ident <\\> v == v``,
suitesparse/tests/test-umfpack.hs:16-19) with residual-based checks on
Poisson operators (SURVEY.md §4c)."""

import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from sparse_linear_tpu.solve import api as solve_api
from sparse_linear_tpu.utils.grids import laplacian_1d, poisson_2d
from tests.conftest import random_coo


def test_identity_solve(rng, dtype):
    # the reference's only solver property
    v = rng.standard_normal(9).astype(dtype)
    x = solve_api.linear_solve(sl.eye(9, dtype=dtype), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(x), v, atol=1e-14)


def test_poisson_solve_residual(rng, dtype):
    a = poisson_2d(8, dtype=np.float64)
    if np.issubdtype(dtype, np.complexfloating):
        a = a.map_values(lambda v: v.astype(dtype))
    b = rng.standard_normal(64).astype(dtype)
    x = solve_api.linear_solve(a, jnp.asarray(b))
    r = solve_api.residual_norm(a, x, b)
    assert float(r) < 1e-12


def test_staged_reuse(rng):
    """One symbolic, several numerics with the same pattern — the FEAST
    usage pattern (Feast.hs:210-218)."""
    a = laplacian_1d(20, dtype=np.float64)
    sym = solve_api.analyze(a)
    b = rng.standard_normal(20)
    for shift in [0.0, 0.5, 1.5]:
        mat = sl.lin(1.0, a, -shift, sl.eye(20, dtype=jnp.float64))
        f = solve_api.factor(mat, sym)
        x = solve_api.solve(f, jnp.asarray(b))
        assert float(solve_api.residual_norm(mat, x, b)) < 1e-12


def test_trans_solve(rng, dtype):
    rows, cols, vals = random_coo(rng, 8, 8, dtype)
    a = sl.from_triples((8, 8), rows, cols, vals).tocsr()
    a = sl.add(a, sl.eye(8, dtype=dtype).scale(8.0)).tocsr()  # well-conditioned
    b = rng.standard_normal(8).astype(dtype)
    f = solve_api.factor(a)
    x = solve_api.solve(f, jnp.asarray(b), trans=True)
    # A^H x = b
    r = np.asarray(a.todense()).conj().T @ np.asarray(x) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-12


def test_trans_T_solve(rng, dtype):
    """UMFPACK sys=2 (plain transpose A^T x = b) — beyond the reference's
    two bound modes (Umfpack.hs:85-102); for real dtypes identical to
    trans="H"."""
    rows, cols, vals = random_coo(rng, 8, 8, dtype)
    a = sl.from_triples((8, 8), rows, cols, vals).tocsr()
    a = sl.add(a, sl.eye(8, dtype=dtype).scale(8.0)).tocsr()
    b = rng.standard_normal(8).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        b = b + 1j * rng.standard_normal(8)
    f = solve_api.factor(a)
    x = solve_api.solve(f, jnp.asarray(b), trans="T")
    r = np.asarray(a.todense()).T @ np.asarray(x) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-12
    # string spellings agree with the boolean modes
    xh = solve_api.solve(f, jnp.asarray(b), trans="H")
    np.testing.assert_allclose(
        np.asarray(xh),
        np.asarray(solve_api.solve(f, jnp.asarray(b), trans=True)),
    )
    # refined T-solve reaches the same gate through the residual loop
    xr, info = solve_api.solve_refined(f, a, jnp.asarray(b), trans="T",
                                       tol=1e-12)
    rr = np.asarray(a.todense()).T @ np.asarray(xr) - b
    assert np.linalg.norm(rr) / np.linalg.norm(b) < 1e-10
    assert info.converged
    with pytest.raises(ValueError, match="trans"):
        solve_api.solve(f, jnp.asarray(b), trans="X")


def test_slogdet_rcond_dense(rng, dtype):
    """UMFPACK get_determinant / Info[RCOND] analogs on the dense backend
    (beyond the reference's bound API — umfpack.h capabilities)."""
    rows, cols, vals = random_coo(rng, 8, 8, dtype)
    a = sl.from_triples((8, 8), rows, cols, vals).tocsr()
    a = sl.add(a, sl.eye(8, dtype=dtype).scale(8.0)).tocsr()
    f = solve_api.factor(a)
    sign, logabs = solve_api.slogdet(f)
    ref_sign, ref_logabs = np.linalg.slogdet(np.asarray(a.todense()))
    np.testing.assert_allclose(logabs, ref_logabs, rtol=1e-10)
    np.testing.assert_allclose(sign, ref_sign, rtol=1e-10)
    np.testing.assert_allclose(
        solve_api.det(f), np.linalg.det(np.asarray(a.todense())), rtol=1e-9
    )
    r = solve_api.rcond(f)
    assert 0 < float(r) <= 1.0
    # identity factors: det 1, rcond 1
    fi = solve_api.factor(sl.eye(8, dtype=dtype))
    si, li = solve_api.slogdet(fi)
    np.testing.assert_allclose(si, 1.0)
    np.testing.assert_allclose(li, 0.0, atol=1e-14)
    np.testing.assert_allclose(solve_api.rcond(fi), 1.0)


def test_slogdet_multifrontal(rng):
    """Multifrontal pivots reproduce the global determinant: LU path on an
    unsymmetric operator (local pivot-permutation parities included) and
    the Cholesky path on SPD Poisson (det = prod diag^2)."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 8
    a = poisson_2d(g, dtype=np.float64)
    dense = np.asarray(a.todense())
    ref_sign, ref_logabs = np.linalg.slogdet(dense)
    sym = mf.analyze(a, dims=(g, g))
    for kind in ("cholesky", "lu"):
        f = mf.factor(a, sym, kind=kind)
        sign, logabs = solve_api.slogdet(f)
        np.testing.assert_allclose(float(logabs), ref_logabs, rtol=1e-10)
        np.testing.assert_allclose(float(sign), ref_sign)
        r = float(solve_api.rcond(f))
        assert 0 < r <= 1.0
    # unsymmetric (convection-dominated): pivot parities carry the sign
    cc = 1.2
    rows, cols, vals = [], [], []
    for i in range(g):
        for j in range(g):
            k0 = i * g + j
            rows.append(k0), cols.append(k0), vals.append(4.0)
            if j > 0:
                rows.append(k0), cols.append(k0 - 1), vals.append(-1.0 - cc)
            if j < g - 1:
                rows.append(k0), cols.append(k0 + 1), vals.append(-1.0 + cc)
            if i > 0:
                rows.append(k0), cols.append(k0 - g), vals.append(-1.0 - cc)
            if i < g - 1:
                rows.append(k0), cols.append(k0 + g), vals.append(-1.0 + cc)
    c = sl.from_triples(
        (g * g, g * g), rows, cols, np.array(vals, dtype=np.float64)
    ).tocsr()
    dense_c = np.asarray(c.todense())
    ref_sign, ref_logabs = np.linalg.slogdet(dense_c)
    fc = mf.factor(c, mf.analyze(c, dims=(g, g)), kind="lu")
    sign, logabs = solve_api.slogdet(fc)
    np.testing.assert_allclose(float(logabs), ref_logabs, rtol=1e-10)
    np.testing.assert_allclose(float(sign), ref_sign)


def test_slogdet_batched(rng):
    """Batched shifted factorizations (the FEAST contour set) report per-set
    determinants — (ne,) arrays from one artifact."""
    n = 20
    a = laplacian_1d(n, dtype=np.float64)
    shifts = [0.1, 0.7, 2.9]
    sym = solve_api.analyze(a)
    pattern = sl.lin(1.0, a, -shifts[0], sl.eye(n, dtype=jnp.float64))
    stacks = []
    for s in shifts:
        m = sl.lin(1.0, a, -s, sl.eye(n, dtype=jnp.float64))
        stacks.append(np.asarray(m.data))
    fb = solve_api.factor_batched(pattern, np.stack(stacks), sym)
    sign, logabs = solve_api.slogdet(fb)
    assert sign.shape == (3,) and logabs.shape == (3,)
    for i, s in enumerate(shifts):
        m = sl.lin(1.0, a, -s, sl.eye(n, dtype=jnp.float64))
        rs, rl = np.linalg.slogdet(np.asarray(m.todense()))
        np.testing.assert_allclose(logabs[i], rl, rtol=1e-10)
        np.testing.assert_allclose(sign[i], rs)


def _check_lu_export(f, dense, index=None, tol=1e-10):
    L, U, rp, cp = solve_api.get_factors(f, index=index)
    Ld = np.asarray(L.todense())
    Ud = np.asarray(U.todense())
    ref = dense[np.ix_(rp, cp)]
    scale = max(float(np.max(np.abs(ref))), 1e-30)
    assert float(np.max(np.abs(Ld @ Ud - ref))) / scale < tol
    assert np.allclose(np.triu(Ld, 1), 0)   # L lower triangular
    assert np.allclose(np.tril(Ud, -1), 0)  # U upper triangular
    lnz, unz = solve_api.lunz(f) if index is None else (L.nnz, U.nnz)
    assert lnz == L.nnz and unz == U.nnz
    return Ld, Ud


def test_get_factors_dense(rng, dtype):
    """UMFPACK get_numeric/get_lunz analogs: exported L, U reproduce the
    row/col-permuted operator exactly (dense backend)."""
    rows, cols, vals = random_coo(rng, 10, 10, dtype)
    a = sl.from_triples((10, 10), rows, cols, vals).tocsr()
    a = sl.add(a, sl.eye(10, dtype=dtype).scale(8.0)).tocsr()
    f = solve_api.factor(a)
    Ld, _ = _check_lu_export(f, np.asarray(a.todense()))
    np.testing.assert_allclose(np.diagonal(Ld), 1.0)  # unit lower


def test_get_factors_multifrontal(rng):
    """Exported multifrontal factors: Cholesky (U = L^H) and restricted-
    pivoting LU (row_perm composes fill order with in-front pivots) both
    reproduce A[ix_(rp, cp)]; identity padding never leaks entries."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 8
    a = poisson_2d(g, dtype=np.float64)
    dense = np.asarray(a.todense())
    sym = mf.analyze(a, dims=(g, g))
    for kind in ("cholesky", "lu"):
        f = mf.factor(a, sym, kind=kind)
        Ld, Ud = _check_lu_export(f, dense)
        if kind == "cholesky":
            np.testing.assert_allclose(Ud, Ld.T, atol=1e-14)
    # unsymmetric convection-dominated operator: local pivot permutations
    # must be folded into row_perm
    cc = 1.2
    rows, cols, vals = [], [], []
    for i in range(g):
        for j in range(g):
            k0 = i * g + j
            rows.append(k0), cols.append(k0), vals.append(4.0)
            if j > 0:
                rows.append(k0), cols.append(k0 - 1), vals.append(-1.0 - cc)
            if j < g - 1:
                rows.append(k0), cols.append(k0 + 1), vals.append(-1.0 + cc)
            if i > 0:
                rows.append(k0), cols.append(k0 - g), vals.append(-1.0 - cc)
            if i < g - 1:
                rows.append(k0), cols.append(k0 + g), vals.append(-1.0 + cc)
    c = sl.from_triples(
        (g * g, g * g), rows, cols, np.array(vals, dtype=np.float64)
    ).tocsr()
    fc = mf.factor(c, mf.analyze(c, dims=(g, g)), kind="lu")
    _check_lu_export(fc, np.asarray(c.todense()))


def test_get_factors_batched(rng):
    """Batched artifacts export per-value-set factors via ``index`` on both
    backends; index omitted raises."""
    from sparse_linear_tpu.solve import multifrontal as mf

    n = 20
    a = laplacian_1d(n, dtype=np.float64)
    shifts = [0.1, 0.7]
    stacks = np.stack([
        np.asarray(sl.lin(1.0, a, -s, sl.eye(n, dtype=jnp.float64)).data)
        for s in shifts
    ])
    pattern = sl.lin(1.0, a, -shifts[0], sl.eye(n, dtype=jnp.float64))
    for backend in ("dense", "multifrontal"):
        sym = solve_api.analyze(pattern, backend=backend)
        if backend == "dense":
            fb = solve_api.factor_batched(pattern, stacks, sym)
        else:
            fb = mf.factor_batched(stacks, sym)
        with pytest.raises(ValueError, match="index"):
            solve_api.get_factors(fb)
        for i, s in enumerate(shifts):
            m = sl.lin(1.0, a, -s, sl.eye(n, dtype=jnp.float64))
            _check_lu_export(fb, np.asarray(m.todense()), index=i)


def test_condest(rng, dtype):
    """Hager-Higham 1-norm condition estimate off the factor solves (the
    LAPACK gecon-class companion to UMFPACK's Info[RCOND]): a guaranteed
    lower bound, sharp on these operators; scaled factors estimate the
    TRUE operator because solves unscale."""
    from sparse_linear_tpu.solve import multifrontal as mf

    n = 24
    a_d = rng.standard_normal((n, n)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        a_d = a_d + 1j * rng.standard_normal((n, n)).astype(dtype)
    a_d += 5 * np.eye(n, dtype=dtype)
    r, c = np.nonzero(a_d)
    a = sl.from_triples((n, n), r, c, a_d[r, c]).tocsr()
    est = solve_api.condest(solve_api.factor(a), a)
    true = float(np.real(np.linalg.cond(a_d, 1)))
    assert est <= true * 1.001 and est > true / 10

    g = 8
    p = poisson_2d(g, dtype=np.float64)
    f = mf.factor(p, mf.analyze(p, dims=(g, g)), kind="cholesky")
    est = solve_api.condest(f, p)
    true = np.linalg.cond(np.asarray(p.todense()), 1)
    assert est <= true * 1.001 and est > true / 10

    # batched factors are rejected with a clear message
    data0 = np.asarray(p.tocsr().data)
    fb = mf.factor_batched(np.stack([data0, 2 * data0]),
                           mf.analyze(p, dims=(g, g)))
    with pytest.raises(ValueError, match="batched"):
        solve_api.condest(fb, p)


def test_equilibration(rng):
    """UMFPACK-style row scaling (umfpack.h UMFPACK_SCALE_SUM): on a badly
    row-scaled unsymmetric system the scaled factorization's plain solve is
    orders of magnitude more accurate than unscaled restricted pivoting;
    all solve modes transparently unscale; slogdet/get_factors account for
    the scaling."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 8
    n = g * g
    rng = np.random.default_rng(1)  # pinned: improvement factor is seed-dependent
    dense = np.asarray(poisson_2d(g, dtype=np.float64).todense())
    rows_sc = 10.0 ** rng.uniform(-5, 5, n)
    bad = dense * rows_sc[:, None]
    r0, c0 = np.nonzero(bad)
    a = sl.from_triples((n, n), r0, c0, bad[r0, c0]).tocsr()
    sym = mf.analyze(a, dims=(g, g))
    b = rng.standard_normal(n)

    f0 = mf.factor(a, sym, kind="lu", scale="none")
    res0 = np.linalg.norm(bad @ np.asarray(mf.solve(f0, jnp.asarray(b))) - b)
    assert f0.row_scale is None
    for scale in ("sum", "max"):
        f = mf.factor(a, sym, kind="lu", scale=scale)
        assert f.row_scale is not None and f.row_scale.shape == (n,)
        x = mf.solve(f, jnp.asarray(b))
        res = np.linalg.norm(bad @ np.asarray(x) - b)
        assert res < res0 / 10  # scaling rescues restricted pivoting
        # trans mode unscales on the way out
        xh = mf.solve(f, jnp.asarray(b), trans=True)
        resh = np.linalg.norm(bad.T @ np.asarray(xh) - b) / np.linalg.norm(b)
        assert resh < 1e-8
        # determinant correction: det A = det(R A) / det R
        sgn, logabs = solve_api.slogdet(f)
        ref_s, ref_l = np.linalg.slogdet(bad)
        np.testing.assert_allclose(float(logabs), ref_l, rtol=1e-9)
        np.testing.assert_allclose(float(np.real(sgn)), ref_s)
        # exported factors are of the SCALED operator
        L, U, rp, cp = solve_api.get_factors(f)
        scaled = f.row_scale[:, None] * bad
        err = np.max(np.abs(
            np.asarray(L.todense()) @ np.asarray(U.todense())
            - scaled[np.ix_(rp, cp)]
        ))
        assert err < 1e-12 * np.max(np.abs(scaled))

    # Cholesky path: symmetric scaling preserves SPD
    d = 10.0 ** rng.uniform(-3, 3, n)
    spd = d[:, None] * dense * d[None, :]
    r0, c0 = np.nonzero(spd)
    s_mat = sl.from_triples((n, n), r0, c0, spd[r0, c0]).tocsr()
    fs = mf.factor(s_mat, mf.analyze(s_mat, dims=(g, g)),
                   kind="cholesky", scale="sum")
    assert not fs.breakdown
    x = mf.solve(fs, jnp.asarray(b))
    assert np.linalg.norm(spd @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8
    sgn, logabs = solve_api.slogdet(fs)
    np.testing.assert_allclose(float(logabs), np.linalg.slogdet(spd)[1],
                               rtol=1e-9)

    # batched value-sets get per-set scales
    data0 = np.asarray(a.data)
    fb = mf.factor_batched(np.stack([data0, 2.0 * data0]), sym, scale="sum")
    assert fb.row_scale.shape == (2, n)
    xb = mf.solve_batched(fb, np.stack([b[:, None]] * 2))
    for e, m in enumerate((bad, 2.0 * bad)):
        res = np.linalg.norm(m @ np.asarray(xb[e][:, 0]) - b)
        assert res / np.linalg.norm(b) < 1e-6

    # dense backend: no scale option (full pivoting)
    with pytest.raises(ValueError, match="multifrontal"):
        solve_api.factor(a, backend="dense", scale="sum")


def test_solve_gmres_fallback():
    """Right-preconditioned FGMRES on the factors converges where
    stationary refinement diverges: an indefinite interior-shifted
    Laplacian factored with an aggressive static pivot perturbation has a
    refinement iteration matrix with spectral radius > 1, but the
    preconditioned spectrum stays clustered."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 16
    n = g * g
    a = poisson_2d(g, dtype=np.float64)
    dense = np.asarray(a.todense())
    ev = np.unique(np.linalg.eigvalsh(dense))
    gaps = np.diff(ev)
    k = int(np.argmax(gaps[len(gaps) // 4: 3 * len(gaps) // 4])
            ) + len(gaps) // 4
    sigma = (ev[k] + ev[k + 1]) / 2  # widest interior gap: indefinite
    m = sl.lin(1.0, a, -sigma, sl.eye(n, dtype=jnp.float64)).tocsr()
    md = dense - sigma * np.eye(n)
    b = np.random.default_rng(0).standard_normal(n)
    sym = mf.analyze(m, dims=(g, g))
    f = mf.factor(m, sym, kind="lu", pivot_eps=0.3)

    _, info_r = solve_api.solve_refined(f, m, jnp.asarray(b), tol=1e-11,
                                        max_iter=20)
    assert not info_r.converged  # stationary refinement diverges here
    x, info_g = solve_api.solve_gmres(f, m, jnp.asarray(b), tol=1e-11)
    assert info_g.converged
    assert np.linalg.norm(md @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-10

    # complex operator, all three trans modes solve the right system
    c = m.map_values(lambda v: (1.0 + 0.2j) * v.astype(np.complex128))
    cd = (1.0 + 0.2j) * md
    fc = mf.factor(c, mf.analyze(c, dims=(g, g)), kind="lu", pivot_eps=0.1)
    bc = b + 1j * np.random.default_rng(1).standard_normal(n)
    for tr, opd in ((False, cd), (True, cd.conj().T), ("T", cd.T)):
        x, info = solve_api.solve_gmres(fc, c, jnp.asarray(bc), trans=tr,
                                        tol=1e-10)
        res = np.linalg.norm(opd @ np.asarray(x) - bc) / np.linalg.norm(bc)
        assert res < 1e-9, (tr, res)


def test_batched_rhs(rng, dtype):
    a = poisson_2d(5, dtype=np.float64)
    if np.issubdtype(dtype, np.complexfloating):
        a = a.map_values(lambda v: v.astype(dtype))
    bs = rng.standard_normal((25, 6)).astype(dtype)
    f = solve_api.factor(a)
    xs = solve_api.solve_many(f, jnp.asarray(bs))
    assert xs.shape == (25, 6)
    r = np.asarray(a.todense()) @ np.asarray(xs) - bs
    assert np.linalg.norm(r) / np.linalg.norm(bs) < 1e-12


def test_nonsquare_rejected():
    with pytest.raises(ValueError, match="square"):
        solve_api.analyze(sl.zeros((3, 4), dtype=jnp.float64))


def test_cg_poisson(rng):
    from sparse_linear_tpu.formats.structured import csr_to_dia
    from sparse_linear_tpu.solve.cg import cg

    a = poisson_2d(10, dtype=np.float64)
    dia = csr_to_dia(a)
    b = rng.standard_normal(100)
    res = cg(lambda x: dia @ x, jnp.asarray(b), tol=1e-12, maxiter=2000)
    assert bool(res.converged)
    r = np.asarray(a.todense()) @ np.asarray(res.x) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10


def test_solve_matches_scipy(rng):
    """Ground-truth comparison against an independent implementation."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from scipy.sparse.linalg import spsolve

    a = poisson_2d(7, dtype=np.float64)
    b = rng.standard_normal(49)
    x = solve_api.linear_solve(a, jnp.asarray(b))
    a_sp = scipy_sparse.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    np.testing.assert_allclose(np.asarray(x), spsolve(a_sp, b), atol=1e-10)


def test_amd_ordering_quality_and_solve(rng):
    """AMD (native C++): valid permutation, less fill than RCM on Poisson,
    and a correct end-to-end solve through analyze(ordering='amd')."""
    from sparse_linear_tpu.solve import multifrontal as mf
    from sparse_linear_tpu.solve import ordering as om
    from sparse_linear_tpu.solve.multifrontal import _symmetrized_pattern
    from sparse_linear_tpu.solve.symbolic_py import python_symbolic

    a = poisson_2d(24, dtype=np.float64)
    n = a.shape[0]
    ip, ix = _symmetrized_pattern(a, np.arange(n, dtype=np.int32))
    p_amd = om.amd(ip, ix, n)
    assert sorted(p_amd.tolist()) == list(range(n))
    # fill comparison (skip if the native library fell back to RCM)
    from sparse_linear_tpu.utils.native import native_amd
    if native_amd(n, ip, ix) is not None:
        fills = {}
        for name, perm in (("rcm", om.rcm(ip, ix, n)), ("amd", p_amd)):
            ip2, ix2 = _symmetrized_pattern(a, perm)
            fills[name] = python_symbolic(n, ip2, ix2, 0, 0.0)["lnnz"]
        assert fills["amd"] < fills["rcm"]

    sym = mf.analyze(a, ordering="amd")
    f = mf.factor(a, sym)
    b = rng.standard_normal(n)
    x = mf.solve(f, jnp.asarray(b))
    r = np.asarray(a @ x) - b
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-10


def test_amd_random_pattern_valid(rng):
    """AMD handles unstructured symmetric patterns (supervariable merges,
    element absorption paths)."""
    from sparse_linear_tpu.solve import ordering as om
    from sparse_linear_tpu.solve.multifrontal import _symmetrized_pattern

    n = 150
    m = (rng.random((n, n)) < 0.05)
    m = m | m.T | np.eye(n, dtype=bool)
    b = sl.from_dense(m.astype(np.float64)).tocsr()
    ip, ix = _symmetrized_pattern(b, np.arange(n, dtype=np.int32))
    p = om.amd(ip, ix, n)
    assert sorted(p.tolist()) == list(range(n))


def test_cholesky_kind_matches_lu(rng):
    """kind='cholesky' (SPD fast path) matches the LU factorization results
    in solve, trans-solve, and batched modes."""
    import jax.numpy as jnp

    from sparse_linear_tpu.solve import multifrontal as mf

    g = 16
    a = poisson_2d(g, dtype=np.float64)
    n = g * g
    sym = mf.analyze(a, dims=(g, g))
    b = rng.standard_normal((n, 2))
    f_lu = mf.factor(a, sym, kind="lu")
    f_ch = mf.factor(a, sym, kind="cholesky")
    x_lu = np.asarray(mf.solve(f_lu, jnp.asarray(b)))
    x_ch = np.asarray(mf.solve(f_ch, jnp.asarray(b)))
    np.testing.assert_allclose(x_ch, x_lu, atol=1e-10)
    xt = np.asarray(mf.solve(f_ch, jnp.asarray(b), trans=True))
    r = np.linalg.norm(np.asarray(a.T @ xt) - b) / np.linalg.norm(b)
    assert r < 1e-12
    stack = jnp.asarray(
        np.stack([np.asarray(a.data) * (1 + 0.25 * k) for k in range(2)])
    )
    fb = mf.factor_batched(stack, sym, kind="cholesky")
    bs = jnp.asarray(rng.standard_normal((2, n, 1)))
    xs = mf.solve_batched(fb, bs)
    for k in range(2):
        ak = a.map_values(lambda v, k=k: v * (1 + 0.25 * k))
        rk = np.linalg.norm(np.asarray(ak @ xs[k]) - np.asarray(bs[k]))
        assert rk < 1e-10


def _partial_system_matrices(f, n):
    """Dense operator of each solve_part system, from the exported factors
    (ground truth: umfpack.h's sys definitions over get_numeric's L/U/P/Q)."""
    L, U, rp, cp = solve_api.get_factors(f)
    Ld, Ud = np.asarray(L.todense()), np.asarray(U.todense())
    P = np.eye(n)[rp]          # P b = b[rp]
    Q = np.eye(n)[cp].T        # Q^T x = x[cp]
    return {
        "Pt_L": P.T @ Ld, "L": Ld,
        "Lt_P": Ld.conj().T @ P, "Lat_P": Ld.T @ P,
        "Lt": Ld.conj().T, "Lat": Ld.T,
        "U_Qt": Ud @ Q.T, "U": Ud,
        "Ut_Q": Ud.conj().T @ Q, "Uat_Q": Ud.T @ Q,
        "Ut": Ud.conj().T, "Uat": Ud.T,
    }


def _check_solve_part(f, n, rng, dtype=np.float64, tol=1e-9):
    systems = _partial_system_matrices(f, n)
    b = rng.standard_normal((n, 2)).astype(dtype)
    if np.issubdtype(dtype, np.complexfloating):
        b = b + 1j * rng.standard_normal((n, 2)).astype(dtype)
    for sys_name, m in systems.items():
        x = np.asarray(solve_api.solve_part(f, jnp.asarray(b), sys_name))
        r = np.linalg.norm(m @ x - b) / np.linalg.norm(b)
        assert r < tol, f"sys={sys_name}: rel residual {r:.2e}"
    # single-RHS shape passthrough, including the plain-transpose ("at")
    # codes that reduce through a conj recursion (advisor round-2 finding:
    # the reduction used to skip the squeeze and return (n, 1))
    for sys_name in ("L", "Lat", "Uat_Q"):
        x1 = np.asarray(solve_api.solve_part(f, jnp.asarray(b[:, 0]),
                                             sys_name))
        assert x1.shape == (n,), f"sys={sys_name}: shape {x1.shape}"
        r = np.linalg.norm(systems[sys_name] @ x1 - b[:, 0])
        assert r / np.linalg.norm(b[:, 0]) < tol
    # wrong-length rhs must raise, not silently clip-gather
    with pytest.raises(ValueError, match="rows"):
        solve_api.solve_part(f, jnp.asarray(b[: n - 1]), "Pt_L")


def test_solve_part_dense(rng, dtype):
    """UMFPACK partial-solve subsystems (sys=UMFPACK_Pt_L..UMFPACK_Uat,
    umfpack.h; the reference binds only sys=0/1, Internal.hs:141-142) —
    dense backend, all 12 codes against the exported factors."""
    n = 12
    rows, cols, vals = random_coo(rng, n, n, dtype)
    a = sl.from_triples((n, n), rows, cols, vals).tocsr()
    a = sl.add(a, sl.eye(n, dtype=dtype).scale(8.0)).tocsr()
    f = solve_api.factor(a)
    _check_solve_part(f, n, rng, dtype)


def test_solve_part_multifrontal_lu(rng):
    """All 12 partial-solve codes through the level-batched multifrontal
    pipeline, on an unsymmetric convection operator whose in-front pivot
    permutations are non-trivial (row_perm != col_perm)."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 8
    cc = 1.2
    rows, cols, vals = [], [], []
    for i in range(g):
        for j in range(g):
            k0 = i * g + j
            rows.append(k0), cols.append(k0), vals.append(4.0)
            if j > 0:
                rows.append(k0), cols.append(k0 - 1), vals.append(-1.0 - cc)
            if j < g - 1:
                rows.append(k0), cols.append(k0 + 1), vals.append(-1.0 + cc)
            if i > 0:
                rows.append(k0), cols.append(k0 - g), vals.append(-1.0 - cc)
            if i < g - 1:
                rows.append(k0), cols.append(k0 + g), vals.append(-1.0 + cc)
    c = sl.from_triples(
        (g * g, g * g), rows, cols, np.array(vals, dtype=np.float64)
    ).tocsr()
    f = mf.factor(c, mf.analyze(c, dims=(g, g)), kind="lu")
    _check_solve_part(f, g * g, rng)
    # composing the partial solves reproduces the full solve:
    # A x = b  =>  x = Q U^{-1} L^{-1} P b = U_Qt after Pt_L
    b = rng.standard_normal(g * g)
    z = solve_api.solve_part(f, jnp.asarray(b), "Pt_L")
    x = solve_api.solve_part(f, z, "U_Qt")
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(solve_api.solve(f, jnp.asarray(b))),
        atol=1e-10)


def test_solve_part_multifrontal_cholesky(rng):
    """Partial solves on a Cholesky factorization (U = L^H, no pivoting)."""
    from sparse_linear_tpu.solve import multifrontal as mf

    g = 8
    a = poisson_2d(g, dtype=np.float64)
    f = mf.factor(a, mf.analyze(a, dims=(g, g)), kind="cholesky")
    _check_solve_part(f, g * g, rng)


def test_solve_part_rejects(rng):
    """Unknown sys codes and batched factors are rejected with messages."""
    from sparse_linear_tpu.solve import multifrontal as mf

    n = 16
    a = laplacian_1d(n, dtype=np.float64)
    f = solve_api.factor(a)
    with pytest.raises(ValueError, match="unknown sys"):
        solve_api.solve_part(f, jnp.ones(n), "Z")
    sym = mf.analyze(a)
    stack = np.stack([np.asarray(a.data)] * 2)
    fb = mf.factor_batched(stack, sym)
    with pytest.raises(ValueError, match="batched"):
        mf.solve_part(fb, jnp.ones(n), "L")
