"""Property-based tests (hypothesis): the QuickCheck analog of the
reference's test harness (SURVEY.md §4a; reference
sparse-linear/tests/Test/LinearAlgebra.hs — `arbitraryMatrix` +
`checkMatrix` over every constructor, and the algebraic law suites in
tests/Numeric/LinearAlgebra/Sparse.hs).

Random shapes / densities / dtypes flow through ``check_matrix`` on every
constructor, and the core algebraic laws are checked against dense numpy
ground truth.
"""

import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import sparse_linear_tpu as sl  # noqa: E402

# Bounded sizes + example counts: the suite is CI; every fresh shape
# triggers an XLA compile, so examples are few and shapes small.
_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_DTYPES = st.sampled_from([np.float32, np.float64, np.complex128])


@st.composite
def triples(draw, max_dim=20, max_nnz=60):
    """Random (shape, rows, cols, vals) with duplicates allowed — the
    reference's arbitraryMatrix generates exactly this (unsorted,
    duplicated COO triples)."""
    nr = draw(st.integers(1, max_dim))
    nc = draw(st.integers(1, max_dim))
    n = draw(st.integers(0, max_nnz))
    dtype = draw(_DTYPES)
    rows = draw(
        st.lists(st.integers(0, nr - 1), min_size=n, max_size=n)
    )
    cols = draw(
        st.lists(st.integers(0, nc - 1), min_size=n, max_size=n)
    )
    fl = st.floats(-10, 10, allow_nan=False, width=32)
    re = draw(st.lists(fl, min_size=n, max_size=n))
    if np.issubdtype(dtype, np.complexfloating):
        im = draw(st.lists(fl, min_size=n, max_size=n))
        vals = np.array(re, dtype=np.float64) + 1j * np.array(im)
    else:
        vals = np.array(re, dtype=np.float64)
    return (nr, nc), np.array(rows, int), np.array(cols, int), \
        vals.astype(dtype)


def dense_of(shape, rows, cols, vals):
    d = np.zeros(shape, dtype=vals.dtype)
    np.add.at(d, (rows, cols), vals)  # duplicate fold == addition
    return d


# ------------------------------------------------------------- constructors


@given(t=triples())
@settings(**_SETTINGS)
@pytest.mark.slow
def test_from_triples_invariants_and_semantics(t):
    """Every from_triples output passes check_matrix in all three formats,
    and duplicate triples fold additively (reference fromTriples +
    compress, Matrix/Sparse.hs:401-431)."""
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals)
    for conv in (lambda x: x, lambda x: x.tocsr(), lambda x: x.tocsc()):
        mm = conv(m)
        sl.check_matrix(mm)
        np.testing.assert_allclose(
            np.asarray(mm.todense()), dense_of(shape, rows, cols, vals),
            atol=1e-5 if vals.dtype == np.float32 else 1e-12,
        )


@given(t=triples())
@settings(**_SETTINGS)
@pytest.mark.slow
def test_roundtrip_csr_csc_coo(t):
    """Format round-trips preserve the matrix exactly."""
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals).tocsr()
    ref = np.asarray(m.todense())
    for path in (
        lambda x: x.tocsc().tocsr(),
        lambda x: x.tocoo().tocsr(),
        lambda x: x.tocsc().tocoo().tocsr(),
    ):
        np.testing.assert_array_equal(np.asarray(path(m).todense()), ref)


@given(t=triples())
@settings(**_SETTINGS)
@pytest.mark.slow
def test_transpose_involution(t):
    """(A^T)^T == A and (A^H)^H == A (reference prop_trans laws)."""
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals).tocsr()
    ref = np.asarray(m.todense())
    np.testing.assert_array_equal(np.asarray(m.T.T.todense()), ref)
    np.testing.assert_array_equal(
        np.asarray(m.ctrans().ctrans().todense()), ref
    )
    np.testing.assert_array_equal(np.asarray(m.T.todense()), ref.T)
    np.testing.assert_array_equal(
        np.asarray(m.ctrans().todense()), ref.conj().T
    )


@given(t=triples(max_dim=12), n=st.integers(1, 12))
@settings(**_SETTINGS)
def test_identity_laws(t, n):
    """eye, diag, zeros pass invariants; diag(takeDiag) on square."""
    shape, rows, cols, vals = t
    i = sl.eye(n, dtype=jnp.float64)
    sl.check_matrix(i)
    np.testing.assert_array_equal(np.asarray(i.todense()), np.eye(n))
    z = sl.zeros((n, n))
    sl.check_matrix(z)
    assert not np.any(np.asarray(z.todense()))
    d = np.arange(1.0, n + 1)
    dm = sl.diag(jnp.asarray(d))
    sl.check_matrix(dm)
    np.testing.assert_array_equal(
        np.asarray(sl.take_diag(dm)), d
    )


# ------------------------------------------------------------ algebra laws


@given(t=triples(), a=st.floats(-4, 4, allow_nan=False),
       b=st.floats(-4, 4, allow_nan=False))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_lin_matches_dense(t, a, b):
    """lin(a, M, b, N) == a*M + b*N on dense ground truth, and the result
    passes invariants (reference glin/lin laws)."""
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals).tocsr()
    # second operand: the transpose pattern of m (different pattern)
    n2 = sl.from_triples(
        shape, cols % shape[0], rows % shape[1],
        vals.astype(vals.dtype),
    ).tocsr()
    out = sl.lin(a, m, b, n2)
    sl.check_matrix(out)
    ref = a * np.asarray(m.todense()) + b * np.asarray(n2.todense())
    np.testing.assert_allclose(
        np.asarray(out.todense()), ref,
        atol=1e-4 if vals.dtype == np.float32 else 1e-10,
    )


@given(t=triples())
@settings(**_SETTINGS)
@pytest.mark.slow
def test_add_commutes_scale_distributes(t):
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals).tocsr()
    n2 = sl.from_triples(
        shape, (rows + 1) % shape[0], cols, vals
    ).tocsr()
    ab = sl.add(m, n2)
    ba = sl.add(n2, m)
    np.testing.assert_allclose(
        np.asarray(ab.todense()), np.asarray(ba.todense()), atol=1e-6
    )
    s2 = sl.scale(ab, 2.0)
    ref = 2.0 * (np.asarray(m.todense()) + np.asarray(n2.todense()))
    np.testing.assert_allclose(
        np.asarray(s2.todense()), ref,
        atol=1e-4 if vals.dtype == np.float32 else 1e-10,
    )


@given(t=triples())
@settings(**_SETTINGS)
def test_spmv_linearity(t):
    """A(x + 2y) == Ax + 2Ay and matches the dense product."""
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals).tocsr()
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape[1])
    y = rng.standard_normal(shape[1])
    if np.issubdtype(vals.dtype, np.complexfloating):
        x = x + 1j * rng.standard_normal(shape[1])
    d = np.asarray(m.todense())
    atol = 1e-3 if vals.dtype == np.float32 else 1e-9
    np.testing.assert_allclose(
        np.asarray(sl.spmv(m, jnp.asarray(x + 2 * y))),
        np.asarray(sl.spmv(m, jnp.asarray(x)))
        + 2 * np.asarray(sl.spmv(m, jnp.asarray(y))),
        atol=atol,
    )
    np.testing.assert_allclose(
        np.asarray(sl.spmv(m, jnp.asarray(x))), d @ x, atol=atol
    )


@given(t=triples(max_dim=8, max_nnz=24), u=triples(max_dim=6, max_nnz=18))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_kron_and_blocks(t, u):
    """kron matches numpy; hcat/vcat/from_blocks assemble correctly."""
    (sa, ra, ca, va) = t
    (sb, rb, cb, vb) = u
    if np.issubdtype(va.dtype, np.complexfloating) != np.issubdtype(
        vb.dtype, np.complexfloating
    ):
        va = va.astype(np.complex128)
        vb = vb.astype(np.complex128)
    a = sl.from_triples(sa, ra, ca, va).tocsr()
    b = sl.from_triples(sb, rb, cb, vb).tocsr()
    k = sl.kron(a, b)
    sl.check_matrix(k)
    np.testing.assert_allclose(
        np.asarray(k.todense()),
        np.kron(np.asarray(a.todense()), np.asarray(b.todense())),
        atol=1e-5,
    )
    h = sl.hcat([a, a])
    sl.check_matrix(h)
    np.testing.assert_array_equal(
        np.asarray(h.todense()),
        np.hstack([np.asarray(a.todense())] * 2),
    )
    v = sl.vcat([a, a])
    sl.check_matrix(v)
    np.testing.assert_array_equal(
        np.asarray(v.todense()),
        np.vstack([np.asarray(a.todense())] * 2),
    )


@given(t=triples(max_dim=10, max_nnz=40), u=triples(max_dim=10, max_nnz=40))
@settings(**_SETTINGS)
def test_spgemm_matches_dense(t, u):
    """A @ B (sparse x sparse) against dense numpy, any shapes/dtypes."""
    (sa, ra, ca, va) = t
    (sb, rb, cb, vb) = u
    # make inner dims agree
    sb = (sa[1], sb[1])
    rb = rb % sb[0]
    a = sl.from_triples(sa, ra, ca, va).tocsr()
    b = sl.from_triples(sb, rb, cb, vb).tocsr()
    from sparse_linear_tpu.ops.spgemm import spgemm

    c = spgemm(a, b)
    sl.check_matrix(c)
    ref = np.asarray(a.todense()) @ np.asarray(b.todense())
    np.testing.assert_allclose(
        np.asarray(c.todense()), ref,
        atol=1e-3 if np.result_type(va, vb) == np.float32 else 1e-9,
    )


@given(t=triples(max_dim=16))
@settings(**_SETTINGS)
def test_trim_idempotent_preserves(t):
    """trim is idempotent and value-preserving (canonical form)."""
    shape, rows, cols, vals = t
    m = sl.from_triples(shape, rows, cols, vals).tocsr()
    t1 = sl.trim(m)
    t2 = sl.trim(t1)
    sl.check_matrix(t1)
    np.testing.assert_array_equal(
        np.asarray(t1.todense()), np.asarray(m.todense())
    )
    np.testing.assert_array_equal(
        np.asarray(t1.indptr), np.asarray(t2.indptr)
    )


# -------------------------------------------------------- sparse vectors


@given(
    n=st.integers(1, 30),
    pairs=st.lists(
        st.tuples(st.integers(0, 29), st.floats(-5, 5, allow_nan=False)),
        max_size=40,
    ),
)
@settings(**_SETTINGS)
def test_sparse_vector_from_pairs(n, pairs):
    """from_pairs dedups additively and stays sorted (reference
    fromPairs, Vector/Sparse.hs)."""
    idx = np.array([p[0] % n for p in pairs], int)
    val = np.array([p[1] for p in pairs])
    v = sl.from_pairs(n, idx, val)
    dense = np.zeros(n)
    np.add.at(dense, idx, val)
    got = np.zeros(n)
    vi = np.asarray(v.indices)[: v.nnz]
    vv = np.asarray(v.data)[: v.nnz]
    got[vi] = vv
    np.testing.assert_allclose(got, dense, atol=1e-10)
    assert np.all(np.diff(vi) > 0)


# ------------------------------------------------------- factor queries


@st.composite
def square_system(draw, max_dim=12):
    """Random square matrix made safely nonsingular by a diagonal boost."""
    n = draw(st.integers(2, max_dim))
    dtype = draw(_DTYPES)
    fl = st.floats(-3, 3, allow_nan=False, width=32)
    vals = np.array(
        draw(st.lists(fl, min_size=n * n, max_size=n * n)), np.float64
    ).reshape(n, n)
    if np.issubdtype(dtype, np.complexfloating):
        im = np.array(
            draw(st.lists(fl, min_size=n * n, max_size=n * n)), np.float64
        ).reshape(n, n)
        vals = vals + 1j * im
    d = vals.astype(dtype) + (3.0 * n) * np.eye(n, dtype=dtype)
    return n, d


@given(s=square_system())
@settings(**_SETTINGS)
@pytest.mark.slow
def test_factor_queries_match_dense(s):
    """slogdet/det/rcond/get_factors agree with dense numpy ground truth on
    random nonsingular systems (UMFPACK get_determinant / Info[RCOND] /
    get_numeric analogs)."""
    from sparse_linear_tpu.solve import api as solve_api

    n, d = s
    r, c = np.nonzero(d)
    a = sl.from_triples((n, n), r, c, d[r, c]).tocsr()
    f = solve_api.factor(a)
    sign, logabs = solve_api.slogdet(f)
    rs, rl = np.linalg.slogdet(d)
    np.testing.assert_allclose(logabs, rl, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(sign, rs, rtol=1e-5, atol=1e-6)
    rc_est = solve_api.rcond(f)
    assert 0 < float(rc_est) <= 1.0 + 1e-12
    est = solve_api.condest(f, a)
    true = float(np.real(np.linalg.cond(d.astype(np.complex128), 1)))
    assert est <= true * (1 + 1e-6)  # guaranteed lower bound
    L, U, rp, cp = solve_api.get_factors(f)
    Ld, Ud = np.asarray(L.todense()), np.asarray(U.todense())
    ref = d[np.ix_(rp, cp)]
    scale = max(float(np.max(np.abs(ref))), 1e-30)
    assert float(np.max(np.abs(Ld @ Ud - ref))) / scale < 1e-5
    assert np.allclose(np.triu(Ld, 1), 0) and np.allclose(np.tril(Ud, -1), 0)


@given(s=square_system(max_dim=10),
       scale=st.sampled_from(["none", "sum", "max"]))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_multifrontal_queries_random_pattern(s, scale):
    """Multifrontal factor queries on random patterns (AMD ordering, every
    equilibration mode): solve residual, slogdet vs numpy, scaled-operator
    export identity."""
    from sparse_linear_tpu.solve import api as solve_api
    from sparse_linear_tpu.solve import multifrontal as mf

    n, d = s
    # pin the engine-real f64 path: dtype spread is covered by the dense
    # property test; this one checks the multifrontal semantics
    d = np.real(d).astype(np.float64) + (
        (3.0 * n) * np.eye(n) if np.issubdtype(d.dtype, np.complexfloating)
        else 0.0
    )
    r, c = np.nonzero(d)
    a = sl.from_triples((n, n), r, c, d[r, c]).tocsr()
    f = mf.factor(a, mf.analyze(a), kind="lu", scale=scale)
    b = np.linspace(-1, 1, n)
    x = mf.solve(f, jnp.asarray(b))
    assert np.linalg.norm(d @ np.asarray(x) - b) / np.linalg.norm(b) < 1e-8
    sign, logabs = solve_api.slogdet(f)
    rs, rl = np.linalg.slogdet(d)
    np.testing.assert_allclose(float(logabs), rl, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(sign), rs, rtol=1e-6)
    L, U, rp, cp = solve_api.get_factors(f)
    target = d if f.row_scale is None else f.row_scale[:, None] * d
    ref = target[np.ix_(rp, cp)]
    err = np.max(np.abs(
        np.asarray(L.todense()) @ np.asarray(U.todense()) - ref
    ))
    assert err < 1e-8 * max(np.max(np.abs(ref)), 1e-30)
