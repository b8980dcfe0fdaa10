"""Plane-major production-path tests (VERDICT r4 item 2).

The WELL SpMM kernels are natively plane-major ((m, n) blocks, one RHS per
row); the column-major convenience wrapper pays two full-block relayouts
per product.  These tests pin the plane-major protocol that lets the FEAST
residual/Rayleigh-Ritz programs and the Chebyshev three-term recurrence
hold their blocks in the kernel-native layout: ``_structured_op`` exposes
``.planes`` / ``.prefers_planes``, and every plane-major path must agree
with the column-major one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_linear_tpu.eig.real_pipeline import _structured_op


def _unstructured_sym_csr(n=128, seed=3, dtype=np.float32):
    """Random symmetric positive-definite CSR with a scattered pattern
    (> 64 distinct diagonals, so the DIA route rejects it)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    nnz = 6 * n
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, n, nnz)
    v = rng.standard_normal(nnz)
    m = sp.coo_matrix((v, (r, c)), shape=(n, n)).tocsr()
    m = (m + m.T) * 0.5 + sp.eye(n) * (8.0 + n / 8.0)
    import sparse_linear_tpu as sl

    m = m.tocoo()
    return sl.from_triples(
        (n, n), m.row, m.col, m.data.astype(dtype)
    ).tocsr()


def test_dia_spmm_planes_matches_cm():
    from sparse_linear_tpu.formats.structured import csr_to_dia
    from sparse_linear_tpu.kernels.spmv import dia_spmm, dia_spmm_planes
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(8, dtype=np.float64)
    d = csr_to_dia(a.tocsr())
    x = np.random.default_rng(0).standard_normal((64, 5))
    y_cm = np.asarray(dia_spmm(d, jnp.asarray(x)))
    y_pl = np.asarray(dia_spmm_planes(d, jnp.asarray(x.T)))
    np.testing.assert_allclose(y_pl, y_cm.T, rtol=1e-13, atol=1e-13)
    dense = np.asarray(a.todense())
    np.testing.assert_allclose(y_cm, dense @ x, rtol=1e-12, atol=1e-12)


def test_structured_op_well_prefers_planes():
    a = _unstructured_sym_csr()
    op, is_id = _structured_op(a)
    assert not is_id
    assert op.prefers_planes, "unstructured f32 must route to WELL planes"
    assert op.planes is not None
    n = a.shape[0]
    x = np.random.default_rng(1).standard_normal((n, 4)).astype(np.float32)
    y_cm = np.asarray(op(jnp.asarray(x)))
    y_pl = np.asarray(op.planes(jnp.asarray(x.T)))
    np.testing.assert_allclose(y_pl, y_cm.T, rtol=1e-5, atol=1e-5)
    dense = np.asarray(a.todense())
    np.testing.assert_allclose(y_cm, dense @ x, rtol=2e-4, atol=2e-4)


def test_structured_op_dia_has_planes_not_preferred():
    from sparse_linear_tpu.utils.grids import poisson_2d

    op, _ = _structured_op(poisson_2d(8, dtype=np.float64).tocsr())
    assert op.planes is not None
    assert not op.prefers_planes  # DIA is layout-agnostic: no relayouts


def _dia_planes_op(a):
    """A DIA-backed _StructuredOp with prefers_planes FORCED on.

    The layout plumbing (transposes, embeddings, reductions) is identical
    whichever kernel backs ``planes``; DIA runs natively on the CPU test
    mesh where the interpret-mode WELL kernel costs ~20 s per call under
    jit (kernel-level WELL planes-vs-cm equivalence is covered at speed in
    test_well.py).  Forcing ``prefers_planes`` drives every plane-major
    branch with exact-f64 products, so equivalence asserts at 1e-12."""
    from sparse_linear_tpu.eig.real_pipeline import _StructuredOp

    op, _ = _structured_op(a)
    assert op.planes is not None and not op.prefers_planes  # DIA route
    return _StructuredOp(op.cm, planes=op.planes, prefers_planes=True)


def test_chebyshev_filter_plane_major_matches():
    """The plane-major recurrence must produce the same filtered block as
    a column-major recurrence over the same operator."""
    from sparse_linear_tpu.eig.chebyshev import _make_filter
    from sparse_linear_tpu.eig.real_pipeline import _StructuredOp
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(12, dtype=np.float64).tocsr()
    op = _dia_planes_op(a)
    # column-major twin of the same operator (planes path disabled)
    op_cm = _StructuredOp(op.cm, planes=None, prefers_planes=False)
    n = a.shape[0]
    y = jax.random.normal(jax.random.key(0), (n, 5), dtype=jnp.float64)
    deg = 6
    f_pl = _make_filter(op, y, deg)
    f_cm = _make_filter(op_cm, y, deg)
    args = (20.0, 6.0, 1.0)
    y_pl = np.asarray(f_pl(y, *args))
    y_cm = np.asarray(f_cm(y, *args))
    np.testing.assert_allclose(y_pl, y_cm, rtol=1e-12, atol=1e-12)


def _pipeline_shell(a, use_planes):
    """A _RealPencilPipeline with only the fields programs() needs."""
    from sparse_linear_tpu.eig.real_pipeline import _RealPencilPipeline
    import sparse_linear_tpu as sl

    n = a.shape[0]
    eye = sl.eye(n, dtype=np.float64).tocsr()
    pipe = _RealPencilPipeline.__new__(_RealPencilPipeline)
    pipe.n = n
    pipe.a_mm = _dia_planes_op(a) if use_planes else _structured_op(a)[0]
    pipe.b_mm, pipe.b_is_ident = _structured_op(eye)
    pipe.use_planes = use_planes
    pipe._programs = {}
    return pipe


@pytest.mark.parametrize("prog", ["resid", "whiten_rr", "ritz"])
def test_pipeline_plane_major_programs_match(prog):
    """resid/whiten_rr/ritz must be layout-invariant: plane-major and
    column-major programs agree on identical inputs."""
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(10, dtype=np.float64).tocsr()
    n = a.shape[0]
    ne, m0 = 2, 4
    rng = np.random.default_rng(11)
    z = rng.standard_normal(ne) + 1j * np.abs(rng.standard_normal(ne))
    sigma = rng.standard_normal(ne) + 1j * rng.standard_normal(ne)

    # inputs drawn ONCE — both layouts see identical operands
    s64 = jnp.asarray(rng.standard_normal((ne, 2 * n, m0)))
    by64 = jnp.asarray(rng.standard_normal((n, m0)))
    q = jnp.asarray(rng.standard_normal((n, m0)))
    w = jnp.asarray(rng.standard_normal((m0, m0)))
    coeff = jnp.asarray(rng.standard_normal((m0, m0)))
    lam = jnp.asarray(rng.standard_normal(m0))
    keep = jnp.ones((m0,))

    outs = []
    for use_planes in (False, True):
        pipe = _pipeline_shell(a, use_planes)
        progs = pipe.programs(ne, m0, z, sigma)
        if prog == "resid":
            outs.append(np.asarray(progs["resid"](s64, by64)))
        elif prog == "whiten_rr":
            # jnp.array copy: the program DONATES its block argument
            qw, ab = progs["whiten_rr"](jnp.array(q), w)
            outs.append(np.asarray(ab))
        else:
            x, norms, y = progs["ritz"](jnp.array(q), coeff, lam, keep,
                                        jax.random.key(0))
            outs.append(np.asarray(norms))
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-12, atol=1e-12)
