"""Op-layer tests: SpMV/SpMM, elementwise algebra, SpGEMM, structural ops.

Algebraic-law properties transfer from the reference suite
(sparse-linear/tests/Sparse.hs): additive identity/inverse/commutativity/
associativity (:147-165), multiplicative identities + associativity (:75-92),
`kron eye eye == eye` (:26-29), `eye @ v == v` (:41-47), fromBlocksDiag
identity assembly + symmetry (:104-135).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from tests.conftest import random_coo

SHAPES = [(1, 1), (4, 6), (6, 4), (9, 9)]


def rand_matrix(rng, nr, nc, dtype):
    rows, cols, vals = random_coo(rng, nr, nc, dtype)
    return sl.from_triples((nr, nc), rows, cols, vals).tocsr()


def dense(m):
    return np.asarray(m.todense())


# ---------------------------------------------------------------- SpMV / SpMM


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
def test_spmv_matches_dense(shape, fmt, rng, dtype):
    m = rand_matrix(rng, *shape, dtype)
    m = getattr(m, f"to{fmt}")()
    x = rng.standard_normal(shape[1]).astype(dtype)
    np.testing.assert_allclose(
        np.asarray(m @ x), dense(m) @ x, atol=1e-12
    )


def test_spmv_identity(rng, dtype):
    # eye @ v == v (reference Sparse.hs:41-47, test-umfpack.hs analog)
    v = rng.standard_normal(8).astype(dtype)
    np.testing.assert_allclose(np.asarray(sl.eye(8, dtype=dtype) @ v), v, atol=0)


def test_axpy(rng, dtype):
    m = rand_matrix(rng, 5, 7, dtype)
    x = rng.standard_normal(7).astype(dtype)
    y = rng.standard_normal(5).astype(dtype)
    np.testing.assert_allclose(
        np.asarray(sl.axpy(m, x, y)), y + dense(m) @ x, atol=1e-12
    )


def test_spmm(rng, dtype):
    m = rand_matrix(rng, 5, 7, dtype)
    b = rng.standard_normal((7, 3)).astype(dtype)
    np.testing.assert_allclose(np.asarray(m @ b), dense(m) @ b, atol=1e-12)


def test_spmv_under_jit(rng, dtype):
    m = rand_matrix(rng, 6, 6, dtype)
    x = rng.standard_normal(6).astype(dtype)

    @jax.jit
    def f(m, x):
        return sl.spmv(m, x)

    np.testing.assert_allclose(np.asarray(f(m, x)), dense(m) @ x, atol=1e-12)


def test_ctrans_spmv_adjoint(rng, dtype):
    # <A^H y, x> == <y, A x>
    m = rand_matrix(rng, 5, 7, dtype)
    x = rng.standard_normal(7).astype(dtype)
    y = rng.standard_normal(5).astype(dtype)
    lhs = np.vdot(np.asarray(m.ctrans() @ y), x)
    rhs = np.vdot(y, np.asarray(m @ x))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


# -------------------------------------------------------------- add/lin/glin


@pytest.mark.parametrize("shape", SHAPES)
def test_add_matches_dense(shape, rng, dtype):
    a = rand_matrix(rng, *shape, dtype)
    b = rand_matrix(rng, *shape, dtype)
    s = a + b
    sl.check_matrix(s)
    np.testing.assert_allclose(dense(s), dense(a) + dense(b), atol=1e-12)


@pytest.mark.slow
def test_additive_laws(rng, dtype):
    a = rand_matrix(rng, 6, 5, dtype)
    b = rand_matrix(rng, 6, 5, dtype)
    c = rand_matrix(rng, 6, 5, dtype)
    z = sl.zeros((6, 5), dtype=dtype)
    # identity
    np.testing.assert_allclose(dense(a + z), dense(a), atol=0)
    # inverse
    np.testing.assert_allclose(dense(a + (-a)), 0 * dense(a), atol=0)
    # commutativity
    np.testing.assert_allclose(dense(a + b), dense(b + a), atol=1e-12)
    # associativity
    np.testing.assert_allclose(
        dense((a + b) + c), dense(a + (b + c)), atol=1e-12
    )


def test_lin_and_sub(rng, dtype):
    a = rand_matrix(rng, 4, 4, dtype)
    b = rand_matrix(rng, 4, 4, dtype)
    np.testing.assert_allclose(
        dense(sl.lin(2.0, a, 3.0, b)), 2 * dense(a) + 3 * dense(b), atol=1e-12
    )
    np.testing.assert_allclose(dense(a - b), dense(a) - dense(b), atol=1e-12)


def test_scale(rng, dtype):
    a = rand_matrix(rng, 4, 4, dtype)
    np.testing.assert_allclose(dense(2.5 * a), 2.5 * dense(a), atol=1e-12)


def test_glin_fold_semantics(dtype):
    # union-fold elementwise mul: A-only slots keep a, B-only become 0
    a = sl.from_triples((2, 2), [0, 1], [0, 1], np.asarray([2, 3], dtype=dtype))
    b = sl.from_triples((2, 2), [0, 1], [0, 0], np.asarray([5, 7], dtype=dtype))
    out = sl.elementwise_mul(a.tocsr(), b.tocsr())
    expect = np.array([[10, 0], [0, 3]], dtype=dtype)
    np.testing.assert_allclose(dense(out), expect, atol=0)


def test_add_under_jit(rng, dtype):
    a = rand_matrix(rng, 5, 5, dtype)
    b = rand_matrix(rng, 5, 5, dtype)

    @jax.jit
    def f(a, b):
        return sl.add(a, b)

    out = f(a, b)
    np.testing.assert_allclose(dense(out), dense(a) + dense(b), atol=1e-12)


# -------------------------------------------------------------------- SpGEMM


def test_spgemm_matches_dense(rng, dtype):
    a = rand_matrix(rng, 5, 7, dtype)
    b = rand_matrix(rng, 7, 4, dtype)
    c = a @ b
    sl.check_matrix(c)
    np.testing.assert_allclose(dense(c), dense(a) @ dense(b), atol=1e-12)


def test_spgemm_identities(rng, dtype):
    a = rand_matrix(rng, 6, 6, dtype)
    i = sl.eye(6, dtype=dtype)
    np.testing.assert_allclose(dense(a @ i), dense(a), atol=1e-12)
    np.testing.assert_allclose(dense(i @ a), dense(a), atol=1e-12)


def test_spgemm_associativity(rng, dtype):
    a = rand_matrix(rng, 4, 5, dtype)
    b = rand_matrix(rng, 5, 3, dtype)
    c = rand_matrix(rng, 3, 6, dtype)
    np.testing.assert_allclose(
        dense((a @ b) @ c), dense(a @ (b @ c)), atol=1e-10
    )


def test_spgemm_inner_dim_mismatch(rng, dtype):
    a = rand_matrix(rng, 4, 5, dtype)
    b = rand_matrix(rng, 4, 5, dtype)
    with pytest.raises(ValueError, match="inner dimension"):
        a @ b


def test_spgemm_plan_reuse_under_jit(rng, dtype):
    from sparse_linear_tpu.ops.spgemm import spgemm_apply, spgemm_plan

    a = rand_matrix(rng, 5, 5, dtype)
    b = rand_matrix(rng, 5, 5, dtype)
    plan = spgemm_plan(a, b)

    @jax.jit
    def f(a, b):
        return spgemm_apply(plan, a, b)

    out = f(a, b)
    np.testing.assert_allclose(dense(out), dense(a) @ dense(b), atol=1e-12)
    # same pattern, new values: plan reused
    a2 = a.map_values(lambda v: 2 * v)
    out2 = f(a2, b)
    np.testing.assert_allclose(dense(out2), 2 * dense(a) @ dense(b), atol=1e-12)


# ------------------------------------------------------------------- structure


def test_kron_eye(dtype):
    # kron eye eye == eye (reference Sparse.hs:26-29)
    k = sl.kron(sl.eye(3, dtype=dtype), sl.eye(4, dtype=dtype))
    sl.check_matrix(k)
    np.testing.assert_array_equal(dense(k), np.eye(12))


def test_kron_matches_dense(rng, dtype):
    a = rand_matrix(rng, 3, 4, dtype)
    b = rand_matrix(rng, 2, 5, dtype)
    k = sl.kron(a, b)
    sl.check_matrix(k)
    np.testing.assert_allclose(dense(k), np.kron(dense(a), dense(b)), atol=1e-12)


def test_vcat_hcat(rng, dtype):
    a = rand_matrix(rng, 3, 5, dtype)
    b = rand_matrix(rng, 2, 5, dtype)
    v = sl.vcat([a, b])
    sl.check_matrix(v)
    np.testing.assert_allclose(dense(v), np.vstack([dense(a), dense(b)]), atol=0)
    c = rand_matrix(rng, 3, 2, dtype)
    h = sl.hcat([a, c])
    sl.check_matrix(h)
    np.testing.assert_allclose(dense(h), np.hstack([dense(a), dense(c)]), atol=0)
    with pytest.raises(ValueError, match="mismatch"):
        sl.vcat([a, c])


def test_from_blocks(rng, dtype):
    a = rand_matrix(rng, 2, 3, dtype)
    d = rand_matrix(rng, 4, 5, dtype)
    m = sl.from_blocks([[a, None], [None, d]])
    sl.check_matrix(m)
    expect = np.zeros((6, 8), dtype=dtype)
    expect[:2, :3] = dense(a)
    expect[2:, 3:] = dense(d)
    np.testing.assert_allclose(dense(m), expect, atol=0)
    with pytest.raises(ValueError, match="underspecified"):
        sl.from_blocks([[None, None], [None, d]])
    with pytest.raises(ValueError, match="incompatible"):
        sl.from_blocks([[a, rand_matrix(rng, 3, 3, dtype)]])


def test_from_blocks_diag_identity(dtype):
    # identity assembled from identity diagonal blocks (reference
    # Sparse.hs:104-117)
    i2 = sl.eye(2, dtype=dtype)
    m = sl.from_blocks_diag([[i2, i2], [None, None]])
    np.testing.assert_array_equal(dense(m), np.eye(4))


def test_from_blocks_diag_cyclic_placement(dtype):
    # blocks[d][i] lands at block position (i, (i+d) mod n)
    ones = lambda: sl.from_dense(np.ones((1, 1), dtype=dtype))
    a, b = ones(), ones().scale(2.0)
    m = sl.from_blocks_diag([[None, None], [a, b]])
    expect = np.array([[0, 1], [2, 0]], dtype=dtype)
    np.testing.assert_allclose(dense(m), expect, atol=0)


def test_from_blocks_diag_symmetry(rng, dtype):
    # hermitian assembly stays hermitian (reference Sparse.hs:119-135)
    # n=2 grid like the reference: [[symM, symN], [MN, ctrans MN]] assembles
    # to [[symM, MN], [MN^H, symN]] which is hermitian.
    mn = rand_matrix(rng, 3, 4, dtype)
    m_ = rand_matrix(rng, 3, 3, dtype)
    n_ = rand_matrix(rng, 4, 4, dtype)
    sym_m = (m_ + m_.ctrans().tocsr()).tocsr()
    sym_n = (n_ + n_.ctrans().tocsr()).tocsr()
    m = sl.from_blocks_diag([[sym_m, sym_n], [mn, mn.ctrans().tocsr()]])
    md = dense(m)
    np.testing.assert_allclose(md, md.conj().T, atol=1e-12)


def test_block_diag(rng, dtype):
    a = rand_matrix(rng, 2, 2, dtype)
    b = rand_matrix(rng, 3, 3, dtype)
    m = sl.block_diag([a, b])
    expect = np.zeros((5, 5), dtype=dtype)
    expect[:2, :2] = dense(a)
    expect[2:, 2:] = dense(b)
    np.testing.assert_allclose(dense(m), expect, atol=0)


def test_outer(dtype):
    c = sl.from_pairs(4, [1, 3], np.asarray([2, 5], dtype=dtype))
    r = sl.from_pairs(3, [0, 2], np.asarray([7, 11], dtype=dtype))
    m = sl.outer(c, r)
    sl.check_matrix(m)
    np.testing.assert_allclose(
        dense(m),
        np.outer(np.asarray(c.todense()), np.asarray(r.todense())),
        atol=0,
    )


def test_submatrix(rng, dtype):
    a = rand_matrix(rng, 7, 9, dtype)
    s = sl.submatrix(a, 2, 6, 3, 8)
    sl.check_matrix(s)
    np.testing.assert_allclose(dense(s), dense(a)[2:6, 3:8], atol=0)


def test_take_diag_rect(rng, dtype):
    a = rand_matrix(rng, 4, 7, dtype)
    np.testing.assert_allclose(
        np.asarray(sl.take_diag(a)), np.diag(dense(a)), atol=0
    )


@pytest.mark.slow
def test_spgemm_well_staged(rng):
    """The WELL-staged SpGEMM numeric phase (three 0/1-WELL SpMVs + one
    multiply) matches scipy exactly — pattern and values — and the plan is
    reusable across value sets (the analyze staging applied to SpGEMM)."""
    import scipy.sparse as sp

    from sparse_linear_tpu.ops import spgemm as sg

    nr, nk, nc = 220, 180, 260
    n1, n2 = 2600, 2200
    a = sl.from_triples(
        (nr, nk), rng.integers(0, nr, n1), rng.integers(0, nk, n1),
        rng.standard_normal(n1),
    ).tocsr()
    b = sl.from_triples(
        (nk, nc), rng.integers(0, nk, n2), rng.integers(0, nc, n2),
        rng.standard_normal(n2),
    ).tocsr()
    plan = sg.spgemm_plan_well(a, b)
    c = sg.spgemm_apply_well(plan, a.data, b.data)
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape,
    )
    Bs = sp.csr_matrix(
        (np.asarray(b.data), np.asarray(b.indices), np.asarray(b.indptr)),
        shape=b.shape,
    )
    Cs = (As @ Bs).tocsr()
    Cs.sort_indices()
    np.testing.assert_array_equal(np.asarray(c.indptr), Cs.indptr)
    np.testing.assert_array_equal(np.asarray(c.indices), Cs.indices)
    np.testing.assert_allclose(np.asarray(c.data), Cs.data, atol=1e-12)
    # plan reuse with new values (same patterns)
    a2 = a.map_values(lambda v: v * 2.0 + 1.0)
    c2 = sg.spgemm_apply_well(plan, a2.data, b.data)
    As2 = sp.csr_matrix(
        (np.asarray(a2.data), np.asarray(a2.indices), np.asarray(a2.indptr)),
        shape=a.shape,
    )
    Cs2 = (As2 @ Bs).tocsr()
    Cs2.sort_indices()
    np.testing.assert_allclose(np.asarray(c2.data), Cs2.data, atol=1e-12)
    # complex values ride the same real plan
    acx = a.map_values(lambda v: v * (1 + 0.5j))
    bcx = b.map_values(lambda v: v * (2 - 0.25j))
    plan_c = sg.spgemm_plan_well(acx, bcx)
    c3 = sg.spgemm_apply_well(plan_c, acx.data, bcx.data)
    Acx = sp.csr_matrix(
        (np.asarray(acx.data), np.asarray(acx.indices), np.asarray(acx.indptr)),
        shape=a.shape,
    )
    Bcx = sp.csr_matrix(
        (np.asarray(bcx.data), np.asarray(bcx.indices), np.asarray(bcx.indptr)),
        shape=b.shape,
    )
    Cs3 = (Acx @ Bcx).tocsr()
    Cs3.sort_indices()
    np.testing.assert_allclose(np.asarray(c3.data), Cs3.data, atol=1e-12)


def test_spgemm_well_mismatch():
    from sparse_linear_tpu.ops import spgemm as sg

    a = sl.eye(4, dtype=np.float64).tocsr()
    b = sl.eye(5, dtype=np.float64).tocsr()
    with pytest.raises(ValueError, match="mismatch"):
        sg.spgemm_plan_well(a, b)
