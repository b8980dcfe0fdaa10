"""Format-layer tests: construction, invariants, conversions, dense roundtrip.

Models the reference suite sparse-linear/tests/Sparse.hs (its ``checkMatrix``
harness is our ``check_matrix``) under randomized input with duplicate
collisions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from tests.conftest import random_coo

SHAPES = [(1, 1), (3, 5), (5, 3), (8, 8), (17, 13)]


def dense_from_triples(shape, rows, cols, vals):
    out = np.zeros(shape, dtype=np.asarray(vals).dtype)
    np.add.at(out, (np.asarray(rows), np.asarray(cols)), np.asarray(vals))
    return out


@pytest.mark.parametrize("shape", SHAPES)
def test_from_triples_invariants_and_dense(shape, rng, dtype):
    rows, cols, vals = random_coo(rng, *shape, dtype)
    coo = sl.from_triples(shape, rows, cols, vals)
    sl.check_matrix(coo)
    ref = dense_from_triples(shape, rows, cols, vals)
    np.testing.assert_allclose(np.asarray(coo.todense()), ref, atol=1e-12)


@pytest.mark.parametrize("shape", SHAPES)
def test_csr_csc_roundtrip(shape, rng, dtype):
    rows, cols, vals = random_coo(rng, *shape, dtype)
    coo = sl.from_triples(shape, rows, cols, vals)
    csr = coo.tocsr()
    csc = coo.tocsc()
    sl.check_matrix(csr)
    sl.check_matrix(csc)
    ref = dense_from_triples(shape, rows, cols, vals)
    np.testing.assert_allclose(np.asarray(csr.todense()), ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(csc.todense()), ref, atol=1e-12)
    # cross conversions
    sl.check_matrix(csr.tocsc())
    sl.check_matrix(csc.tocsr())
    np.testing.assert_allclose(np.asarray(csr.tocsc().todense()), ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(csc.tocsr().todense()), ref, atol=1e-12)


def test_bounds_check_reports_position():
    with pytest.raises(ValueError, match="position 1"):
        sl.from_triples((2, 2), [0, 5], [0, 0], [1.0, 2.0])
    with pytest.raises(ValueError, match="column index"):
        sl.from_triples((2, 2), [0, 1], [0, -1], [1.0, 2.0])


def test_transpose_o1_view(rng, dtype):
    rows, cols, vals = random_coo(rng, 7, 4, dtype)
    csr = sl.from_triples((7, 4), rows, cols, vals).tocsr()
    t = csr.T
    assert t.shape == (4, 7)
    np.testing.assert_allclose(
        np.asarray(t.todense()), np.asarray(csr.todense()).T, atol=1e-12
    )
    # double transpose is identity
    np.testing.assert_allclose(
        np.asarray(t.T.todense()), np.asarray(csr.todense()), atol=1e-12
    )


def test_ctrans_hermitian():
    # sigma_y Pauli matrix is hermitian (reference Sparse.hs:61-73)
    sy = sl.from_triples((2, 2), [0, 1], [1, 0], [-1j, 1j], dtype=np.complex128)
    h = sy.tocsr().ctrans().tocsr()
    np.testing.assert_allclose(
        np.asarray(h.todense()), np.asarray(sy.todense()), atol=1e-15
    )
    sx = sl.from_triples((2, 2), [0, 1], [1, 0], [1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(sx.tocsr().ctrans().todense()),
        np.asarray(sx.todense()),
        atol=1e-15,
    )


def test_eye_diag_zeros():
    n = 6
    i = sl.eye(n, dtype=jnp.float64)
    sl.check_matrix(i)
    np.testing.assert_array_equal(np.asarray(i.todense()), np.eye(n))
    d = sl.diag(jnp.arange(1.0, 5.0))
    np.testing.assert_array_equal(
        np.asarray(d.todense()), np.diag(np.arange(1.0, 5.0))
    )
    z = sl.zeros((3, 4), dtype=jnp.float64)
    sl.check_matrix(z)
    assert z.nnz == 0
    np.testing.assert_array_equal(np.asarray(z.todense()), np.zeros((3, 4)))
    # takeDiag . diag == id (reference Sparse.hs:33-37)
    np.testing.assert_array_equal(
        np.asarray(sl.take_diag(d)), np.arange(1.0, 5.0)
    )
    # transpose . diag == diag (reference Sparse.hs:56-59)
    np.testing.assert_array_equal(
        np.asarray(d.T.tocsr().todense()), np.asarray(d.todense())
    )


def test_from_dense_roundtrip(rng, dtype):
    x = rng.standard_normal((6, 9))
    x[x < 0.5] = 0
    x = x.astype(dtype)
    m = sl.from_dense(x)
    sl.check_matrix(m)
    np.testing.assert_array_equal(np.asarray(m.todense()), x)


def test_compress_under_jit(rng, dtype):
    """Device-side COO->CSR with padding keeps correct semantics."""
    rows, cols, vals = random_coo(rng, 9, 7, dtype)
    ref = dense_from_triples((9, 7), rows, cols, vals)
    coo = sl.COO(
        row=jnp.asarray(rows, jnp.int32),
        col=jnp.asarray(cols, jnp.int32),
        data=jnp.asarray(vals),
        shape=(9, 7),
        nnz=None,
    )

    @jax.jit
    def go(c):
        return c.tocsr()

    csr = go(coo)
    assert csr.capacity == len(vals)  # capacity preserved under jit
    np.testing.assert_allclose(np.asarray(csr.todense()), ref, atol=1e-12)
    sl.check_matrix(sl.trim(csr))


def test_sparse_vector_roundtrip_and_algebra(dtype):
    v = sl.from_pairs(6, [4, 1, 1, 3], np.asarray([1, 2, 3, 4], dtype=dtype))
    assert v.nnz == 3  # dedup summed 1+1
    dense = np.zeros(6, dtype=dtype)
    np.add.at(dense, [4, 1, 1, 3], np.asarray([1, 2, 3, 4], dtype=dtype))
    np.testing.assert_array_equal(np.asarray(v.todense()), dense)

    w = sl.from_pairs(6, [0, 1], np.asarray([10, 20], dtype=dtype))
    np.testing.assert_array_equal(
        np.asarray((v + w).todense()), dense + np.asarray(w.todense())
    )
    np.testing.assert_array_equal(
        np.asarray((v - w).todense()), dense - np.asarray(w.todense())
    )
    # reference (*) fold semantics: union pattern, A-only slots keep a
    prod = v * w
    expect = dense.copy()
    wd = np.asarray(w.todense())
    mask_w = np.zeros(6, bool)
    mask_w[[0, 1]] = True
    expect[mask_w] = expect[mask_w] * wd[mask_w]
    np.testing.assert_array_equal(np.asarray(prod.todense()), expect)


def test_sparse_vector_concat_direct_sum(dtype):
    from sparse_linear_tpu.formats.sparse_vector import concat

    a = sl.from_pairs(3, [0, 2], np.asarray([1, 2], dtype=dtype))
    b = sl.from_pairs(4, [1], np.asarray([5], dtype=dtype))
    c = concat(a, b)
    assert c.length == 7
    np.testing.assert_array_equal(
        np.asarray(c.todense()),
        np.concatenate([np.asarray(a.todense()), np.asarray(b.todense())]),
    )


def test_vector_out_of_bounds_errors():
    with pytest.raises(ValueError, match="position 0"):
        sl.from_pairs(2, [5], [1.0])


def test_invariant_checker_catches_violations():
    bad = sl.CSR(
        indptr=jnp.asarray([0, 2, 1], jnp.int32),
        indices=jnp.asarray([0, 1], jnp.int32),
        data=jnp.asarray([1.0, 2.0]),
        shape=(2, 2),
    )
    with pytest.raises(sl.InvariantError, match="decreases"):
        sl.check_matrix(bad)
    bad2 = sl.CSR(
        indptr=jnp.asarray([0, 2], jnp.int32),
        indices=jnp.asarray([1, 1], jnp.int32),
        data=jnp.asarray([1.0, 2.0]),
        shape=(1, 2),
    )
    with pytest.raises(sl.InvariantError, match="strictly increasing"):
        sl.check_matrix(bad2)
    bad3 = sl.CSR(
        indptr=jnp.asarray([0, 1], jnp.int32),
        indices=jnp.asarray([5], jnp.int32),
        data=jnp.asarray([1.0]),
        shape=(1, 2),
    )
    with pytest.raises(sl.InvariantError, match="out of bounds"):
        sl.check_matrix(bad3)


def test_matrix_pytree_flattens():
    m = sl.eye(4, dtype=jnp.float64)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert m2.shape == m.shape
    np.testing.assert_array_equal(np.asarray(m2.todense()), np.eye(4))


def test_parity_methods(rng, dtype):
    from tests.conftest import random_coo

    rows, cols, vals = random_coo(rng, 5, 5, dtype)
    m = sl.from_triples((5, 5), rows, cols, vals).tocsr()
    np.testing.assert_allclose(
        np.asarray(abs(m).todense()), np.abs(np.asarray(m.todense())), atol=0
    )
    # signum of stored entries only
    d = np.asarray(m.todense())
    np.testing.assert_allclose(
        np.asarray(m.signum().todense()), np.sign(d), atol=0
    )
    np.testing.assert_allclose(
        complex(m.sum_values()), complex(d.sum()), atol=1e-12
    )
    total = m.reduce_values(lambda a, b: a + b, 0.0)
    np.testing.assert_allclose(complex(total), complex(d.sum()), atol=1e-12)
    # hermitian predicate
    h = (m + m.ctrans().tocsr()).tocsr()
    assert h.is_hermitian(tol=1e-12)
    assert not sl.from_triples((2, 2), [0], [1], [1.0]).tocsr().is_hermitian()
