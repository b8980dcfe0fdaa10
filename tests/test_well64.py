"""Double-float f64 WELL SpMV (kernels/spmv_well64).

The reference is Double-native (SPECIALIZE Double,
reference: sparse-linear/src/Data/Matrix/Sparse.hs:456-457); these tests
gate the paired-f32 TPU path against true-f64 products at ~1e-13 relative
— far past naive f32 (~1e-7) — on both structured and adversarial
unstructured patterns, plus the packing round-trip itself.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from sparse_linear_tpu.kernels.spmv_well64 import csr_to_well64, well_spmv64
from sparse_linear_tpu.utils.grids import poisson_2d


def _random_csr(nr, nc, density, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    m = sp.random(nr, nc, density=density, format="csr", random_state=rng,
                  data_rvs=lambda k: scale * rng.standard_normal(k))
    m.data[m.data == 0] = 1.0
    from sparse_linear_tpu.formats.matrix import CSR

    return CSR(indptr=jnp.asarray(m.indptr.astype(np.int32)),
               indices=jnp.asarray(m.indices.astype(np.int32)),
               data=jnp.asarray(m.data),
               shape=m.shape), m


def test_well64_poisson_accuracy():
    g = 48
    a = poisson_2d(g, dtype=np.float64)
    w = csr_to_well64(a)
    x = np.random.default_rng(0).standard_normal(g * g)
    y = np.asarray(well_spmv64(w, jnp.asarray(x)))
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape)
    ref = As @ x
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert y.dtype == np.float64
    assert rel < 1e-13


def test_well64_beats_f32_on_cancellation():
    """Values needing >24-bit mantissas: hi+lo must recover what a plain
    f32 packing loses."""
    n = 512
    rng = np.random.default_rng(1)
    d = 1.0 + rng.standard_normal(n) * 2.0 ** -30  # f32 rounds the tail away
    rows = np.arange(n, dtype=np.int32)
    from sparse_linear_tpu.formats.matrix import CSR

    a = CSR(indptr=jnp.asarray(np.arange(n + 1, dtype=np.int32)),
            indices=jnp.asarray(rows), data=jnp.asarray(d), shape=(n, n))
    w = csr_to_well64(a)
    x = rng.standard_normal(n)
    y = np.asarray(well_spmv64(w, jnp.asarray(x)))
    ref = d * x
    rel = np.abs(y - ref) / np.abs(ref)
    assert rel.max() < 1e-13
    # a plain f32 path cannot represent d at all
    f32_err = np.abs(d.astype(np.float32).astype(np.float64) - d) / d
    assert f32_err.max() > 1e-10


@pytest.mark.parametrize("density", [0.004, 0.02])
def test_well64_unstructured(density):
    # sizes bounded: the interpret-mode kernel unrolls c_max chunks, and
    # XLA:CPU compile time grows with the unroll
    a, As = _random_csr(800, 600, density, seed=7, scale=1e3)
    w = csr_to_well64(a)
    x = np.random.default_rng(3).standard_normal(600) * 1e-2
    y = np.asarray(well_spmv64(w, jnp.asarray(x)))
    ref = As @ x
    denom = max(np.linalg.norm(ref), 1e-300)
    assert np.linalg.norm(y - ref) / denom < 1e-12


def test_well64_rejects_complex_matrix():
    from sparse_linear_tpu.formats.matrix import CSR

    a = CSR(indptr=jnp.asarray(np.array([0, 1], np.int32)),
            indices=jnp.asarray(np.array([0], np.int32)),
            data=jnp.asarray(np.array([1 + 1j], np.complex128)),
            shape=(1, 1))
    with pytest.raises(TypeError):
        csr_to_well64(a)


def test_well64_complex_vector():
    g = 16
    a = poisson_2d(g, dtype=np.float64)
    w = csr_to_well64(a)
    x = (np.random.default_rng(5).standard_normal(g * g)
         + 1j * np.random.default_rng(6).standard_normal(g * g))
    y = np.asarray(well_spmv64(w, jnp.asarray(x)))
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape)
    ref = As @ x
    assert np.linalg.norm(y - ref) / np.linalg.norm(ref) < 1e-13


def test_well64_dimension_error():
    a = poisson_2d(8, dtype=np.float64)
    w = csr_to_well64(a)
    with pytest.raises(ValueError):
        well_spmv64(w, jnp.zeros(7))


def test_well_spmm64_planes_poisson():
    from sparse_linear_tpu.kernels.spmv_well64 import well_spmm64_planes

    g = 24
    a = poisson_2d(g, dtype=np.float64)
    w = csr_to_well64(a)
    m = 3
    X = np.random.default_rng(4).standard_normal((m, g * g))
    Y = np.asarray(well_spmm64_planes(w, jnp.asarray(X), vb=4, mt=4))
    As = sp.csr_matrix(
        (np.asarray(a.data), np.asarray(a.indices), np.asarray(a.indptr)),
        shape=a.shape)
    ref = (As @ X.T).T
    assert Y.shape == (m, g * g)
    assert np.linalg.norm(Y - ref) / np.linalg.norm(ref) < 1e-13


def test_well_spmm64_planes_unstructured():
    from sparse_linear_tpu.kernels.spmv_well64 import well_spmm64_planes

    a, As = _random_csr(300, 250, 0.012, seed=11, scale=1e3)
    w = csr_to_well64(a)
    X = np.random.default_rng(12).standard_normal((2, 250)) * 1e-2
    Y = np.asarray(well_spmm64_planes(w, jnp.asarray(X), vb=4, mt=2))
    ref = (As @ X.T).T
    assert np.linalg.norm(Y - ref) / max(np.linalg.norm(ref), 1e-300) < 1e-12


def test_well_spmm64_planes_shape_error():
    g = 8
    a = poisson_2d(g, dtype=np.float64)
    w = csr_to_well64(a)
    from sparse_linear_tpu.kernels.spmv_well64 import well_spmm64_planes

    with pytest.raises(ValueError):
        well_spmm64_planes(w, jnp.zeros((3, g * g + 1)))
