"""Structured formats (DIA/ELL/BSR), grid generators, and fast SpMV paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sparse_linear_tpu as sl
from sparse_linear_tpu.formats.structured import csr_to_bsr, csr_to_dia, csr_to_ell
from sparse_linear_tpu.utils.grids import laplacian_1d, poisson_2d, poisson_3d
from tests.conftest import random_coo


def dense(m):
    return np.asarray(m.todense())


def rand_csr(rng, nr, nc, dtype=np.float64):
    rows, cols, vals = random_coo(rng, nr, nc, dtype)
    return sl.from_triples((nr, nc), rows, cols, vals).tocsr()


# ----------------------------------------------------------------- generators


def test_laplacian_1d_structure():
    a = laplacian_1d(6, dtype=np.float64)
    sl.check_matrix(a)
    d = dense(a)
    expect = 2 * np.eye(6) - np.eye(6, k=1) - np.eye(6, k=-1)
    np.testing.assert_array_equal(d, expect)


def test_poisson_2d_vs_kron():
    nx = 5
    t = laplacian_1d(nx, dtype=np.float64)
    i = sl.eye(nx, dtype=jnp.float64)
    ref = (sl.kron(t, i) + sl.kron(i, t)).tocsr()
    a = poisson_2d(nx, dtype=np.float64)
    np.testing.assert_allclose(dense(a), dense(ref), atol=0)


def test_poisson_3d_row_sums():
    a = poisson_3d(3, dtype=np.float64)
    d = dense(a)
    np.testing.assert_array_equal(d, d.T)
    assert d.shape == (27, 27)
    # interior node has row sum 0; corner nodes 6-3=3
    assert d.sum(axis=1).min() == 0
    assert d[0].sum() == 3


# ------------------------------------------------------------------- formats


@pytest.mark.parametrize("gen", [laplacian_1d, poisson_2d])
def test_dia_roundtrip_and_spmv(gen, rng):
    a = gen(7, dtype=np.float64)
    dia = csr_to_dia(a)
    np.testing.assert_array_equal(dense(dia), dense(a))
    x = rng.standard_normal(dia.shape[1])
    np.testing.assert_allclose(np.asarray(dia @ x), dense(a) @ x, atol=1e-12)


def test_dia_rectangular(rng):
    m = rand_csr(rng, 5, 8)
    dia = csr_to_dia(m)
    np.testing.assert_allclose(dense(dia), dense(m), atol=0)
    x = rng.standard_normal(8)
    np.testing.assert_allclose(np.asarray(dia @ x), dense(m) @ x, atol=1e-12)


def test_ell_roundtrip_and_spmv(rng):
    m = rand_csr(rng, 9, 6)
    ell = csr_to_ell(m)
    np.testing.assert_allclose(dense(ell), dense(m), atol=0)
    x = rng.standard_normal(6)
    np.testing.assert_allclose(np.asarray(ell @ x), dense(m) @ x, atol=1e-12)
    with pytest.raises(ValueError, match="exceeds width"):
        csr_to_ell(m, width=1)


def test_bsr_roundtrip_and_spmv(rng):
    a = poisson_2d(4, dtype=np.float64)  # 16x16
    bsr = csr_to_bsr(a, block_shape=(4, 4))
    np.testing.assert_allclose(dense(bsr), dense(a), atol=0)
    x = rng.standard_normal(16)
    np.testing.assert_allclose(np.asarray(bsr @ x), dense(a) @ x, atol=1e-12)
    b = rng.standard_normal((16, 3))
    np.testing.assert_allclose(np.asarray(bsr @ b), dense(a) @ b, atol=1e-12)
    with pytest.raises(ValueError, match="not divisible"):
        csr_to_bsr(a, block_shape=(5, 4))


def test_structured_spmv_under_jit(rng):
    a = poisson_2d(6, dtype=np.float32)
    dia = csr_to_dia(a)
    x = rng.standard_normal(36).astype(np.float32)

    @jax.jit
    def f(d, x):
        return d @ x

    np.testing.assert_allclose(
        np.asarray(f(dia, x)), dense(a) @ x, rtol=1e-5
    )


def test_dia_spmv_large_agreement(rng):
    # larger stencil problem: DIA vs CSR-segment-sum paths agree
    a_csr = poisson_2d(32, dtype=np.float64)
    a_dia = poisson_2d(32, dtype=np.float64, fmt="dia")
    x = rng.standard_normal(32 * 32)
    np.testing.assert_allclose(
        np.asarray(a_dia @ x), np.asarray(a_csr @ x), atol=1e-12
    )


def test_dia_spmv_pallas_interpret(rng):
    """Pallas DIA kernel vs reference path, interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.kernels.spmv import dia_spmv
    from sparse_linear_tpu.kernels.spmv_pallas import dia_spmv_pallas

    for g in [16, 40]:
        a = poisson_2d(g, dtype=np.float32, fmt="dia")
        x = jnp.asarray(rng.standard_normal(g * g), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            y = dia_spmv_pallas(a, x, tile=1024)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(dia_spmv(a, x)), atol=1e-4
        )


def test_dia_spmv_pallas_blocked_interpret(rng):
    """Blocked-halo VMEM kernel (square 1024-aligned shapes) vs reference."""
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.kernels.spmv import dia_spmv
    from sparse_linear_tpu.kernels import spmv_pallas

    # poisson_2d(32): n=1024 -> blocked path; offsets {-32,-1,0,1,32}
    a = poisson_2d(32, dtype=np.float32, fmt="dia")
    x = jnp.asarray(rng.standard_normal(1024), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = spmv_pallas._dia_spmv_blocked(a, x, alpha=None)
        y2 = spmv_pallas._dia_spmv_blocked(a, x, alpha=0.25)
    yref = np.asarray(dia_spmv(a, x))
    np.testing.assert_allclose(np.asarray(y), yref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y2), 0.25 * yref, atol=1e-4)
    # dispatcher picks the blocked path for this shape
    with pltpu.force_tpu_interpret_mode():
        y3 = spmv_pallas.dia_spmv_pallas(a, x)
    np.testing.assert_allclose(np.asarray(y3), yref, atol=1e-4)


def test_dia_spmv_pallas_blocked_wide_offsets(rng):
    """Offsets spanning multiple 128-lane rows and negative q paths."""
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.formats.structured import csr_to_dia
    from sparse_linear_tpu.kernels.spmv import dia_spmv
    from sparse_linear_tpu.kernels import spmv_pallas

    n = 1024
    offs = [-300, -128, -5, 0, 7, 129, 515]
    d = np.zeros((n, n), np.float32)
    rng_v = rng.standard_normal
    for o in offs:
        v = rng_v(n - abs(o)).astype(np.float32)
        d += np.diag(v, k=o)
    a = csr_to_dia(sl.from_dense(d))
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = spmv_pallas._dia_spmv_blocked(a, x, alpha=None)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(dia_spmv(a, x)), atol=1e-3
    )


def test_format_selection(rng):
    from sparse_linear_tpu.formats.select import recommend_format, to_fast_format
    from sparse_linear_tpu.formats.structured import DIA, ELL

    a = poisson_2d(8, dtype=np.float64)
    assert recommend_format(a) == "dia"
    fast = to_fast_format(a)
    assert isinstance(fast, DIA)
    x = rng.standard_normal(64)
    np.testing.assert_allclose(np.asarray(fast @ x),
                               np.asarray(a.todense()) @ x, atol=1e-12)
    # scattered real pattern -> WELL (the TPU unstructured fast path);
    # complex data falls back to ELL/BSR (WELL stores real planes)
    m = (rng.random((24, 24)) < 0.2) | np.eye(24, dtype=bool)
    b = sl.from_dense(m.astype(np.float64))
    kind = recommend_format(b, max_diags=8)
    assert kind == "well"
    bc = sl.from_dense(m.astype(np.complex128))
    assert recommend_format(bc, max_diags=8) == "well"
    fastb = to_fast_format(b, max_diags=8)
    xb = rng.standard_normal(24)
    np.testing.assert_allclose(np.asarray(fastb @ xb),
                               np.asarray(b.todense()) @ xb, atol=1e-12)


def test_pallas_fused_alpha(rng):
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.kernels.spmv import dia_spmv
    from sparse_linear_tpu.kernels.spmv_pallas import dia_spmv_pallas

    a = poisson_2d(16, dtype=np.float32, fmt="dia")
    x = jnp.asarray(rng.standard_normal(256), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = dia_spmv_pallas(a, x, tile=1024, alpha=0.5)
    np.testing.assert_allclose(
        np.asarray(y), 0.5 * np.asarray(dia_spmv(a, x)), atol=1e-4
    )


def test_dia_spmv_chain_matches_repeated(rng):
    """(alpha A)^k x in ONE kernel launch (VMEM-resident chain) must match
    k separate SpMV applications."""
    import numpy as np

    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.kernels import spmv_pallas
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 32  # 1024 dof: square, 1024-aligned
    a = poisson_2d(g, dtype=np.float32, fmt="dia")
    x = rng.standard_normal(g * g).astype(np.float32)
    alpha = 0.37
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(spmv_pallas.dia_spmv_chain(a, jnp.asarray(x), k=3,
                                                  alpha=alpha))
        ref = jnp.asarray(x)
        for _ in range(3):
            ref = spmv_pallas.dia_spmv_pallas(a, ref, alpha=alpha)
    ref = np.asarray(ref).reshape(-1)
    assert np.allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_dia_spmv_chain_k1_and_errors(rng):
    import numpy as np

    import jax.numpy as jnp
    import pytest
    from jax.experimental.pallas import tpu as pltpu

    from sparse_linear_tpu.kernels import spmv_pallas
    from sparse_linear_tpu.utils.grids import poisson_2d

    g = 32
    a = poisson_2d(g, dtype=np.float32, fmt="dia")
    x = rng.standard_normal(g * g).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        y1 = np.asarray(spmv_pallas.dia_spmv_chain(a, jnp.asarray(x), k=1))
        ref = np.asarray(spmv_pallas.dia_spmv_pallas(a, jnp.asarray(x)))
    assert np.allclose(y1, ref.reshape(-1), rtol=1e-6)
    with pytest.raises(ValueError):
        spmv_pallas.dia_spmv_chain(a, jnp.asarray(x), k=0)


def test_pad_dia_inert():
    """pad_dia: zero rows/cols to a multiple — results on the original
    range identical, padded range stays zero through a chain."""
    import jax.numpy as jnp

    from sparse_linear_tpu.formats.structured import csr_to_dia, pad_dia
    from sparse_linear_tpu.kernels.spmv import dia_spmv
    from sparse_linear_tpu.utils.grids import poisson_2d

    a = poisson_2d(9, dtype=np.float64)  # n = 81, off-multiple
    d = csr_to_dia(a.tocsr())
    dp = pad_dia(d, multiple=64)
    assert dp.shape == (128, 128)
    x = np.random.default_rng(0).standard_normal(81)
    xp = jnp.zeros((128,)).at[:81].set(x)
    y = np.asarray(dia_spmv(d, jnp.asarray(x)))
    yp = np.asarray(dia_spmv(dp, xp))
    np.testing.assert_allclose(yp[:81], y, rtol=1e-13, atol=1e-13)
    assert np.all(yp[81:] == 0)
    # chain: feed back, pad range must stay inert
    y2 = np.asarray(dia_spmv(dp, dia_spmv(dp, xp)))
    ref2 = np.asarray(dia_spmv(d, dia_spmv(d, jnp.asarray(x))))
    np.testing.assert_allclose(y2[:81], ref2, rtol=1e-12, atol=1e-12)
    assert np.all(y2[81:] == 0)
    # already aligned: no-op
    assert pad_dia(dp, multiple=64) is dp
