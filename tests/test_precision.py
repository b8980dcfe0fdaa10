"""dot64 — exact-f64 TPU matmul emulation (utils/precision.py).

On the CPU test mesh ``dot64`` passes through to native ``@``, so these
tests drive the split+chunked implementation (``_dot64_split``) directly;
it is backend-agnostic.  The long-contraction scan path (k > 128k) must
stay exact AND memory-bounded — it is what the 1M-dof streaming-FEAST Gram
runs through (an unbounded batched chunk product OOMed the chip there).
"""

import numpy as np

import jax.numpy as jnp

from sparse_linear_tpu.utils.precision import _CHUNK, _SUPER, _dot64_split


def _check(m, k, n, seed):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, k))
    b = rng.standard_normal((k, n))
    ref = a @ b
    out = np.asarray(_dot64_split(jnp.asarray(a), jnp.asarray(b)))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-13, (m, k, n, rel)


def test_dot64_short_contraction():
    _check(7, _CHUNK - 3, 5, 0)


def test_dot64_chunked_contraction():
    _check(9, 4 * _CHUNK + 17, 6, 1)


def test_dot64_super_chunk_scan():
    """k beyond _SUPER * _CHUNK takes the memory-bounded scan path; an
    unpadded and a padded (non-multiple) length both must be exact."""
    k_scan = _SUPER * _CHUNK  # exactly at the boundary: no scan
    _check(3, k_scan, 4, 2)
    _check(3, k_scan + 5 * _CHUNK + 11, 4, 3)  # scan + chunk/super padding


def test_dot64_tall_rows_scan():
    """m beyond 2 * _ROW_SEG takes the row-segmented small-k path."""
    from sparse_linear_tpu.utils.precision import _ROW_SEG

    _check(2 * _ROW_SEG + 77, 13, 3, 4)


def test_dot64_mismatch_raises():
    import pytest

    with pytest.raises(ValueError):
        _dot64_split(jnp.zeros((2, 3)), jnp.zeros((4, 2)))
