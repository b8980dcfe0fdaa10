"""Element-type layer: unified real/complex code paths.

TPU-native analog of the reference's ``Data.Complex.Enhanced`` module
(reference: sparse-linear/src/Data/Complex/Enhanced.hs:19-53), which provides
the ``RealOf``/``ComplexOf`` type families and the ``IsReal`` class
(``real``/``conj``/``mag``) so that every operation is written once for both
real and complex element types.

Here the same role is played by dtype-promotion helpers over jnp dtypes.
TPU hardware supports f32/f64 (f64 emulated) and complex64 natively but NOT
complex128; for double-precision complex work on TPU the solver layers use a
split-complex representation (pairs of f64 arrays) — see
:mod:`sparse_linear_tpu.solve.complex_embed`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "real_of",
    "complex_of",
    "is_complex",
    "conj",
    "mag",
    "real",
    "imag",
    "supported_dtypes",
    "index_dtype",
]

# Index dtype used across the library: int32 is the TPU-native integer width.
index_dtype = jnp.int32

_REAL_OF = {
    np.dtype(np.float32): np.dtype(np.float32),
    np.dtype(np.float64): np.dtype(np.float64),
    np.dtype(np.complex64): np.dtype(np.float32),
    np.dtype(np.complex128): np.dtype(np.float64),
}

_COMPLEX_OF = {
    np.dtype(np.float32): np.dtype(np.complex64),
    np.dtype(np.float64): np.dtype(np.complex128),
    np.dtype(np.complex64): np.dtype(np.complex64),
    np.dtype(np.complex128): np.dtype(np.complex128),
}


def supported_dtypes():
    """Element dtypes supported across the library."""
    return tuple(_REAL_OF.keys())


def real_of(dtype) -> np.dtype:
    """``RealOf`` type family: the real dtype underlying ``dtype``.

    Reference: Data/Complex/Enhanced.hs:19-21 (``type family RealOf``).
    """
    dtype = np.dtype(dtype)
    if dtype not in _REAL_OF:
        raise TypeError(f"unsupported element dtype: {dtype}")
    return _REAL_OF[dtype]


def complex_of(dtype) -> np.dtype:
    """``ComplexOf`` type family: the complex dtype containing ``dtype``.

    Reference: Data/Complex/Enhanced.hs:23-25.
    """
    dtype = np.dtype(dtype)
    if dtype not in _COMPLEX_OF:
        raise TypeError(f"unsupported element dtype: {dtype}")
    return _COMPLEX_OF[dtype]


def is_complex(dtype) -> bool:
    return np.issubdtype(np.dtype(dtype), np.complexfloating)


def conj(x):
    """Complex conjugate; identity on real arrays.

    Reference: ``IsReal.conj`` (Data/Complex/Enhanced.hs:27-31,38,48).
    """
    return jnp.conj(x) if is_complex(x.dtype) else x


def real(x):
    """Real part (``IsReal.real``, Data/Complex/Enhanced.hs:27-31)."""
    return jnp.real(x) if is_complex(x.dtype) else x


def imag(x):
    """Imaginary part (``IsImag.imag``, Data/Complex/Enhanced.hs:32-34)."""
    if is_complex(x.dtype):
        return jnp.imag(x)
    return jnp.zeros_like(x)


def mag(x):
    """Magnitude: |x| (``IsReal.mag``, Data/Complex/Enhanced.hs:27-31,37,47)."""
    return jnp.abs(x)
