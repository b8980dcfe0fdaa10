"""Loader for the native C++ symbolic-analysis library.

Builds ``native/libslt_symbolic.so`` on demand with g++ (the toolchain is part
of the target image) and binds it through ctypes.  A pure-Python fallback
(``sparse_linear_tpu.solve.symbolic_py``) covers environments without a
compiler — same results, slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libslt_symbolic.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "symbolic.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


_ORD_SRC_PATH = os.path.join(_NATIVE_DIR, "ordering.cpp")
_WELL_SRC_PATH = os.path.join(_NATIVE_DIR, "wellpack.cpp")


def _build():
    srcs = [_SRC_PATH]
    for p in (_ORD_SRC_PATH, _WELL_SRC_PATH):
        if os.path.exists(p):
            srcs.append(p)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", *srcs, "-o", _SO_PATH],
        check=True,
        capture_output=True,
    )


def load():
    """Return the bound library, building it if needed; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            srcs = [p for p in (_SRC_PATH, _ORD_SRC_PATH, _WELL_SRC_PATH)
                    if os.path.exists(p)]
            if not os.path.exists(_SO_PATH) or any(
                os.path.getmtime(p) > os.path.getmtime(_SO_PATH)
                for p in srcs
            ):
                _build()
            lib = ctypes.CDLL(_SO_PATH)
        except (OSError, subprocess.CalledProcessError):
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.slt_analyze.restype = ctypes.c_void_p
        lib.slt_analyze.argtypes = [
            ctypes.c_int, i32p, i32p, ctypes.c_int, ctypes.c_double,
        ]
        lib.slt_sizes.restype = None
        lib.slt_sizes.argtypes = [ctypes.c_void_p, i64p]
        lib.slt_arrays.restype = None
        lib.slt_arrays.argtypes = [ctypes.c_void_p, i32p, i32p, i32p, i32p, i32p]
        lib.slt_free.restype = None
        lib.slt_free.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "slt_amd"):
            lib.slt_amd.restype = ctypes.c_int
            lib.slt_amd.argtypes = [ctypes.c_int, i64p, i32p, i32p]
        if hasattr(lib, "slt_nd"):
            lib.slt_nd.restype = ctypes.c_int
            lib.slt_nd.argtypes = [ctypes.c_int, i64p, i32p, ctypes.c_int,
                                   i32p]
        if hasattr(lib, "slt_wellpack"):
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.slt_wellpack.restype = ctypes.c_void_p
            lib.slt_wellpack.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                i64p, i32p, f64p, ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.slt_wellpack_sizes.restype = None
            lib.slt_wellpack_sizes.argtypes = [ctypes.c_void_p, i64p]
            lib.slt_wellpack_fill.restype = None
            lib.slt_wellpack_fill.argtypes = [
                ctypes.c_void_p, i32p, i32p, f64p, ctypes.c_void_p,
            ]
            lib.slt_wellpack_free.restype = None
            lib.slt_wellpack_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_amd(n, indptr, indices):
    """Approximate-minimum-degree permutation from the native library, or
    None when unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "slt_amd"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    perm = np.zeros(int(n), dtype=np.int32)
    if lib.slt_amd(int(n), indptr, indices, perm):
        return None
    return perm


def native_nd(n, indptr, indices, leaf=64):
    """General-graph nested-dissection permutation from the native library
    (George-Liu level-set bisection, AMD-ordered leaves), or None when
    unavailable."""
    lib = load()
    if lib is None or not hasattr(lib, "slt_nd"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    perm = np.zeros(int(n), dtype=np.int32)
    if lib.slt_nd(int(n), indptr, indices, int(leaf), perm):
        return None
    return perm


def native_symbolic(n, indptr, indices, relax_small=16, relax_frac=0.25):
    """Run the native symbolic analysis.  Returns dict of numpy arrays or
    None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    h = lib.slt_analyze(int(n), indptr, indices, int(relax_small),
                        float(relax_frac))
    try:
        sizes = np.zeros(6, dtype=np.int64)
        lib.slt_sizes(h, sizes)
        nsuper, rows_total = int(sizes[0]), int(sizes[1])
        sup_start = np.zeros(nsuper + 1, dtype=np.int32)
        sup_parent = np.zeros(nsuper, dtype=np.int32)
        sup_level = np.zeros(nsuper, dtype=np.int32)
        rows_ptr = np.zeros(nsuper + 1, dtype=np.int32)
        rows = np.zeros(rows_total, dtype=np.int32)
        lib.slt_arrays(h, sup_start, sup_parent, sup_level, rows_ptr, rows)
        return {
            "nsuper": nsuper,
            "sup_start": sup_start,
            "sup_parent": sup_parent,
            "sup_level": sup_level,
            "rows_ptr": rows_ptr,
            "rows": rows,
            "lnnz": int(sizes[2]),
            "height": int(sizes[3]),
            "max_front": int(sizes[4]),
            "max_pivots": int(sizes[5]),
        }
    finally:
        lib.slt_free(h)


def native_wellpack(nr, nc, indptr, indices, vals, vals_im=None, cap=0):
    """Pack CSR arrays into WELL chunk planes with the native engine.

    Returns dict(bases, idx, vals[, vals_im]) or None when the native
    library is unavailable; raises ValueError when ``cap`` is exceeded."""
    lib = load()
    if lib is None or not hasattr(lib, "slt_wellpack"):
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    vals64 = np.ascontiguousarray(vals, dtype=np.float64)
    nnz = int(indices.size)
    im_arg = None
    if vals_im is not None:
        im_arg = np.ascontiguousarray(vals_im, dtype=np.float64)
    h = lib.slt_wellpack(
        int(nr), int(nc), nnz, indptr, indices, vals64,
        im_arg.ctypes.data if im_arg is not None else None,
        int(cap),
    )
    if not h:
        raise ValueError(
            f"wellpack: pattern needs more than c_max={cap} chunks/vreg"
        )
    try:
        sizes = np.zeros(2, dtype=np.int64)
        lib.slt_wellpack_sizes(h, sizes)
        nv, cm = int(sizes[0]), int(sizes[1])
        bases = np.zeros(nv * cm, dtype=np.int32)
        idx = np.zeros(nv * cm * 1024, dtype=np.int32)
        out_vals = np.zeros(nv * cm * 1024, dtype=np.float64)
        out_im = (np.zeros(nv * cm * 1024, dtype=np.float64)
                  if vals_im is not None else None)
        lib.slt_wellpack_fill(
            h, bases, idx, out_vals,
            out_im.ctypes.data if out_im is not None else None,
        )
        out = {
            "bases": bases.reshape(nv, cm),
            "idx": idx.reshape(nv, cm, 8, 128),
            "vals": out_vals.reshape(nv, cm, 8, 128),
        }
        if out_im is not None:
            out["vals_im"] = out_im.reshape(nv, cm, 8, 128)
        return out
    finally:
        lib.slt_wellpack_free(h)
