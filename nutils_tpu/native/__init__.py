'''Native (C++) runtime components, built on demand and loaded via ctypes.

The compute path is jax/XLA; these are the host-runtime pieces that the
reference implements in its compiled backends: currently the sparse-pattern
builder (sort/dedup/CSR of assembly index streams).  Falls back silently to
the numpy implementations if no C++ toolchain is available.
'''

import ctypes
import os
import subprocess
import threading

import numpy

_dir = os.path.dirname(__file__)
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    src = os.path.join(_dir, 'pattern.cpp')
    out = os.path.join(_dir, 'libpattern.so')
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
        subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-o', out, src, '-lpthread'],
                       check=True, capture_output=True)
    return out


def get():
    '''The loaded native library, or None if unavailable.'''
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            lib = ctypes.CDLL(_build())
            i64 = ctypes.POINTER(ctypes.c_int64)
            i32 = ctypes.POINTER(ctypes.c_int32)
            lib.pattern_argsort.argtypes = [i64, i64, ctypes.c_int64, ctypes.c_int64, i64]
            lib.pattern_argsort.restype = None
            lib.pattern_argsort32.argtypes = [i32, i32, ctypes.c_int64, ctypes.c_int64, i64]
            lib.pattern_argsort32.restype = None
            lib.pattern_dedup.argtypes = [i64, i64, ctypes.c_int64, i64, i64, i64, i64]
            lib.pattern_dedup.restype = ctypes.c_int64
            lib.pattern_dedup32.argtypes = [i32, i32, ctypes.c_int64, i64, i64, i64, i64]
            lib.pattern_dedup32.restype = ctypes.c_int64
            lib.pattern_indptr.argtypes = [i64, ctypes.c_int64, ctypes.c_int64, i64]
            lib.pattern_indptr.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _p32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_pattern(rows, cols, shape):
    '''(indptr, indices, slot, urows, nnz) via the native builder, or None.
    int32 entry streams (the solver's planning dtype) stay int32 — no
    conversion pass over the 10M-entry assembly streams.'''
    lib = get()
    if lib is None:
        return None
    if rows.dtype == numpy.int32 and cols.dtype == numpy.int32:
        rows = numpy.ascontiguousarray(rows)
        cols = numpy.ascontiguousarray(cols)
        argsort, dedup, rp = lib.pattern_argsort32, lib.pattern_dedup32, _p32
    else:
        rows = numpy.ascontiguousarray(rows, dtype=numpy.int64)
        cols = numpy.ascontiguousarray(cols, dtype=numpy.int64)
        argsort, dedup, rp = lib.pattern_argsort, lib.pattern_dedup, _p
    n = rows.size
    order = numpy.empty(n, dtype=numpy.int64)
    argsort(rp(rows), rp(cols), n, int(shape[1]), _p(order))
    slot = numpy.empty(n, dtype=numpy.int64)
    urows = numpy.empty(n, dtype=numpy.int64)
    ucols = numpy.empty(n, dtype=numpy.int64)
    nnz = dedup(rp(rows), rp(cols), n, _p(order), _p(slot), _p(urows), _p(ucols))
    indptr = numpy.empty(shape[0] + 1, dtype=numpy.int64)
    lib.pattern_indptr(_p(urows), nnz, int(shape[0]), _p(indptr))
    return indptr, ucols[:nnz], slot, urows[:nnz], int(nnz)


_polylib = [None, False]


def _get_poly():
    with _lock:
        if _polylib[1]:
            return _polylib[0]
        _polylib[1] = True
        try:
            src = os.path.join(_dir, 'poly.cpp')
            out = os.path.join(_dir, 'libpoly.so')
            if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(src):
                subprocess.run(['g++', '-O3', '-shared', '-fPIC', '-o', out, src],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(out)
            dp = ctypes.POINTER(ctypes.c_double)
            lib.poly_mul.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_int, dp]
            lib.poly_mul.restype = None
            lib.poly_change_degree.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, dp]
            lib.poly_change_degree.restype = None
            lib.poly_compose_affine.argtypes = [dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, dp, dp, dp]
            lib.poly_compose_affine.restype = ctypes.c_double
            _polylib[0] = lib
        except Exception:
            _polylib[0] = None
        return _polylib[0]


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def poly_mul(a, b):
    '''Tensor power-basis product of two (K,)*d coefficient arrays, or None.'''
    lib = _get_poly()
    if lib is None:
        return None
    a = numpy.ascontiguousarray(a, dtype=numpy.float64)
    b = numpy.ascontiguousarray(b, dtype=numpy.float64)
    d = a.ndim
    K = a.shape[0]
    out = numpy.zeros((2 * K - 1,) * d)
    lib.poly_mul(_dptr(a), _dptr(b), K, d, _dptr(out))
    return out


def poly_change_degree(a, Kb):
    lib = _get_poly()
    if lib is None:
        return None
    a = numpy.ascontiguousarray(a, dtype=numpy.float64)
    d = a.ndim
    out = numpy.empty((Kb,) * d)
    lib.poly_change_degree(_dptr(a), a.shape[0], Kb, d, _dptr(out))
    return out


def poly_compose_affine(coeffs, lin, off):
    '''Coefficients of p(lin @ y + off) for a [L, (K,)*d] batch, or None.
    Asserts that truncated coefficients vanish.'''
    lib = _get_poly()
    if lib is None:
        return None
    coeffs = numpy.ascontiguousarray(coeffs, dtype=numpy.float64)
    d = lin.shape[0]
    K = coeffs.shape[-1]
    lead = coeffs.shape[:-d]
    flat = coeffs.reshape((-1,) + (K,) * d)
    lin = numpy.ascontiguousarray(lin, dtype=numpy.float64)
    off = numpy.ascontiguousarray(off, dtype=numpy.float64)
    out = numpy.empty_like(flat)
    drop = lib.poly_compose_affine(_dptr(flat), flat.shape[0], K, d, _dptr(lin), _dptr(off), _dptr(out))
    assert drop < 1e-9, 'affine substitution overflowed the coefficient box'
    return out.reshape(lead + (K,) * d)
