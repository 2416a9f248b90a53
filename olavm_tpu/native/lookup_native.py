"""ctypes loader for the exact permuted-columns kernel (gl_lookup.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "gl_lookup.cpp")
_LIB = os.path.join(_HERE, "libgl_lookup.so")

available = False
_lib = None


def _load():
    global _lib, available
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_LIB)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.permuted_cols.argtypes = [u64p, u64p, ctypes.c_uint64, u64p, u64p]
    lib.permuted_cols.restype = ctypes.c_int
    _lib = lib
    available = True


try:
    _load()
except Exception as _e:  # pragma: no cover
    import warnings

    warnings.warn(f"native gl_lookup unavailable, using python path: {_e}")


def permuted_cols(inputs: np.ndarray, table: np.ndarray):
    n = len(inputs)
    inputs = np.ascontiguousarray(inputs, dtype=np.uint64)
    table = np.ascontiguousarray(table, dtype=np.uint64)
    si = np.empty(n, dtype=np.uint64)
    pt = np.empty(n, dtype=np.uint64)
    rc = _lib.permuted_cols(
        inputs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n,
        si.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        pt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    if rc != 0:
        raise ValueError("permuted_cols: unused inds/vals mismatch")
    return si, pt
