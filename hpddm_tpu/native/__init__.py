"""ctypes bridge to the native host-runtime (csrtools.cpp).

Auto-builds the shared library with `make` on first import (cached); falls
back to `lib = None` if no toolchain is available — callers keep a pure
numpy path. This mirrors the reference's split: compiled host machinery
below a scripting front-end (interface/hpddm_python.cpp + hpddm.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhpddmtpu_native.so")

lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_DIR, "csrtools.cpp")):
        if not _build():
            return None
    try:
        L = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    L.ell_pack.argtypes = [ctypes.c_int64, i64p, i32p, f64p,
                           ctypes.c_int64, f64p, i32p]
    L.dia_pack.argtypes = [ctypes.c_int64, i64p, i32p, f64p, i32p, f64p]
    L.uf_resolve.argtypes = [ctypes.c_int64, i64p, ctypes.c_int64,
                             i64p, i64p]
    L.overlap_grow.argtypes = [ctypes.c_int64, i64p, i32p, i32p,
                               ctypes.c_int32]
    L.parse_coo.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                            ctypes.c_int64, i64p, i64p, f64p]
    L.parse_coo.restype = ctypes.c_int64
    return L


lib = _load()


def ell_pack(csr, n_max: int, width: int):
    """CSR -> padded (n_max, width) ELL arrays via the native kernel."""
    n = csr.shape[0]
    values = np.zeros((n_max, width), dtype=np.float64)
    cols = np.zeros((n_max, width), dtype=np.int32)
    if lib is not None and csr.dtype == np.float64:
        lib.ell_pack(n, csr.indptr.astype(np.int64),
                     csr.indices.astype(np.int32), csr.data,
                     width, values, cols)
    else:
        for i in range(n):
            lo, hi = csr.indptr[i], csr.indptr[i + 1]
            values[i, : hi - lo] = csr.data[lo:hi]
            cols[i, : hi - lo] = csr.indices[lo:hi]
    return values, cols


def uf_resolve(n: int, pairs_a: np.ndarray, pairs_b: np.ndarray) -> np.ndarray:
    """Resolved union-find roots for n slots with given pair links."""
    parent = np.arange(n, dtype=np.int64)
    pa = np.ascontiguousarray(pairs_a, dtype=np.int64)
    pb = np.ascontiguousarray(pairs_b, dtype=np.int64)
    if lib is not None:
        lib.uf_resolve(n, parent, len(pa), pa, pb)
        return parent
    # numpy/python fallback
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(pa, pb):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for i in range(n):
        parent[i] = find(i)
    return parent
