"""ctypes bindings for the native C++ host kernels (csrc/naqs_host.cpp).

Auto-builds the shared library with g++ on first use (cached in build/);
every entry point has a pure-numpy fallback so the framework works without
a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "csrc", "naqs_host.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "build")
_LIB = os.path.join(_LIB_DIR, "libnaqs_host.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")


def build_native(force: bool = False) -> Optional[str]:
    """Compile csrc/naqs_host.cpp -> build/libnaqs_host.so. Returns path or None."""
    if os.path.exists(_LIB) and not force:
        if not os.path.exists(_SRC) or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    if not os.path.exists(_SRC):
        return None
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.SubprocessError, FileNotFoundError):
        return None
    return _LIB


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)

    lib.naqs_enumerate_combinations.restype = ctypes.c_int64
    lib.naqs_enumerate_combinations.argtypes = [
        ctypes.c_int32, ctypes.c_int32, _u64p, _u64p, ctypes.c_int64,
    ]
    lib.naqs_popcount_parity.restype = None
    lib.naqs_popcount_parity.argtypes = [
        _u64p, ctypes.c_int64, ctypes.c_uint64, _i8p,
    ]
    lib.naqs_assemble_h.restype = ctypes.c_int64
    lib.naqs_assemble_h.argtypes = [
        _u64p, ctypes.c_int64,
        _u64p, _i64p, ctypes.c_int64,
        _u64p, _f64p,
        _u64p, _f64p, ctypes.c_int64,
        _i64p, _i64p, _f64p, ctypes.c_int64,
    ]
    lib.naqs_assemble_h_rows.restype = ctypes.c_int64
    lib.naqs_assemble_h_rows.argtypes = [
        _u64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        _u64p, _i64p, ctypes.c_int64,
        _u64p, _f64p,
        _u64p, _f64p, ctypes.c_int64,
        _i64p, _i64p, _f64p, ctypes.c_int64,
    ]
    lib.naqs_local_energy.restype = None
    lib.naqs_local_energy.argtypes = [
        _u64p, ctypes.c_int64,
        _f64p, _f64p,
        _u64p, _i64p, ctypes.c_int64,
        _u64p, _f64p,
        _u64p, _f64p, ctypes.c_int64,
        _f64p, _f64p,
    ]
    lib.naqs_csr_matvec_complex.restype = None
    lib.naqs_csr_matvec_complex.argtypes = [
        _i64p, _i64p, _f64p, ctypes.c_int64, _f64p, _f64p, _f64p, _f64p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ----------------------------------------------------------------- wrappers

def _grouped_terms(terms) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Sort off-diagonal terms by xy group; return (xy_unique, off, yz, coeff)."""
    order = np.argsort(terms.gxy, kind="stable")
    gxy = terms.gxy[order]
    yz = np.ascontiguousarray(terms.yz[order], dtype=np.uint64)
    coeff = np.ascontiguousarray(terms.coeff[order], dtype=np.float64)
    n_groups = len(terms.xy_unique)
    off = np.zeros(n_groups + 1, dtype=np.int64)
    np.add.at(off, gxy + 1, 1)
    off = np.cumsum(off).astype(np.int64)
    return np.ascontiguousarray(terms.xy_unique, dtype=np.uint64), off, yz, coeff


def enumerate_combinations(s: int, n: int, weights: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    from math import comb

    cap = comb(s, n) if 0 <= n <= s else 0
    out = np.empty(max(cap, 1), dtype=np.uint64)
    cnt = lib.naqs_enumerate_combinations(
        s, n, np.ascontiguousarray(weights, dtype=np.uint64), out, out.shape[0]
    )
    if cnt < 0:
        return None
    return out[:cnt]


def assemble_h_coo(terms, basis: np.ndarray, row0: int = 0,
                   row1: Optional[int] = None):
    """COO (rows, cols, vals) of H rows [row0, row1) over a sorted basis
    (columns search the full basis), or None w/o native lib. The COO
    capacity is allocated for the worst case of the ROW RANGE only, so
    callers can assemble arbitrarily large bases in bounded memory."""
    lib = get_lib()
    if lib is None:
        return None
    basis = np.ascontiguousarray(basis, dtype=np.uint64)
    xy_u, off, yz, coeff = _grouped_terms(terms)
    dyz = np.ascontiguousarray(terms.diag_yz, dtype=np.uint64)
    dco = np.ascontiguousarray(terms.diag_coeff, dtype=np.float64)
    n = len(basis)
    row1 = n if row1 is None else int(row1)
    cap = max(row1 - row0, 0) * (len(xy_u) + 1)
    rows = np.empty(max(cap, 1), dtype=np.int64)
    cols = np.empty(max(cap, 1), dtype=np.int64)
    vals = np.empty(max(cap, 1), dtype=np.float64)
    nnz = lib.naqs_assemble_h_rows(
        basis, n, int(row0), row1, xy_u, off, len(xy_u), yz, coeff,
        dyz, dco, len(dyz), rows, cols, vals, cap,
    )
    if nnz < 0:
        return None
    return rows[:nnz], cols[:nnz], vals[:nnz]


def local_energy_host(terms, states: np.ndarray, psi: np.ndarray):
    """Native E_loc over a sorted sample set; None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    states = np.ascontiguousarray(states, dtype=np.uint64)
    xy_u, off, yz, coeff = _grouped_terms(terms)
    dyz = np.ascontiguousarray(terms.diag_yz, dtype=np.uint64)
    dco = np.ascontiguousarray(terms.diag_coeff, dtype=np.float64)
    n = len(states)
    e_re = np.empty(n, dtype=np.float64)
    e_im = np.empty(n, dtype=np.float64)
    lib.naqs_local_energy(
        states, n,
        np.ascontiguousarray(psi.real, dtype=np.float64),
        np.ascontiguousarray(psi.imag, dtype=np.float64),
        xy_u, off, len(xy_u), yz, coeff, dyz, dco, len(dyz),
        e_re, e_im,
    )
    return e_re + 1j * e_im


def csr_matvec_complex(H, x: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(H.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(H.indices, dtype=np.int64)
    data = np.ascontiguousarray(H.data, dtype=np.float64)
    n = H.shape[0]
    y_re = np.empty(n, dtype=np.float64)
    y_im = np.empty(n, dtype=np.float64)
    lib.naqs_csr_matvec_complex(
        indptr, indices, data, n,
        np.ascontiguousarray(x.real, dtype=np.float64),
        np.ascontiguousarray(x.imag, dtype=np.float64),
        y_re, y_im,
    )
    return y_re + 1j * y_im
