"""ctypes bindings to the native C++ helpers (``native/mmio_ell.cpp``).

Native-path analogue of the reference's C I/O stack
(``tests/COMMON/mmio.c`` + ``ssrcsr.c``): fast MatrixMarket parse with
symmetry expansion and direct COO→ELL packing. Falls back silently to the
scipy path in :mod:`primme_tpu.io` when the shared library is not built
(``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(here, "native", "libprimme_tpu_native.so")
    if not os.path.exists(so):
        # try an in-tree build once (toolchain is available in dev images)
        try:
            import subprocess

            subprocess.run(["make", "-C", os.path.join(here, "native")],
                           capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.ptn_mtx_open.restype = ctypes.c_int64
    lib.ptn_mtx_open.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32)]
    lib.ptn_mtx_read.restype = None
    lib.ptn_mtx_read.argtypes = [ctypes.c_void_p] * 4
    lib.ptn_coo_to_ell.restype = ctypes.c_int64
    lib.ptn_coo_to_ell.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def read_mtx_coo(path: str):
    """Parse a .mtx via the native library. Returns
    ``(m, n, rows, cols, values)`` with symmetry already expanded, or
    ``None`` if the native library is unavailable or the format
    unsupported."""
    lib = _lib()
    if lib is None:
        return None
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    nnz = ctypes.c_int64()
    isc = ctypes.c_int32()
    ok = lib.ptn_mtx_open(path.encode(), ctypes.byref(m), ctypes.byref(n),
                          ctypes.byref(nnz), ctypes.byref(isc))
    if not ok:
        return None
    rows = np.empty(nnz.value, np.int64)
    cols = np.empty(nnz.value, np.int64)
    re = np.empty(nnz.value, np.float64)
    im = np.empty(nnz.value, np.float64) if isc.value else None
    lib.ptn_mtx_read(
        rows.ctypes.data_as(ctypes.c_void_p),
        cols.ctypes.data_as(ctypes.c_void_p),
        re.ctypes.data_as(ctypes.c_void_p),
        im.ctypes.data_as(ctypes.c_void_p) if im is not None else None)
    vals = re + 1j * im if im is not None else re
    return m.value, n.value, rows, cols, vals


def coo_to_ell(n_rows: int, rows: np.ndarray, cols: np.ndarray,
               vals: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Pack COO to padded ELL via the native library; None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols64 = np.ascontiguousarray(cols, np.int64)
    cplx = np.iscomplexobj(vals)
    re = np.ascontiguousarray(vals.real, np.float64)
    im = np.ascontiguousarray(vals.imag, np.float64) if cplx else None
    nnz = len(rows)
    w = lib.ptn_coo_to_ell(n_rows, nnz,
                           rows.ctypes.data_as(ctypes.c_void_p),
                           cols64.ctypes.data_as(ctypes.c_void_p),
                           re.ctypes.data_as(ctypes.c_void_p),
                           None, 0, None, None, None)
    if w < 0:
        raise ValueError("coo_to_ell: row index out of bounds")
    out_cols = np.zeros((n_rows, w), np.int32)
    out_re = np.zeros((n_rows, w), np.float64)
    out_im = np.zeros((n_rows, w), np.float64) if cplx else None
    lib.ptn_coo_to_ell(
        n_rows, nnz,
        rows.ctypes.data_as(ctypes.c_void_p),
        cols64.ctypes.data_as(ctypes.c_void_p),
        re.ctypes.data_as(ctypes.c_void_p),
        im.ctypes.data_as(ctypes.c_void_p) if im is not None else None,
        w,
        out_cols.ctypes.data_as(ctypes.c_void_p),
        out_re.ctypes.data_as(ctypes.c_void_p),
        out_im.ctypes.data_as(ctypes.c_void_p) if out_im is not None
        else None)
    out_vals = out_re + 1j * out_im if out_im is not None else out_re
    return out_cols, out_vals
