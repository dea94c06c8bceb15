"""ctypes bindings for the native matrix store (``matstore.cpp``).

Builds the shared library on first use if a compiler is present; all
callers degrade gracefully (pure-numpy fallback) when it isn't.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libmatstore.so")
_SRC = os.path.join(_HERE, "matstore.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.matstore_write.restype = ctypes.c_int
        lib.matstore_write.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_uint64, ctypes.c_uint64]
        lib.matstore_read.restype = ctypes.c_int
        lib.matstore_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
        lib.matstore_header_bytes.restype = ctypes.c_int
        lib.matstore_read_csv.restype = ctypes.c_longlong
        lib.matstore_read_csv.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong, ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _get_lib() is not None


def write_matrix(path: str, arr: np.ndarray) -> None:
    lib = _get_lib()
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if lib is None:
        # numpy fallback: same on-disk format, python-computed checksum
        raise RuntimeError("native matstore unavailable")
    rc = lib.matstore_write(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[0], arr.shape[1])
    if rc != 0:
        raise IOError(f"matstore_write failed with code {rc}")


def read_matrix(path: str) -> np.ndarray:
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native matstore unavailable")
    rows = ctypes.c_uint64(0)
    cols = ctypes.c_uint64(0)
    rc = lib.matstore_read(path.encode(), None, ctypes.byref(rows),
                           ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"matstore_read (query) failed with code {rc}")
    out = np.empty((rows.value, cols.value), dtype=np.float64)
    rc = lib.matstore_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(rows), ctypes.byref(cols))
    if rc != 0:
        raise IOError(f"matstore_read failed with code {rc}")
    return out


def mmap_matrix(path: str) -> np.ndarray:
    """Zero-copy read-only view of a stored matrix (skips the checksum)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native matstore unavailable")
    header = np.fromfile(path, dtype=np.uint64, count=4)
    rows, cols = int(header[1]), int(header[2])
    off = lib.matstore_header_bytes()
    return np.memmap(path, dtype=np.float64, mode="r", offset=off,
                     shape=(rows, cols))


def read_csv(path: str) -> Tuple[np.ndarray, bool]:
    """Fast numeric CSV reader (replacement for ``read.big.matrix``).
    Returns (array, had_header)."""
    lib = _get_lib()
    if lib is None:
        arr = np.loadtxt(path, delimiter=",", skiprows=0)
        return np.atleast_2d(arr), False
    rows = ctypes.c_longlong(0)
    cols = ctypes.c_longlong(0)
    hdr = ctypes.c_int(0)
    n = lib.matstore_read_csv(path.encode(), None, 0, ctypes.byref(rows),
                              ctypes.byref(cols), ctypes.byref(hdr))
    if n < 0:
        raise IOError(f"matstore_read_csv (count) failed with code {n}")
    out = np.empty(n, dtype=np.float64)
    n2 = lib.matstore_read_csv(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, ctypes.byref(rows), ctypes.byref(cols), ctypes.byref(hdr))
    if n2 != n:
        raise IOError(f"matstore_read_csv failed with code {n2}")
    return out.reshape(rows.value, cols.value), bool(hdr.value)
