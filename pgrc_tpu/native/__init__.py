"""Native (C++) fast paths, loaded via ctypes.

The reference links vendored C coders directly (coders/rangecoder/*,
coders/lzma/*); we compile our own translation units into one shared object
at first use (g++ is in the image, pybind11 is not — hence ctypes). Every
native routine is bit-compatible with a pure-Python reference implementation
that remains the fallback when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libpgrc_native.so")
_SOURCES = [os.path.join(_HERE, "rangecoder.cpp"),
            os.path.join(_HERE, "pairwalk.cpp")]

_lock = threading.Lock()
_lib_handle = None
_lib_failed = False


def _build() -> bool:
    srcs_mtime = max(os.path.getmtime(s) for s in _SOURCES)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= srcs_mtime:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-o", _SO + ".tmp", *_SOURCES],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared object, or None when native is unavailable."""
    global _lib_handle, _lib_failed
    if _lib_handle is not None or _lib_failed:
        return _lib_handle
    with _lock:
        if _lib_handle is not None or _lib_failed:
            return _lib_handle
        if not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _lib_failed = True
            return None
        lib.rc_encode.restype = ctypes.c_int64
        lib.rc_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.rc_decode.restype = ctypes.c_int64
        lib.rc_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ]
        lib.pair_walk_decode.restype = ctypes.c_int32
        lib.pair_walk_decode.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib_handle = lib
    return _lib_handle


def rc_encode(data: bytes, order: int, period: int, nsym: int) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    cap = len(data) + len(data) // 8 + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.rc_encode(data, len(data), order, period, nsym, out, cap)
    if n < 0:
        return None
    return out.raw[:n]


def pair_walk_decode(offs):
    """offs: int64 numpy array of per-pair offsets -> int64 order array
    [2*n_pairs], or None when native is unavailable / input malformed."""
    import numpy as np

    lib = get_lib()
    if lib is None:
        return None
    offs = np.ascontiguousarray(offs, dtype=np.int64)
    out = np.empty(offs.size * 2, dtype=np.int64)
    rc = lib.pair_walk_decode(
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), offs.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out


def rc_decode(data: bytes, count: int, order: int, period: int, nsym: int) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(count if count else 1)
    n = lib.rc_decode(data, len(data), count, order, period, nsym, out)
    if n != count:
        return None
    return out.raw[:count]
