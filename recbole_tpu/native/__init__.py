"""Native (C++) runtime components.

The reference's only native IO is pandas' C engine (dataset.py:369-408 reads
atomic files through read_csv). This package holds the TPU build's native
data-loader: a multithreaded TSV parser + token factorizer compiled from
``atomic_fast.cpp`` and bound via ctypes (no pybind11 in this image).

The library is built lazily with g++ on first use and cached next to the
source; every entry point degrades to the pandas path on any failure, so the
framework never hard-depends on a working toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "atomic_fast.cpp")
_SO = os.path.join(_DIR, "_atomic_fast.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _load_lib():
    """Compile (if stale) and dlopen the native reader; None on failure."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.isfile(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                tmp = _SO + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", "-o", tmp, _SRC],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.atr_open.restype = ctypes.c_void_p
            lib.atr_open.argtypes = [
                ctypes.c_char_p, ctypes.c_char, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_char_p, ctypes.c_int]
            lib.atr_error.restype = ctypes.c_char_p
            lib.atr_error.argtypes = [ctypes.c_void_p]
            lib.atr_rows.restype = ctypes.c_int64
            lib.atr_rows.argtypes = [ctypes.c_void_p]
            lib.atr_float.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
            lib.atr_token_n_uniq.restype = ctypes.c_int64
            lib.atr_token_n_uniq.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.atr_token_arena_bytes.restype = ctypes.c_int64
            lib.atr_token_arena_bytes.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.atr_token_codes.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p]
            lib.atr_token_uniq.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
                ctypes.c_void_p]
            lib.atr_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def read_scalar_tsv(path, sep, fields, field_kinds, sel_indices):
    """Fast-path read of scalar columns from a headered TSV.

    fields: selected field names; field_kinds: 'f' (float32 + NaN coercion)
    or 't' (object array of str, NaN for empty/NA cells) per field;
    sel_indices: the fields' column positions in the file.
    Returns {field: np.ndarray} or None when the fast path cannot apply
    (no toolchain, multi-char separator, quoted fields, ...).
    """
    if len(sep) != 1:
        return None
    lib = _load_lib()
    if lib is None:
        return None
    sel = (ctypes.c_int * len(sel_indices))(*sel_indices)
    kinds = "".join(field_kinds).encode()
    h = lib.atr_open(path.encode(), sep.encode(), len(fields), sel, kinds,
                     min(8, os.cpu_count() or 1))
    if not h:
        return None
    try:
        err = lib.atr_error(h)
        if err:
            return None                     # e.g. quoted field -> pandas
        n = lib.atr_rows(h)
        out = {}
        for pos, (f, kind) in enumerate(zip(fields, field_kinds)):
            if kind == "f":
                arr = np.empty(n, np.float32)
                lib.atr_float(h, pos, arr.ctypes.data_as(ctypes.c_void_p))
                out[f] = arr
            else:
                codes = np.empty(n, np.int64)
                lib.atr_token_codes(h, pos,
                                    codes.ctypes.data_as(ctypes.c_void_p))
                n_uniq = lib.atr_token_n_uniq(h, pos)
                arena = np.empty(lib.atr_token_arena_bytes(h, pos), np.uint8)
                offsets = np.empty(n_uniq + 1, np.int64)
                lib.atr_token_uniq(h, pos,
                                   arena.ctypes.data_as(ctypes.c_void_p),
                                   offsets.ctypes.data_as(ctypes.c_void_p))
                buf = arena.tobytes()
                uniq = np.empty(n_uniq + 1, object)
                for i in range(n_uniq):
                    uniq[i] = buf[offsets[i]:offsets[i + 1]].decode("utf-8")
                uniq[n_uniq] = np.nan       # codes of -1 (NA cells) land here
                out[f] = uniq[codes]        # pointer fancy-index, no copies
        return out
    finally:
        lib.atr_close(h)
