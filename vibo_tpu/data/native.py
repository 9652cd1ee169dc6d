"""ctypes bindings for the native C++ response-matrix loader.

Builds native/libresponse_loader.so on first use (g++, cached) and exposes
`parse_long_csv(path, person_col, item_col, correct_col, ...)` returning
(response f32, mask f32, person_ids, item_ids) with semantics identical to
vibo_tpu.data.loaders.long_to_matrix (tested for equality in
tests/test_native.py). Callers fall back to the Python path when the
toolchain or the .so is unavailable — never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libresponse_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "response_loader.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _stale() -> bool:
    src = os.path.join(_NATIVE_DIR, "response_loader.cpp")
    return (os.path.exists(src) and os.path.exists(_SO_PATH)
            and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))


def load_library():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # (re)build when missing OR when the source is newer than the .so
        if (not os.path.exists(_SO_PATH) or _stale()) and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(_SO_PATH)
        lib.rl_parse.restype = ctypes.c_void_p
        lib.rl_parse.argtypes = [ctypes.c_char_p] * 4 + [ctypes.c_int] * 2
        lib.rl_parse_ex.restype = ctypes.c_void_p
        lib.rl_parse_ex.argtypes = ([ctypes.c_char_p] * 6 + [ctypes.c_int] * 3)
        lib.rl_parse_errors.restype = ctypes.c_int64
        lib.rl_parse_errors.argtypes = [ctypes.c_void_p]
        lib.rl_num_persons.restype = ctypes.c_int64
        lib.rl_num_persons.argtypes = [ctypes.c_void_p]
        lib.rl_num_items.restype = ctypes.c_int64
        lib.rl_num_items.argtypes = [ctypes.c_void_p]
        lib.rl_error.restype = ctypes.c_char_p
        lib.rl_error.argtypes = [ctypes.c_void_p]
        lib.rl_fill.restype = None
        lib.rl_fill.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int8)]
        lib.rl_fill_f32.restype = None
        lib.rl_fill_f32.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.POINTER(ctypes.c_float)]
        lib.rl_person_ids.restype = ctypes.c_char_p
        lib.rl_person_ids.argtypes = [ctypes.c_void_p]
        lib.rl_item_ids.restype = ctypes.c_char_p
        lib.rl_item_ids.argtypes = [ctypes.c_void_p]
        lib.rl_free.restype = None
        lib.rl_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


BINARIZE_GT_HALF = 0        # numeric value > 0.5
BINARIZE_GE_DENOM = 1       # numeric value >= required denominator column
BINARIZE_GE_DENOM_OPT = 2   # like 1, denom column optional (defaults to 1)
BINARIZE_STR_MATCH = 3      # trimmed lowercase string equality


def parse_long_csv(path: str, person_col: str, item_col: str, correct_col: str,
                   min_per_person: int = 5, min_per_item: int = 5,
                   denom_col: str = "", match: str = "",
                   mode: int = BINARIZE_GT_HALF):
    """Native CSV -> (response, mask, person_ids, item_ids). Raises on error,
    including rows with unparseable numeric fields (matching the Python
    path's float(), which raises instead of coercing garbage)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable (no g++ / build failed)")
    h = lib.rl_parse_ex(path.encode(), person_col.encode(), item_col.encode(),
                        correct_col.encode(), denom_col.encode(),
                        match.encode(), mode, min_per_person, min_per_item)
    try:
        err = lib.rl_error(h)
        if err:
            raise ValueError(f"native loader: {err.decode()}")
        bad = lib.rl_parse_errors(h)
        if bad:
            raise ValueError(
                f"native loader: {bad} unparseable row(s) in {path} "
                "(malformed numeric field or too few columns)")
        n = lib.rl_num_persons(h)
        m = lib.rl_num_items(h)
        # np.zeros allocates lazily (copy-on-write zero pages), and the C
        # scatter touches ONLY observed cells — at DuoLingo scale (~5%
        # density) this replaces two full 1 GB page-fault write passes with
        # one sparse pass (measured 17 s -> ~3 s for the decode step).
        # THP advice cuts the remaining fault cost ~100x on this image
        # (utils/hostmem.py): observed cells land on ~every 4k page anyway.
        from vibo_tpu.utils.hostmem import zeros_hugepages
        response = zeros_hugepages((n, m), dtype=np.float32)
        mask = zeros_hugepages((n, m), dtype=np.float32)
        lib.rl_fill_f32(h,
                        response.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        person_ids = lib.rl_person_ids(h).decode().splitlines()
        item_ids = lib.rl_item_ids(h).decode().splitlines()
    finally:
        lib.rl_free(h)
    return response, mask, person_ids, item_ids
