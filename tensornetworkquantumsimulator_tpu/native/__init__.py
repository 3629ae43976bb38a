"""Native (C++) runtime components, loaded via ctypes.

`libpathopt.so` — exact contraction-order DP (the counterpart of the
reference's TensorOperations.optimaltree).  Built lazily with g++ on first
use; the pure-Python opt_einsum search is the fallback, so the framework
works without a toolchain."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libpathopt.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_HERE, "pathopt.cpp")
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_pathopt():
    """Return the loaded library or None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_HERE, "pathopt.cpp")
        stale = not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        )
        if stale:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.optimal_path.restype = ctypes.c_int
            lib.optimal_path.argtypes = [
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
            return _lib
        except OSError:
            _build_failed = True
            return None


def optimal_path_native(inputs: list, dims: dict):
    """SSA pairwise path for a tensor list.

    ``inputs`` is a list of index-key tuples per tensor; ``dims`` maps index
    key -> dimension.  Returns a list of (i, j) SSA pairs or None.
    """
    lib = get_pathopt()
    if lib is None:
        return None
    n = len(inputs)
    keys = []
    key_pos = {}
    for sub in inputs:
        for k in sub:
            if k not in key_pos:
                key_pos[k] = len(keys)
                keys.append(k)
    if n < 2 or n > 16 or len(keys) > 64:  # 3^n sub-subset DP: keep n small
        return None
    ind_dims = (ctypes.c_double * len(keys))(*[float(dims[k]) for k in keys])
    masks = []
    for sub in inputs:
        m = 0
        for k in sub:
            m |= 1 << key_pos[k]
        masks.append(m)
    tensor_inds = (ctypes.c_uint64 * n)(*masks)
    out = (ctypes.c_int * (2 * (n - 1)))()
    rc = lib.optimal_path(n, len(keys), ind_dims, tensor_inds, out)
    if rc != 0:
        return None
    return [(out[2 * i], out[2 * i + 1]) for i in range(n - 1)]
