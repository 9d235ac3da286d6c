"""ctypes bindings for the native (C++) host runtime components.

Currently: the flattened-BVH builder (native/bvh_builder.cpp), which mirrors
models/bvh_build._build_numpy bit-for-bit (both use stable sorts and the
same traversal order, so their outputs are identical arrays).

A prebuilt ``native/libhrt_native.so`` is CDLL-loaded when present.  If it
is missing, the library is compiled with the repo's Makefile only when the
user opts in via ``HRT_BUILD_NATIVE=1`` (an implicit compiler invocation
inside a render call surprises sandboxed environments); otherwise — and on
any failure — everything degrades gracefully to the NumPy implementation.
``HRT_DISABLE_NATIVE=1`` skips the native path entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libhrt_native.so"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("HRT_DISABLE_NATIVE"):
        return None
    try:
        if not _LIB_PATH.exists():
            src = _NATIVE_DIR / "bvh_builder.cpp"
            if not src.exists():
                return None
            # Compiling as a side effect of a library call is opt-in only.
            if not os.environ.get("HRT_BUILD_NATIVE"):
                return None
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR), "-s"],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.hrt_build_bvh.restype = ctypes.c_int
        lib.hrt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def native_build_bvh(aabb_min: np.ndarray, aabb_max: np.ndarray,
                     leaf_size: int):
    """Same contract as models.bvh_build._build_numpy; raises RuntimeError
    if the native library is unavailable (callers fall back to NumPy)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = aabb_min.shape[0]
    amin = np.ascontiguousarray(aabb_min, np.float32)
    amax = np.ascontiguousarray(aabb_max, np.float32)
    cap = 2 * n
    bmin = np.empty((cap, 3), np.float32)
    bmax = np.empty((cap, 3), np.float32)
    first = np.empty(cap, np.int32)
    count = np.empty(cap, np.int32)
    skip = np.empty(cap, np.int32)
    perm = np.empty(n, np.int64)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    nn = lib.hrt_build_bvh(
        p(amin, ctypes.c_float), p(amax, ctypes.c_float), n, leaf_size,
        p(bmin, ctypes.c_float), p(bmax, ctypes.c_float),
        p(first, ctypes.c_int32), p(count, ctypes.c_int32),
        p(skip, ctypes.c_int32), p(perm, ctypes.c_int64),
    )
    if nn < 0:
        raise RuntimeError("native BVH build failed")
    return (bmin[:nn].copy(), bmax[:nn].copy(), first[:nn].copy(),
            count[:nn].copy(), skip[:nn].copy(), perm)
