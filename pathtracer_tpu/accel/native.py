"""ctypes bridge to the native (C++) binned-SAH BVH builder.

Loads native/libbvh.so (built by `make -C native`; auto-built on first use
if a toolchain is present). Falls back cleanly to the numpy builder when
the library is unavailable, so the framework never hard-depends on a
compiled artifact. Output contract matches accel/build.py:build_bvh.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .build import FlatBVH

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libbvh.so"))
_lib = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bvh_build.restype = ctypes.c_int
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_bvh_native(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                     max_leaf: int = 4) -> FlatBVH:
    """Binned-SAH flat BVH via the C++ builder (same contract as numpy)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native/libbvh.so unavailable (no toolchain?)")
    v0 = np.asarray(v0, np.float32)
    p1 = v0 + np.asarray(e1, np.float32)
    p2 = v0 + np.asarray(e2, np.float32)
    T = len(v0)
    if T == 0:
        z3 = np.zeros((0, 3), np.float32)
        z1 = np.zeros((0,), np.int32)
        return FlatBVH(z3, z3, z1, z1, z1, z1)
    tris = np.ascontiguousarray(
        np.concatenate([v0, p1, p2], axis=1), np.float32
    )  # (T, 9)
    cap = 2 * T
    lo = np.empty((cap, 3), np.float32)
    hi = np.empty((cap, 3), np.float32)
    first = np.empty((cap,), np.int32)
    count = np.empty((cap,), np.int32)
    skip = np.empty((cap,), np.int32)
    order = np.empty((T,), np.int32)

    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n_nodes = lib.bvh_build(
        tris.ctypes.data_as(fp), T, max_leaf,
        lo.ctypes.data_as(fp), hi.ctypes.data_as(fp),
        first.ctypes.data_as(ip), count.ctypes.data_as(ip),
        skip.ctypes.data_as(ip), order.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        raise RuntimeError(f"bvh_build failed: {n_nodes}")
    return FlatBVH(
        lo=lo[:n_nodes].copy(), hi=hi[:n_nodes].copy(),
        first=first[:n_nodes].copy(), count=count[:n_nodes].copy(),
        skip=skip[:n_nodes].copy(), order=order,
    )
