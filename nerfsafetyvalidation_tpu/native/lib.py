"""ctypes bindings for the native C++ runtime (nsv_native.cpp).

Builds the shared library on demand with g++ (no pybind11 dependency);
callers degrade to pure-python implementations when the toolchain or the
build is unavailable. Build artifact: libnsv_native.so next to this file.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "nsv_native.cpp")
_SO = os.path.join(_DIR, "libnsv_native.so")
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-shared", "-fPIC",
                        "-std=c++17", _SRC, "-o", _SO], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
        lib.astar3d.restype = ctypes.c_int64
        lib.astar3d.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        lib.distance_transform_edt.restype = None
        lib.distance_transform_edt.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
        lib.morton3d_encode.restype = None
        lib.morton3d_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def astar(occupied, start, goal):
    """Returns [L, 3] int32 path or None when unreachable."""
    lib = _load()
    occ = np.ascontiguousarray(np.asarray(occupied), dtype=np.uint8)
    sx, sy, sz = occ.shape
    start = np.asarray(start, dtype=np.int32)
    goal = np.asarray(goal, dtype=np.int32)
    max_path = sx * sy * sz
    out = np.empty((max_path, 3), dtype=np.int32)
    n = lib.astar3d(
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sx, sy, sz,
        start.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        goal.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_path)
    if n < 0:
        return None
    return out[:n].copy()


def distance_transform(free_space):
    """Exact euclidean distance transform (in cells). free_space: bool
    [X, Y, Z], True where empty."""
    lib = _load()
    free = np.ascontiguousarray(np.asarray(free_space), dtype=np.uint8)
    sx, sy, sz = free.shape
    out = np.empty(free.shape, dtype=np.float32)
    lib.distance_transform_edt(
        free.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sx, sy, sz,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def morton3d(coords):
    lib = _load()
    c = np.ascontiguousarray(np.asarray(coords), dtype=np.int32).reshape(-1, 3)
    out = np.empty((c.shape[0],), dtype=np.int32)
    lib.morton3d_encode(
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), c.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
