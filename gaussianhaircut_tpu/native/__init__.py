"""Native host-side I/O (C++ via ctypes), with transparent Python fallback.

Compiled on first use into __pycache__/libfastio.so; all callers go through
the wrappers below, which return numpy arrays identical to the pure-Python
parsers in scene/colmap.py and scene/ply.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), "fastio.cpp")
    out_dir = os.path.join(os.path.dirname(__file__), "__pycache__")
    os.makedirs(out_dir, exist_ok=True)
    so = os.path.join(out_dir, "libfastio.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.check_call(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                stderr=subprocess.DEVNULL)
        lib = ctypes.CDLL(so)
        lib.colmap_points3d.restype = ctypes.c_int64
        lib.colmap_images.restype = ctypes.c_int64
        lib.ply_vertex_f32.restype = ctypes.c_int64
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _take(ptr, dtype, shape, lib):
    n = int(np.prod(shape))
    buf = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)),
        (n * np.dtype(dtype).itemsize,))
    out = np.frombuffer(buf.tobytes(), dtype=dtype).reshape(shape).copy()
    lib.free_ptr(ptr)
    return out


def read_colmap_points3d(path: str):
    """-> (xyz [N,3] f64, rgb [N,3] u8, err [N] f64) or None on failure."""
    lib = _build_and_load()
    if lib is None:
        return None
    xyz_p = ctypes.c_void_p()
    rgb_p = ctypes.c_void_p()
    err_p = ctypes.c_void_p()
    n = lib.colmap_points3d(path.encode(), ctypes.byref(xyz_p),
                            ctypes.byref(rgb_p), ctypes.byref(err_p))
    if n < 0:
        return None
    return (_take(xyz_p, np.float64, (n, 3), lib),
            _take(rgb_p, np.uint8, (n, 3), lib),
            _take(err_p, np.float64, (n,), lib))


def read_colmap_images(path: str):
    """-> list of (id, qvec[4], tvec[3], cam_id, name) or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    ids_p = ctypes.c_void_p()
    qt_p = ctypes.c_void_p()
    cam_p = ctypes.c_void_p()
    names_p = ctypes.c_void_p()
    names_len = ctypes.c_int64()
    n = lib.colmap_images(path.encode(), ctypes.byref(ids_p),
                          ctypes.byref(qt_p), ctypes.byref(cam_p),
                          ctypes.byref(names_p), ctypes.byref(names_len))
    if n < 0:
        return None
    ids = _take(ids_p, np.int32, (n,), lib)
    qt = _take(qt_p, np.float64, (n, 7), lib)
    cams = _take(cam_p, np.int32, (n,), lib)
    blob = _take(names_p, np.uint8, (int(names_len.value),), lib)
    names = bytes(blob).decode("utf-8").split("\x00")[:n]
    return [(int(ids[i]), qt[i, :4].copy(), qt[i, 4:].copy(), int(cams[i]),
             names[i]) for i in range(n)]


def read_ply_vertex_f32(path: str):
    """-> (prop_names list, data [N, P] f32) or None (non-f32/ascii plys
    fall back to the Python reader)."""
    lib = _build_and_load()
    if lib is None:
        return None
    props_p = ctypes.c_void_p()
    props_len = ctypes.c_int64()
    data_p = ctypes.c_void_p()
    nprops = ctypes.c_int64()
    n = lib.ply_vertex_f32(path.encode(), ctypes.byref(props_p),
                           ctypes.byref(props_len), ctypes.byref(data_p),
                           ctypes.byref(nprops))
    if n < 0:
        return None
    blob = _take(props_p, np.uint8, (int(props_len.value) + 1,), lib)
    names = bytes(blob[:-1]).decode().split(";")
    data = _take(data_p, np.float32, (n, int(nprops.value)), lib)
    return names, data
