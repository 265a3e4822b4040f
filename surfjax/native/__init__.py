"""Native (C++) runtime components, loaded via ctypes.

Policy (SURVEY.md §2 native-code note): host-side hot paths that are loops
in Python get real C++ equivalents. Current members:
  * grid_builder — uniform-grid CSR binning for triangle meshes
  * obj_loader — OBJ mesh data loader (v/f records, fan triangulation)
  * ../golden/cpp — the strict-FP golden oracle
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))

_libs = {}


def _build_load(src_name: str, lib_name: str) -> Optional[ctypes.CDLL]:
    """Build (if stale) + dlopen one native component; None if no
    toolchain. Compiles to a per-pid temp file then os.replace()s into
    place — rename is atomic on the same filesystem, so a concurrent
    importer can never dlopen a partially written library."""
    if src_name in _libs:
        lib = _libs[src_name]
        return lib if lib is not False else None
    src = os.path.join(_HERE, src_name)
    out = os.path.join(_HERE, lib_name)
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(src)):
            tmp = f"{out}.{os.getpid()}.tmp"
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", tmp,
                            src], check=True, capture_output=True)
            os.replace(tmp, out)
        lib = ctypes.CDLL(out)
        _libs[src_name] = lib
        return lib
    except (OSError, subprocess.CalledProcessError):
        _libs[src_name] = False  # remember; callers fall back to Python
        return None


def _load() -> Optional[ctypes.CDLL]:
    """Build+load the native grid builder; None if no toolchain."""
    lib = _build_load("grid_builder.cpp", "libgridbuilder.so")
    if lib is None or hasattr(lib, "_sj_typed"):
        return lib
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    ci = ctypes.c_int
    lib.sj_grid_count.argtypes = [f32p, i32p, ci, f32p, f32p,
                                  ci, ci, ci, i32p]
    lib.sj_grid_fill.argtypes = [f32p, i32p, ci, f32p, f32p,
                                 ci, ci, ci, i32p, i32p, i32p]
    lib._sj_typed = True
    return lib


def load_obj(path: str) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """OBJ (verts (V,3) f32, faces (T,3) i32) via the native loader;
    None = no toolchain (caller falls back to the Python parser)."""
    lib = _build_load("obj_loader.cpp", "libobjloader.so")
    if lib is None:
        return None
    if not hasattr(lib, "_sj_typed"):
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.obj_count.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(i64), ctypes.POINTER(i64)]
        lib.obj_count.restype = ctypes.c_int
        lib.obj_load.argtypes = [ctypes.c_char_p, f32p, i32p, i64, i64]
        lib.obj_load.restype = ctypes.c_int
        lib._sj_typed = True
    nv = ctypes.c_int64(0)
    nt = ctypes.c_int64(0)
    p = path.encode()
    if lib.obj_count(p, ctypes.byref(nv), ctypes.byref(nt)) != 0:
        # distinguish unreadable from merely empty (the parser treats
        # both as "no buffer"): an existing empty/whitespace file is a
        # valid 0-vertex mesh, matching the Python fallback
        if os.path.isfile(path) and os.path.getsize(path) == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32))
        raise FileNotFoundError(path)
    verts = np.zeros((nv.value, 3), np.float32)
    faces = np.zeros((nt.value, 3), np.int32)
    rc = lib.obj_load(p, verts.reshape(-1), faces.reshape(-1),
                      nv.value, nt.value)
    if rc != 0:
        raise ValueError(f"native OBJ parse failed rc={rc}: {path}")
    return verts, faces


def grid_bin(verts: np.ndarray, faces: np.ndarray, bb_min, cell,
             nx: int, ny: int, nz: int
             ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """CSR (cell_start, cell_tris) via the native builder; None = no lib."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    bb = np.ascontiguousarray(bb_min, np.float32)
    cl = np.ascontiguousarray(cell, np.float32)
    ncells = nx * ny * nz
    counts = np.zeros(ncells, np.int32)
    lib.sj_grid_count(verts, faces, faces.shape[0], bb, cl, nx, ny, nz,
                      counts)
    cell_start = np.zeros(ncells + 1, np.int32)
    np.cumsum(counts, out=cell_start[1:])
    total = int(cell_start[-1])
    cell_tris = np.zeros(max(total, 1), np.int32)
    cursor = np.zeros(ncells, np.int32)
    lib.sj_grid_fill(verts, faces, faces.shape[0], bb, cl, nx, ny, nz,
                     cell_start, cursor, cell_tris)
    return cell_start, cell_tris
