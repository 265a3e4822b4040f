"""Native (C++) runtime components, loaded via ctypes.

Policy (SURVEY.md §2 native-code note): host-side hot paths that are loops
in Python get real C++ equivalents. Current members:
  * grid_builder — uniform-grid CSR binning for triangle meshes
  * ../golden/cpp — the strict-FP golden oracle
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "grid_builder.cpp")
_LIB = os.path.join(_HERE, "libgridbuilder.so")

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    """Build+load the native grid builder; None if no toolchain."""
    global _lib
    if _lib is not None:
        return _lib if _lib is not False else None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            # compile to a per-pid temp file, then rename into place:
            # rename is atomic on the same filesystem, so a concurrent
            # importer can never dlopen a partially written library
            tmp = f"{_LIB}.{os.getpid()}.tmp"
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", tmp,
                            _SRC], check=True, capture_output=True)
            os.replace(tmp, _LIB)
        lib = ctypes.CDLL(_LIB)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        ci = ctypes.c_int
        lib.sj_grid_count.argtypes = [f32p, i32p, ci, f32p, f32p,
                                      ci, ci, ci, i32p]
        lib.sj_grid_fill.argtypes = [f32p, i32p, ci, f32p, f32p,
                                     ci, ci, ci, i32p, i32p, i32p]
        _lib = lib
        return lib
    except (OSError, subprocess.CalledProcessError):
        _lib = False  # remember the failure; fall back to Python binning
        return None


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
