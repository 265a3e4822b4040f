"""Image / G-buffer I/O (SURVEY.md §2 component 22).

PNG for human viewing; float32 .npy for golden frames (PNG quantizes away
ULP fidelity — SURVEY.md §4.1).
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


def tonemap_u8(rgb: np.ndarray) -> np.ndarray:
    """Linear -> sRGB-ish gamma 2.2, clipped to u8."""
    x = np.clip(np.asarray(rgb, np.float32), 0.0, 1.0)
    x = x ** (1.0 / 2.2)
    return (x * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, rgb) -> None:
    from PIL import Image
    arr = tonemap_u8(np.asarray(rgb))
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    Image.fromarray(arr, "RGB").save(path)


def save_golden(path: str, buffers: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in buffers.items()})


def load_golden(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def ulp_diff_f32(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise distance in ULPs between two float32 arrays.

    Uses the monotonic integer mapping of IEEE-754 floats (sign-magnitude ->
    two's-complement ordering), so the result counts representable floats
    between a and b. Identical values -> 0; adjacent floats -> 1.
    """
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    return np.abs(ai - bi)


def max_ulp(a, b) -> int:
    return int(ulp_diff_f32(a, b).max())
