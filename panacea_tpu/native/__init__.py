"""ctypes bindings for the native rasterizer (compiled on demand with g++).

Falls back to None when no compiler is available — callers keep the NumPy/cv2
path as the reference implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "rasterizer.cpp")
_SO = os.path.join(_HERE, "librasterizer.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or (
        os.path.getmtime(_SO) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.fill_depth_boxes.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, i64p, f32p, ctypes.c_int64,
    ]
    lib.draw_polyline.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int64,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_int,
    ]
    lib.fill_convex_poly.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, i32p, ctypes.c_int64,
        ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
    ]
    _lib = lib
    return _lib


def fill_depth_boxes(img: np.ndarray, boxes, labels, depths) -> bool:
    """In-place min-depth fill; returns False if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    boxes = np.ascontiguousarray(np.asarray(boxes, dtype=np.float32).reshape(-1, 4))
    labels = np.ascontiguousarray(np.asarray(labels, dtype=np.int64).reshape(-1))
    depths = np.ascontiguousarray(np.asarray(depths, dtype=np.float32).reshape(-1))
    lib.fill_depth_boxes(
        img, img.shape[0], img.shape[1], img.shape[2],
        boxes, labels, depths, len(labels),
    )
    return True


def draw_polyline(img: np.ndarray, pts, color_bgr, thickness: int) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    pts = np.ascontiguousarray(np.asarray(pts, dtype=np.int32).reshape(-1, 2))
    lib.draw_polyline(
        img, img.shape[0], img.shape[1], pts, len(pts),
        int(color_bgr[0]), int(color_bgr[1]), int(color_bgr[2]),
        int(thickness),
    )
    return True


def fill_convex_poly(img: np.ndarray, pts, color) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    pts = np.ascontiguousarray(np.asarray(pts, dtype=np.int32).reshape(-1, 2))
    lib.fill_convex_poly(
        img, img.shape[0], img.shape[1], pts, len(pts),
        int(color[0]), int(color[1]), int(color[2]),
    )
    return True
