"""ctypes bindings for the native host data-path library (native/*.cpp).

The TPU-native counterpart of the reference's native layer: where the
reference's C++/CUDA lives in the compute path (ours is Pallas), our native
C++ accelerates the remaining HOST path — chunk extraction over
multi-million-point scenes via an xy CSR grid index, and greedy view
selection. Falls back to pure NumPy when the library can't be built
(behavior-identical; tests compare both).

Build: ``make -C native`` (auto-attempted on first import).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmvpnet_host.so"))
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR), "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.grid_build.restype = ctypes.c_int64
    lib.grid_build.argtypes = [f32p, ctypes.c_int64, ctypes.c_double, i64p, i64p, f64p]
    lib.grid_query.restype = ctypes.c_int64
    lib.grid_query.argtypes = [
        f32p, i64p, i64p, f64p,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, i64p, ctypes.c_int64,
    ]
    lib.greedy_cover.restype = None
    lib.greedy_cover.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class GridIndex:
    """xy CSR grid over a scene point cloud for O(box) chunk queries."""

    def __init__(self, points: np.ndarray, cell: float = 0.5):
        self.points = np.ascontiguousarray(points, np.float32)
        self.cell = float(cell)
        lib = _load()
        self._native = lib is not None
        if self._native:
            ncells = lib.grid_build(
                _ptr(self.points, ctypes.c_float),
                len(self.points),
                self.cell,
                None,
                None,
                None,
            )
            self.cell_start = np.zeros(ncells + 1, np.int64)
            self.order = np.zeros(len(self.points), np.int64)
            self.meta = np.zeros(5, np.float64)
            lib.grid_build(
                _ptr(self.points, ctypes.c_float),
                len(self.points),
                self.cell,
                _ptr(self.cell_start, ctypes.c_int64),
                _ptr(self.order, ctypes.c_int64),
                _ptr(self.meta, ctypes.c_double),
            )

    def query_box(self, center_xy, half: float) -> np.ndarray:
        """Indices of points with both |x-cx|, |y-cy| <= half."""
        if not self._native:
            near = np.abs(self.points[:, :2] - np.asarray(center_xy))
            return np.nonzero((near[:, 0] <= half) & (near[:, 1] <= half))[0]
        lib = _load()
        cap = len(self.points)
        out = np.zeros(cap, np.int64)
        n = lib.grid_query(
            _ptr(self.points, ctypes.c_float),
            _ptr(self.cell_start, ctypes.c_int64),
            _ptr(self.order, ctypes.c_int64),
            _ptr(self.meta, ctypes.c_double),
            float(center_xy[0]),
            float(center_xy[1]),
            float(half),
            _ptr(out, ctypes.c_int64),
            cap,
        )
        return out[:n]


def greedy_cover_native(coverage: np.ndarray, k: int) -> np.ndarray | None:
    """Native greedy max-coverage; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cov = np.ascontiguousarray(coverage.astype(np.uint8))
    out = np.zeros(k, np.int64)
    lib.greedy_cover(
        _ptr(cov, ctypes.c_uint8), cov.shape[0], cov.shape[1], k,
        _ptr(out, ctypes.c_int64),
    )
    return out
