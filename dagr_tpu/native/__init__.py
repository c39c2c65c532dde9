"""ctypes bindings for the native host-side kernels.

Builds libdagr_native.so on first import if missing (g++ is part of
the baked toolchain).  Every binding has a numpy fallback at its call
site, so import failure is non-fatal.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libdagr_native.so"


def _load():
    if not _SO.exists():
        subprocess.run(
            ["make", "-C", str(_DIR), "-s"], check=True, capture_output=True
        )
    lib = ctypes.CDLL(str(_SO))

    lib.filter_events_resize.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.subsample_zoom.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_int16),
    ]
    lib.insert_and_search.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


_lib = _load()


def _ptr(a, ty):
    return a.ctypes.data_as(ctypes.POINTER(ty))


def filter_events_resize(x, y, p, change_map, fx, fy):
    """Drop-in for downsample.filter_events_resize_np."""
    x = np.ascontiguousarray(x, np.int64)
    y = np.ascontiguousarray(y, np.int64)
    p = np.ascontiguousarray(p, np.float32)
    change_map = np.ascontiguousarray(change_map, np.float32)
    mask = np.zeros(len(x), np.uint8)
    _lib.filter_events_resize(
        _ptr(x, ctypes.c_int64), _ptr(y, ctypes.c_int64),
        _ptr(p, ctypes.c_float), len(x),
        _ptr(change_map, ctypes.c_float), change_map.shape[1],
        fx, fy, _ptr(mask, ctypes.c_uint8),
    )
    return mask.astype(bool), change_map


def subsample_zoom(pos_x, pos_y, p, count, threshold):
    """Drop-in for augment._subsample."""
    pos_x = np.ascontiguousarray(pos_x, np.float64)
    pos_y = np.ascontiguousarray(pos_y, np.float64)
    p = np.ascontiguousarray(p, np.float32)
    count = np.ascontiguousarray(count, np.float32)
    n = len(pos_x)
    mask = np.zeros(n, np.uint8)
    out_x = np.zeros(n, np.int16)
    out_y = np.zeros(n, np.int16)
    _lib.subsample_zoom(
        _ptr(pos_x, ctypes.c_double), _ptr(pos_y, ctypes.c_double),
        _ptr(p, ctypes.c_float), n,
        _ptr(count, ctypes.c_float), count.shape[1],
        ctypes.c_float(threshold),
        _ptr(mask, ctypes.c_uint8),
        _ptr(out_x, ctypes.c_int16), _ptr(out_y, ctypes.c_int16),
    )
    return mask.astype(bool), out_x, out_y


class CpuGraphBuilder:
    """Streaming per-pixel-queue graph builder on the host — a native
    oracle of the reference CUDA path (reference: graph/ev_graph.cu)."""

    def __init__(self, width, height, queue_size=128):
        self.width, self.height, self.q = width, height, queue_size
        self.queue = np.full((height * width * queue_size,), -1, np.int32)
        self.all_t = np.zeros(0, np.int32)
        self.n = 0

    def insert_and_search(self, ex, ey, et, radius, delta_t, max_neighbors):
        ex = np.ascontiguousarray(ex, np.int32)
        ey = np.ascontiguousarray(ey, np.int32)
        et = np.ascontiguousarray(et, np.int32)
        n = len(ex)
        self.all_t = np.concatenate([self.all_t, et]).astype(np.int32)
        self.all_t = np.ascontiguousarray(self.all_t)
        nbr = np.zeros((n, max_neighbors), np.int32)
        mask = np.zeros((n, max_neighbors), np.uint8)
        _lib.insert_and_search(
            _ptr(ex, ctypes.c_int32), _ptr(ey, ctypes.c_int32),
            _ptr(et, ctypes.c_int32), n, self.n,
            _ptr(self.queue, ctypes.c_int32), self.width, self.height,
            self.q, _ptr(self.all_t, ctypes.c_int32),
            radius, delta_t, max_neighbors,
            _ptr(nbr, ctypes.c_int32), _ptr(mask, ctypes.c_uint8),
        )
        self.n += n
        return nbr, mask.astype(bool)
