"""ctypes bindings for the C++ host-runtime helpers (native/).

Builds the shared library on first import (g++, ~1s) and caches it next to
the sources; falls back to scipy if no compiler is available.
"""

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

__all__ = ['linear_assignment', 'giou_cost_matrix', 'native_available']

_NATIVE_DIR = osp.abspath(osp.join(osp.dirname(__file__), '..', '..', 'native'))
_SRC = osp.join(_NATIVE_DIR, 'tpudet3d_native.cpp')
_LIB = osp.join(_NATIVE_DIR, 'libtpudet3d_native.so')

_lib = None


def _build():
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-o', _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not osp.exists(_LIB)) or (osp.getmtime(_LIB) < osp.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.linear_assignment.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
        lib.giou_cost_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = False
    return _lib


def native_available():
    return bool(_load())


def linear_assignment(cost):
    """cost [R,C] → (row_idx, col_idx) of the min-cost assignment."""
    cost = np.ascontiguousarray(cost, np.float64)
    r, c = cost.shape
    if r == 0 or c == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lib = _load()
    if lib:
        out = np.full(r, -1, np.int32)
        lib.linear_assignment(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), r, c,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
        rows = np.nonzero(out >= 0)[0]
        return rows.astype(np.int64), out[rows].astype(np.int64)
    from scipy.optimize import linear_sum_assignment
    return linear_sum_assignment(cost)


def giou_cost_matrix(detections, track_boxes):
    """detections [N,4], track_boxes [M,4] → 0.5*(1-GIoU) cost [N,M]."""
    det = np.ascontiguousarray(detections, np.float64).reshape(-1, 4)
    trk = np.ascontiguousarray(track_boxes, np.float64).reshape(-1, 4)
    n, m = det.shape[0], trk.shape[0]
    lib = _load()
    if lib and n and m:
        cost = np.empty((n, m), np.float64)
        lib.giou_cost_matrix(
            det.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            trk.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return cost
    # numpy fallback
    if not (n and m):
        return np.zeros((n, m), np.float64)
    a1 = np.clip(det[:, 2] - det[:, 0], 0, None) * np.clip(det[:, 3] - det[:, 1], 0, None)
    a2 = np.clip(trk[:, 2] - trk[:, 0], 0, None) * np.clip(trk[:, 3] - trk[:, 1], 0, None)
    lt = np.maximum(det[:, None, :2], trk[None, :, :2])
    rb = np.minimum(det[:, None, 2:], trk[None, :, 2:])
    inter = np.clip(rb - lt, 0, None).prod(-1)
    elt = np.minimum(det[:, None, :2], trk[None, :, :2])
    erb = np.maximum(det[:, None, 2:], trk[None, :, 2:])
    enclose = np.clip(erb - elt, 0, None).prod(-1)
    union = a1[:, None] + a2[None, :] - inter
    iou = np.where(union > 0, inter / union, 0.0)
    giou = np.where(enclose > 0, iou - (enclose - union) / enclose, -1.0)
    return 0.5 * (1.0 - giou)
