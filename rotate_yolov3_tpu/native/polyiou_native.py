"""ctypes bindings for the native polyiou library (see polyiou.cpp).

Builds the shared library on first use with g++ (the reference ships a
make.sh-style build for its native extensions, SURVEY.md §2 "NMS ext.
build"); cached next to the source. No pybind11 in this environment —
plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "polyiou.cpp")
_LIB = os.path.join(_DIR, "libpolyiou.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.iou_poly.restype = ctypes.c_double
        lib.iou_poly.argtypes = [ctypes.POINTER(ctypes.c_double)] * 2
        lib.rbox_iou_matrix.restype = None
        lib.rbox_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.quad_iou_matrix.restype = None
        lib.quad_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.rotated_nms.restype = ctypes.c_int
        lib.rotated_nms.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def iou_poly(p: np.ndarray, q: np.ndarray) -> float:
    """Exact IoU of two quads, each (4, 2) or flat (8,) — the reference
    devkit's ``polyiou.iou_poly`` contract."""
    lib = get_lib()
    p = np.ascontiguousarray(np.asarray(p, np.float64).reshape(-1))
    q = np.ascontiguousarray(np.asarray(q, np.float64).reshape(-1))
    return float(lib.iou_poly(_dptr(p), _dptr(q)))


def rbox_iou_matrix(boxes: np.ndarray) -> np.ndarray:
    """(N, 5) rotated boxes -> (N, N) exact IoU matrix."""
    lib = get_lib()
    b = np.ascontiguousarray(np.asarray(boxes, np.float32)[:, :5])
    n = len(b)
    out = np.zeros((n, n), np.float32)
    if n:
        lib.rbox_iou_matrix(_fptr(b), n, _fptr(out))
    return out


def quad_iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4, 2) x (M, 4, 2) quads -> (N, M) exact IoU matrix."""
    lib = get_lib()
    a = np.ascontiguousarray(np.asarray(a, np.float64).reshape(len(a), 8))
    b = np.ascontiguousarray(np.asarray(b, np.float64).reshape(len(b), 8))
    out = np.zeros((len(a), len(b)), np.float32)
    if len(a) and len(b):
        lib.quad_iou_matrix(_dptr(a), len(a), _dptr(b), len(b), _fptr(out))
    return out


def rotated_nms(boxes: np.ndarray, scores: np.ndarray,
                iou_thr: float) -> np.ndarray:
    """Greedy rotated NMS; returns kept indices into the ORIGINAL order."""
    lib = get_lib()
    order = np.argsort(-np.asarray(scores), kind="stable")
    dets = np.ascontiguousarray(np.concatenate(
        [np.asarray(boxes, np.float32)[order, :5],
         np.asarray(scores, np.float32)[order, None]], axis=1))
    keep = np.zeros(len(dets), np.int32)
    n = lib.rotated_nms(_fptr(dets), len(dets), float(iou_thr),
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return order[keep[:n]]
