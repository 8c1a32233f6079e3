"""ctypes bindings for the native (C++) evaluation kernels.

Builds `native/libm3deval.so` on demand with g++ (no pybind11 needed) and
exposes the rotated-IoU / matching primitives. Falls back silently when the
toolchain is unavailable — callers check `available()`.

Set M3DSSD_NO_NATIVE=1 to force the pure-Python path (used by parity tests).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
# M3DSSD_NATIVE_DIR overrides the package-relative location: a run-dir
# source snapshot (utils/source_snapshot.py) carries only the Python
# package, so scripts/test.py points this at the live repo's native/ —
# otherwise snapshot-based eval would silently lose the C++ fast path.
_SRC_DIR = os.environ.get("M3DSSD_NATIVE_DIR") or os.path.join(_ROOT,
                                                               "native")
_SO = os.path.join(_SRC_DIR, "build", "libm3deval.so")

_D = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
_I = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True, text=True)
        return True
    except Exception as e:  # noqa: BLE001
        logging.warning("native eval build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("M3DSSD_NO_NATIVE"):
            return None
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) <
                os.path.getmtime(os.path.join(_SRC_DIR, "m3deval.cpp"))):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logging.warning("native eval load failed: %s", e)
            return None

        lib.rotated_iou.argtypes = [_D, ctypes.c_int64, _D, ctypes.c_int64,
                                    ctypes.c_int, _D]
        lib.d3_box_overlap.argtypes = [_D, ctypes.c_int64, _D,
                                       ctypes.c_int64, ctypes.c_int, _D]
        lib.image_box_overlap.argtypes = [_D, ctypes.c_int64, _D,
                                          ctypes.c_int64, ctypes.c_int, _D]
        lib.compute_statistics.argtypes = [
            _D, _D, ctypes.c_int64, _D, ctypes.c_int64, _I, _I, _D,
            ctypes.c_int64, ctypes.c_int, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int, _D, ctypes.c_void_p]
        lib.compute_statistics.restype = ctypes.c_int64
        lib.fused_statistics.argtypes = [
            _D, _D, ctypes.c_int64, _D, ctypes.c_int64, _I, _I, _D,
            ctypes.c_int64, ctypes.c_int, ctypes.c_double, _D,
            ctypes.c_int64, ctypes.c_int, _D]
        _LIB = lib
        logging.info("native eval engine loaded (%s)", _SO)
        return _LIB


def available() -> bool:
    return _load() is not None


def _c(a, dtype=np.float64):
    return np.ascontiguousarray(np.asarray(a, dtype=dtype))


def rotated_iou(boxes, qboxes, criterion=-1):
    lib = _load()
    boxes = _c(boxes)
    qboxes = _c(qboxes)
    out = np.zeros([boxes.shape[0], qboxes.shape[0]])
    if boxes.size and qboxes.size:
        lib.rotated_iou(boxes, boxes.shape[0], qboxes, qboxes.shape[0],
                        criterion, out)
    return out


def d3_box_overlap(boxes, qboxes, criterion=-1):
    lib = _load()
    boxes = _c(boxes)
    qboxes = _c(qboxes)
    out = np.zeros([boxes.shape[0], qboxes.shape[0]])
    if boxes.size and qboxes.size:
        lib.d3_box_overlap(boxes, boxes.shape[0], qboxes, qboxes.shape[0],
                           criterion, out)
    return out


def image_box_overlap(boxes, qboxes, criterion=-1):
    lib = _load()
    boxes = _c(boxes)
    qboxes = _c(qboxes)
    out = np.zeros([boxes.shape[0], qboxes.shape[0]])
    if boxes.size and qboxes.size:
        lib.image_box_overlap(boxes, boxes.shape[0], qboxes, qboxes.shape[0],
                              criterion, out)
    return out


def compute_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                       dc_bboxes, metric, min_overlap, thresh=0.0,
                       compute_fp=False, compute_aos=False):
    """Native twin of kitti_eval.compute_statistics (same signature/returns)."""
    lib = _load()
    ngt = gt_datas.shape[0]
    ndt = dt_datas.shape[0]
    overlaps = _c(overlaps)
    gt = _c(gt_datas)
    dt = _c(dt_datas)
    ig = _c(ignored_gt, np.int64)
    idt = _c(ignored_det, np.int64)
    dc = _c(dc_bboxes).reshape(-1, 4) if np.asarray(dc_bboxes).size \
        else np.zeros([0, 4])
    out4 = np.zeros(4)
    th = np.zeros(max(ngt, 1))
    nth = lib.compute_statistics(
        overlaps, gt, ngt, dt, ndt, ig, idt, dc, dc.shape[0], metric,
        min_overlap, thresh, int(compute_fp), int(compute_aos), out4,
        th.ctypes.data_as(ctypes.c_void_p))
    return (int(out4[0]), int(out4[1]), int(out4[2]), float(out4[3]),
            th[:nth].copy())


def fused_statistics(overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                     dc_bboxes, metric, min_overlap, thresholds,
                     compute_aos, pr):
    """Accumulate tp/fp/fn/similarity into pr [nthresh,4] for one image."""
    lib = _load()
    dc = _c(dc_bboxes).reshape(-1, 4) if np.asarray(dc_bboxes).size \
        else np.zeros([0, 4])
    thresholds = _c(thresholds)
    lib.fused_statistics(
        _c(overlaps), _c(gt_datas), gt_datas.shape[0], _c(dt_datas),
        dt_datas.shape[0], _c(ignored_gt, np.int64),
        _c(ignored_det, np.int64), dc, dc.shape[0], metric, min_overlap,
        thresholds, len(thresholds), int(compute_aos), pr)
