"""Native (C++) host-side runtime components, bound via ctypes.

Builds ``libscan_native.so`` from preprocess.cpp on first import (g++ -O3);
every entry point has a pure-Python fallback so the framework works without
a toolchain. Exposes:

  * preprocess_image: fused resize + BGR255 normalize + pad (loader hot path)
  * nms_cpu:          greedy '+1'-convention NMS (host-side utility)
  * iou_matrix_xywh:  crowd-aware IoU matrix (COCO evaluator inner loop)
"""

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("scan_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB_PATH = os.path.join(_HERE, "libscan_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH, "-lpng", "-ljpeg", "-lz",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None.

    ``SCAN_TPU_NO_NATIVE=1`` disables it (pure-Python/PIL fallbacks
    everywhere) — used by tools/loader_bench.py for the native-vs-PIL
    scaling A/B and as an escape hatch on hosts with a broken toolchain.
    """
    global _lib, _tried
    if os.environ.get("SCAN_TPU_NO_NATIVE") == "1":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
            ):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.preprocess_image.restype = ctypes.c_int
            lib.preprocess_image.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.resize_image_u8.restype = ctypes.c_int
            lib.resize_image_u8.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.nms_cpu.restype = ctypes.c_int
            lib.nms_cpu.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_void_p,
            ]
            lib.iou_matrix_xywh.restype = None
            lib.iou_matrix_xywh.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.decode_image.restype = ctypes.c_int
            lib.decode_image.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            _lib = lib
            logger.info("native library loaded: %s", _LIB_PATH)
        except Exception as e:  # pragma: no cover - toolchain missing
            logger.warning("native library unavailable (%s); using fallbacks", e)
            _lib = None
        return _lib


def preprocess_image(src: np.ndarray, out: np.ndarray, oh: int, ow: int,
                     mean, std, to_bgr255: bool) -> bool:
    """Fused resize+normalize into the padded `out` buffer. Returns False if
    the native path is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    src = np.ascontiguousarray(src, np.uint8)
    assert out.dtype == np.float32 and out.flags.c_contiguous
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    ih, iw = src.shape[:2]
    dh, dw = out.shape[:2]
    rc = lib.preprocess_image(
        src.ctypes.data, ih, iw, out.ctypes.data, dh, dw, oh, ow,
        mean.ctypes.data, std.ctypes.data, int(to_bgr255),
    )
    return rc == 0


def resize_image_u8(src: np.ndarray, out: np.ndarray, oh: int, ow: int) -> bool:
    """PIL-equivalent resize into a padded uint8 buffer; False -> fallback."""
    lib = get_lib()
    if lib is None:
        return False
    src = np.ascontiguousarray(src, np.uint8)
    assert out.dtype == np.uint8 and out.flags.c_contiguous
    ih, iw = src.shape[:2]
    dh, dw = out.shape[:2]
    rc = lib.resize_image_u8(
        src.ctypes.data, ih, iw, out.ctypes.data, dh, dw, oh, ow
    )
    return rc == 0


def nms_cpu(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
            labels=None) -> np.ndarray:
    lib = get_lib()
    n = boxes.shape[0]
    if lib is None or n == 0:
        raise RuntimeError("native nms unavailable")
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    use_labels = labels is not None
    labels = np.ascontiguousarray(
        labels if use_labels else np.zeros(n), np.int32
    )
    keep = np.zeros(n, np.uint8)
    lib.nms_cpu(
        boxes.ctypes.data, scores.ctypes.data, labels.ctypes.data, n,
        float(iou_threshold), int(use_labels), keep.ctypes.data,
    )
    return keep.astype(bool)


def iou_matrix_xywh(det: np.ndarray, gt: np.ndarray,
                    iscrowd: np.ndarray):
    """Returns (nd, ng) IoU matrix or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    det = np.ascontiguousarray(det, np.float32)
    gt = np.ascontiguousarray(gt, np.float32)
    iscrowd = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.zeros((det.shape[0], gt.shape[0]), np.float64)
    lib.iou_matrix_xywh(
        det.ctypes.data, det.shape[0], gt.ctypes.data, gt.shape[0],
        iscrowd.ctypes.data, out.ctypes.data,
    )
    return out


def decode_image(data: bytes):
    """Decode PNG/JPEG bytes to an (h, w, 3) RGB uint8 array, or None if
    the native library is unavailable or the format is unsupported (caller
    falls back to PIL). Runs with the GIL released — PIL's PNG decode
    holds it ~50-100 ms per 2MP frame, serialising loader threads."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.decode_image(data, len(data), None, ctypes.byref(h),
                        ctypes.byref(w), 1) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.decode_image(data, len(data), out.ctypes.data, ctypes.byref(h),
                        ctypes.byref(w), 0) != 0:
        return None
    return out
