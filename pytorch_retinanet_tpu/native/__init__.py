"""Native (C++) host-side runtime ops, loaded via ctypes.

The reference's native layer is borrowed (torchvision's C++/CUDA NMS,
pycocotools' C extension — SURVEY.md §2.4); this package is the framework's
own: ``src/detection_native.cc`` compiled with g++ into a shared library and
bound through a plain C ABI (no pybind11 in this image; ctypes per the
environment contract).

The library is built on first use (``g++ -O3 -shared -fPIC``, ~1s) and cached
next to the source; every entry point has a pure-numpy fallback so the
framework degrades gracefully where no compiler exists.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "src", "detection_native.cc")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_detection_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[str]:
    # Build to a per-pid temp path then atomically rename, so a concurrent
    # process never CDLLs a half-written library.
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB_PATH)
        return _LIB_PATH
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logger.warning("native build failed (%s); using numpy fallbacks", e)
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _LIB_PATH if os.path.exists(_LIB_PATH) else _build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
            _bind(lib)
        except (OSError, AttributeError):
            # stale binary (another arch, or older source missing a symbol) —
            # rebuild once
            try:
                os.unlink(path)
            except OSError:
                pass
            path = _build()
            if path is None:
                _build_failed = True
                return None
            lib = ctypes.CDLL(path)
            _bind(lib)
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> None:
    """Declare argtypes for every entry point (raises AttributeError if the
    binary predates a symbol — caller rebuilds)."""
    c_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    c_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    c_u32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.box_iou_xyxy.argtypes = [c_f32, ctypes.c_int, c_f32, ctypes.c_int, c_f32]
    lib.nms_xyxy.argtypes = [c_f32, ctypes.c_int, ctypes.c_float, c_u8]
    lib.coco_iou_xywh.argtypes = [
        c_f64, ctypes.c_int, c_f64, ctypes.c_int, c_i32, c_f64,
    ]
    lib.coco_match.argtypes = [
        c_f64, ctypes.c_int, ctypes.c_int, c_f64, c_i32, c_f64,
        ctypes.c_int, c_i32, c_i32, c_u8,
    ]
    lib.rle_decode_runs.argtypes = [
        c_u32, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_u8,
    ]
    lib.rle_encode_mask.argtypes = [c_u8, ctypes.c_int, ctypes.c_int, c_u32]
    lib.rle_encode_mask.restype = ctypes.c_int
    lib.mask_iou.argtypes = [
        c_u8, ctypes.c_int, c_u8, ctypes.c_int, c_i32, ctypes.c_long, c_f64,
    ]


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------------- #
# Wrappers (native with numpy fallback)
# --------------------------------------------------------------------------- #
def nms_xyxy(boxes: np.ndarray, iou_thr: float) -> np.ndarray:
    """Greedy NMS keep-mask over score-descending XYXY boxes."""
    boxes = np.ascontiguousarray(boxes, np.float32).reshape(-1, 4)
    n = len(boxes)
    keep = np.zeros(n, np.uint8)
    lib = get_lib()
    if lib is not None:
        lib.nms_xyxy(boxes, n, float(iou_thr), keep)
        return keep.astype(bool)
    # numpy fallback
    out = np.ones(n, bool)
    for i in range(n):
        if not out[i]:
            continue
        ious = _iou_one_to_many(boxes[i], boxes[i + 1 :])
        out[i + 1 :] &= ~(ious > iou_thr)
    return out


def box_iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, np.float32).reshape(-1, 4)
    b = np.ascontiguousarray(b, np.float32).reshape(-1, 4)
    lib = get_lib()
    if lib is not None:
        out = np.zeros((len(a), len(b)), np.float32)
        lib.box_iou_xyxy(a, len(a), b, len(b), out)
        return out
    return np.stack([_iou_one_to_many(x, b) for x in a]) if len(a) else np.zeros((0, len(b)), np.float32)


def _iou_one_to_many(box: np.ndarray, others: np.ndarray) -> np.ndarray:
    if len(others) == 0:
        return np.zeros(0, np.float32)
    lo = np.maximum(box[:2], others[:, :2])
    hi = np.minimum(box[2:], others[:, 2:])
    inter = np.prod(np.maximum(hi - lo, 0), axis=1)
    area = np.prod(np.maximum(box[2:] - box[:2], 0))
    areas = np.prod(np.maximum(others[:, 2:] - others[:, :2], 0), axis=1)
    union = area + areas - inter
    return (inter / np.maximum(union, 1e-12)).astype(np.float32)


def coco_iou_xywh(dt: np.ndarray, gt: np.ndarray, crowd: np.ndarray) -> np.ndarray:
    dt = np.ascontiguousarray(dt, np.float64).reshape(-1, 4)
    gt = np.ascontiguousarray(gt, np.float64).reshape(-1, 4)
    crowd = np.ascontiguousarray(crowd, np.int32).reshape(-1)
    lib = get_lib()
    if lib is not None and len(dt) and len(gt):
        out = np.zeros((len(dt), len(gt)), np.float64)
        lib.coco_iou_xywh(dt, len(dt), gt, len(gt), crowd, out)
        return out
    from ..eval.coco_eval import bbox_iou_xywh

    return bbox_iou_xywh(dt, gt, crowd)


def rle_decode_runs(counts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Column-major COCO runs → row-major [h, w] uint8 mask."""
    counts = np.ascontiguousarray(counts, np.uint32).reshape(-1)
    lib = get_lib()
    if lib is not None:
        mask = np.zeros(h * w, np.uint8)
        lib.rle_decode_runs(counts, len(counts), h, w, mask)
        return mask.reshape(h, w)
    # numpy fallback: repeat alternating values, reshape column-major
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts.astype(np.int64))
    out = np.zeros(h * w, np.uint8)
    out[: len(flat)] = flat[: h * w]
    return out.reshape((w, h)).T.copy()


def rle_encode_mask(mask: np.ndarray) -> np.ndarray:
    """Row-major [h, w] binary mask → column-major COCO runs (uint32)."""
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    lib = get_lib()
    if lib is not None:
        counts = np.zeros(h * w + 1, np.uint32)
        m = lib.rle_encode_mask(mask, h, w, counts)
        return counts[:m].copy()
    flat = mask.T.reshape(-1)  # column-major
    changes = np.flatnonzero(np.diff(flat)) + 1
    bounds = np.concatenate([[0], changes, [flat.size]])
    runs = np.diff(bounds).astype(np.uint32)
    if flat.size and flat[0] == 1:  # runs must start with a 0-run
        runs = np.concatenate([[np.uint32(0)], runs])
    return runs


def mask_iou(dt: np.ndarray, gt: np.ndarray, crowd: np.ndarray) -> np.ndarray:
    """Pairwise binary-mask IoU, crowd GT using inter/dt_area
    (pycocotools maskUtils.iou segm semantics)."""
    dt = np.ascontiguousarray(dt, np.uint8)
    gt = np.ascontiguousarray(gt, np.uint8)
    crowd = np.ascontiguousarray(crowd, np.int32).reshape(-1)
    D, G = dt.shape[0], gt.shape[0]
    if D == 0 or G == 0:
        return np.zeros((D, G))
    hw = int(np.prod(dt.shape[1:]))
    lib = get_lib()
    if lib is not None:
        out = np.zeros((D, G), np.float64)
        lib.mask_iou(dt.reshape(D, hw), D, gt.reshape(G, hw), G, crowd, hw, out)
        return out
    d = dt.reshape(D, hw).astype(np.float64)
    g = gt.reshape(G, hw).astype(np.float64)
    inter = d @ g.T
    darea = d.sum(1, keepdims=True)
    garea = g.sum(1, keepdims=True).T
    union = np.where(crowd[None, :].astype(bool), darea, darea + garea - inter)
    return inter / np.maximum(union, 1e-12)


def coco_match(
    ious: np.ndarray, gt_ig: np.ndarray, crowd: np.ndarray, thrs: np.ndarray
):
    """The evaluator's greedy matcher: returns (dtm_idx, gtm_idx, dt_ig) with
    1-based matched indices (0 = unmatched). None if native lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    D, G = ious.shape
    T = len(thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ig = np.ascontiguousarray(gt_ig, np.float64)
    crowd = np.ascontiguousarray(crowd, np.int32)
    thrs = np.ascontiguousarray(thrs, np.float64)
    dtm = np.zeros((T, D), np.int32)
    gtm = np.zeros((T, G), np.int32)
    dt_ig = np.zeros((T, D), np.uint8)
    lib.coco_match(ious, D, G, gt_ig, crowd, thrs, T, dtm, gtm, dt_ig)
    return dtm, gtm, dt_ig
