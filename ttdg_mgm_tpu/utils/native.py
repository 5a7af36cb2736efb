"""ctypes bindings to the native host library (``native/libttdg_native.so``).

Provides accelerated host-side RLE decode, mask pasting and Dice counting —
the roles pycocotools' C extension and d2's paste kernels play for the
reference (SURVEY.md section 2.3).  Falls back to the NumPy implementations
when the shared library is absent; ``build_native()`` compiles it with g++.

All entry points are drop-in compatible with their numpy twins
(``utils.rle``, ``ops.mask_paste``) and are covered by parity tests.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libttdg_native.so"))


def build_native(force: bool = False) -> bool:
    """Compile the native library (g++). Returns True on success."""
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)], check=True,
                       capture_output=True)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO_PATH) and not build_native():
        _LIB = False
        return _LIB
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.rle_decode_counts.restype = ctypes.c_int
        lib.rle_encode_counts.restype = ctypes.c_int64
        lib.paste_mask.restype = None
        lib.mask_counts.restype = None
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def available() -> bool:
    return bool(_load())


def rle_decode_counts(counts, h: int, w: int) -> np.ndarray:
    lib = _load()
    counts = np.ascontiguousarray(counts, np.int64)
    out = np.zeros((h, w), np.uint8)
    if not lib:
        from ttdg_mgm_tpu.utils.rle import rle_decode

        return rle_decode({"size": [h, w], "counts": counts.tolist()})
    rc = lib.rle_decode_counts(
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(counts)), ctypes.c_int64(h), ctypes.c_int64(w),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError("invalid RLE counts")
    return out


def rle_encode_counts(mask: np.ndarray) -> list:
    lib = _load()
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    if not lib:
        from ttdg_mgm_tpu.utils.rle import rle_encode, _decode_counts_string

        return _decode_counts_string(rle_encode(mask)["counts"])
    buf = np.zeros(h * w + 1, np.int64)
    n = lib.rle_encode_counts(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(h), ctypes.c_int64(w),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return buf[:n].tolist()


def paste_masks_native(masks: np.ndarray, boxes: np.ndarray, height: int,
                       width: int, threshold: float = 0.5) -> np.ndarray:
    lib = _load()
    if not lib:
        from ttdg_mgm_tpu.ops.mask_paste import paste_masks_np

        return paste_masks_np(masks, boxes, height, width, threshold)
    masks = np.ascontiguousarray(masks, np.float32)
    out = np.zeros((len(masks), height, width), np.uint8)
    for k in range(len(masks)):
        x1, y1, x2, y2 = (float(v) for v in boxes[k])
        lib.paste_mask(
            masks[k].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(masks.shape[-1]),
            ctypes.c_float(x1), ctypes.c_float(y1), ctypes.c_float(x2),
            ctypes.c_float(y2), ctypes.c_float(threshold),
            ctypes.c_int64(height), ctypes.c_int64(width),
            out[k].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return out


def dice_native(a: np.ndarray, b: np.ndarray) -> float:
    lib = _load()
    if not lib:
        from ttdg_mgm_tpu.evaluation.dice import dice_coefficient

        return dice_coefficient(a, b)
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    inter = ctypes.c_int64()
    sa = ctypes.c_int64()
    sb = ctypes.c_int64()
    lib.mask_counts(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(a.size), ctypes.byref(inter), ctypes.byref(sa),
        ctypes.byref(sb),
    )
    return float(2.0 * inter.value / (sa.value + sb.value + 1e-6))
