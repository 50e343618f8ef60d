"""ctypes wrapper for the native exact greedy NMS (native/exact_nms.cpp).

Builds the shared library on first use (g++, no external deps). Used by
host-side evaluation/export paths that want exact torchvision-greedy
semantics at native speed; falls back to the jitted exact-greedy
``ops.nms.box_nms_greedy`` when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libexact_nms.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB_PATH.exists():
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
                     "-o", str(_LIB_PATH), str(_NATIVE_DIR / "exact_nms.cpp")],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.exact_nms.restype = ctypes.c_int
            lib.exact_nms.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def exact_nms(prob: np.ndarray, size: int = 4, iou: float = 0.1,
              min_prob: float = 0.015, keep_top_k: int = 0) -> np.ndarray:
    """Exact greedy NMS on an (H, W) float heatmap -> NMS'd heatmap."""
    lib = _load()
    prob = np.ascontiguousarray(prob, np.float32)
    H, W = prob.shape
    if lib is None:
        import jax.numpy as jnp

        from spnerf_tpu.ops.nms import box_nms_greedy

        return np.asarray(box_nms_greedy(jnp.asarray(prob), size, iou,
                                         min_prob, keep_top_k))
    out = np.zeros_like(prob)
    lib.exact_nms(
        prob.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), H, W,
        float(size), float(iou), float(min_prob), int(keep_top_k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
