"""Connected-components labeling for mask postprocessing.

Replaces the reference CUDA kernel (reference
sam2/csrc/connected_components.cu:1-289, wrapper sam2/utils/misc.py:47-63):
8-connectivity labels + per-pixel component areas over binary masks.

Primary backend: the native C++ union-find (native/connected_components.cc)
via ctypes — compiled on first use, cached under native/.  Fallback: scipy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvdn_ccl.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "connected_components.cc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _load_native() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_SRC_PATH)
                    > os.path.getmtime(_LIB_PATH)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH,
                     _SRC_PATH], check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.vdn_connected_components.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.vdn_connected_components.restype = None
            _lib = lib
        except Exception:
            _lib_failed = True
        return _lib


def get_connected_components(mask: np.ndarray
                             ) -> Tuple[np.ndarray, np.ndarray]:
    """mask [N, H, W] (or [N, 1, H, W]) binary -> (labels, areas), same
    shape int32; labels are per-image 1-based for foreground, 0 for
    background; areas carry the component size at every pixel."""
    squeeze = mask.ndim == 4
    if squeeze:
        mask = mask[:, 0]
    m = np.ascontiguousarray(mask.astype(np.uint8))
    n, h, w = m.shape
    labels = np.zeros((n, h, w), np.int32)
    areas = np.zeros((n, h, w), np.int32)

    lib = _load_native()
    if lib is not None:
        lib.vdn_connected_components(
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    else:  # scipy fallback
        from scipy import ndimage
        structure = np.ones((3, 3), np.int32)
        for i in range(n):
            lab, num = ndimage.label(m[i], structure=structure)
            labels[i] = lab
            if num:
                counts = np.bincount(lab.ravel())
                counts[0] = 0
                areas[i] = counts[lab]
    if squeeze:
        return labels[:, None], areas[:, None]
    return labels, areas


def fill_holes_in_mask_scores(mask: np.ndarray, max_area: int) -> np.ndarray:
    """Flip small negative regions to a small positive score — the
    reference's hole-filling postprocess (sam2/utils/misc.py:309-325)."""
    assert max_area > 0
    input_mask = mask
    _, areas = get_connected_components(mask <= 0)
    is_hole = (areas > 0) & (areas <= max_area)
    return np.where(is_hole, 0.1, input_mask)


def remove_small_sprinkles(mask: np.ndarray, max_area: int) -> np.ndarray:
    """Remove small positive regions (sam2/sam2_video_predictor postproc)."""
    _, areas = get_connected_components(mask > 0)
    is_sprinkle = (areas > 0) & (areas <= max_area)
    return np.where(is_sprinkle, -0.1 if mask.dtype.kind == "f" else 0,
                    mask)
