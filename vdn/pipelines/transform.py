"""Host-side preprocessing (cv2/numpy), matching the reference transforms.

The reference preprocesses on CPU with cv2 (reference
depth_anything_v2/util/transform.py:5-157); resize math must match
bit-for-bit or depth-metric parity drifts, so we keep cv2 on the host here
too (a Pallas-fused device preprocess is a later optimization with its own
tolerance story).

Layout difference: vdn is NHWC, so PrepareForNet's HWC->CHW transpose
disappears.
"""

from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np

__all__ = ["compute_resize_hw", "preprocess_frame", "image2tensor_bgr",
           "IMAGENET_MEAN", "IMAGENET_STD", "adjust_input_size_for_ratio"]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _constrain_to_multiple_of(x: float, multiple: int, min_val: int = 0
                              ) -> int:
    y = int(np.round(x / multiple) * multiple)
    if y < min_val:
        y = int(np.ceil(x / multiple) * multiple)
    return y


def compute_resize_hw(height: int, width: int, target: int = 518,
                      multiple: int = 14) -> Tuple[int, int]:
    """'lower_bound' keep-aspect size selection
    (reference util/transform.py:62-107): scale so both sides >= target,
    rounded to a multiple of 14."""
    scale_h = target / height
    scale_w = target / width
    scale = max(scale_w, scale_h)
    new_h = _constrain_to_multiple_of(scale * height, multiple,
                                     min_val=target)
    new_w = _constrain_to_multiple_of(scale * width, multiple,
                                     min_val=target)
    return new_h, new_w


def adjust_input_size_for_ratio(height: int, width: int,
                                input_size: int = 518) -> int:
    """>16:9 inputs shrink the working size
    (reference video_depth_anything/video_depth.py:69-72)."""
    ratio = max(height, width) / min(height, width)
    if ratio > 1.78:
        input_size = int(input_size * 1.777 / ratio)
        input_size = round(input_size / 14) * 14
    return input_size


def preprocess_frame(frame_rgb: np.ndarray, input_size: int = 518
                     ) -> np.ndarray:
    """uint8/float RGB HWC frame -> normalized fp32 [h, w, 3] network input
    (resize INTER_CUBIC + ImageNet normalization)."""
    img = frame_rgb.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    new_h, new_w = compute_resize_hw(h, w, input_size)
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def image2tensor_bgr(raw_bgr: np.ndarray, input_size: int = 518
                     ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """BGR image (cv2.imread convention) -> ([1, h, w, 3], original (H, W))
    (reference depth_anything_v2.py:67-92)."""
    h, w = raw_bgr.shape[:2]
    rgb = cv2.cvtColor(raw_bgr, cv2.COLOR_BGR2RGB)
    return preprocess_frame(rgb, input_size)[None], (h, w)
