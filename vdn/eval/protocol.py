"""Per-sequence evaluation protocol (reference eval_depthcrafter/eval.py:55-151).

Given predicted disparity and GT depth for one sequence:
resize pred to GT resolution (cv2 bilinear), build the depth-range valid
mask, least-squares align pred to GT in disparity or depth domain, clip to
the dataset depth range, compute the metric suite.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import cv2
import numpy as np

from vdn.eval.metrics import (EVAL_METRICS, compute_metrics,
                              depth2disparity)

__all__ = ["eval_sequence"]


def eval_sequence(pred_disp: np.ndarray, gt_depth: np.ndarray,
                  seq_len: int = 98, domain: str = "depth",
                  dataset_min_depth: float = 1e-3,
                  dataset_max_depth: float = 70.0,
                  mask: Optional[np.ndarray] = None,
                  metrics: Sequence[str] = EVAL_METRICS
                  ) -> Dict[str, float]:
    """pred_disp [T, h, w], gt_depth [T, H, W] -> metric dict.

    domain='depth': align pred to 1/gt (disparity), evaluate in depth.
    domain='disp':  align and evaluate in disparity directly.
    """
    seq_len = min(seq_len, pred_disp.shape[0])
    resized = np.stack([
        cv2.resize(p.astype(np.float64),
                   (gt_depth.shape[-1], gt_depth.shape[-2]))
        for p in pred_disp[:seq_len]])
    gt = gt_depth[:seq_len].astype(np.float64)

    valid = (gt > dataset_min_depth) & (gt < dataset_max_depth)
    if mask is not None:
        valid &= mask[:seq_len].astype(bool)

    pred = np.clip(resized, dataset_min_depth, None)
    pred_masked = pred[valid].reshape(-1, 1)
    if domain == "disp":
        gt_masked = gt[valid].reshape(-1, 1)
    elif domain == "depth":
        gt_masked = 1.0 / (gt[valid].reshape(-1, 1) + 1e-8)
    else:
        raise ValueError(domain)

    a = np.concatenate([pred_masked, np.ones_like(pred_masked)], axis=-1)
    x = np.linalg.lstsq(a, gt_masked, rcond=None)[0]
    scale, shift = float(x[0].item()), float(x[1].item())

    aligned = np.clip(scale * pred + shift, dataset_min_depth, None)
    if domain == "depth":
        pred_depth = depth2disparity(aligned)
    else:
        pred_depth = aligned
    pred_depth = np.clip(pred_depth, dataset_min_depth, dataset_max_depth)

    return compute_metrics(pred_depth, gt, valid, metrics)
