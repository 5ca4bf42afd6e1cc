"""Closed-form least-squares scale/shift alignment.

Solves ``argmin_{s,t} sum(mask * (s*pred + t - target)^2)`` with the 2x2
normal equations, matching the reference solvers exactly:
- numpy host version (reference ``utils/util.py:40-62``) used by the video
  stitching pipeline,
- jnp version (reference ``loss/loss.py:74-96``) used inside losses, which
  adds a determinant==0 guard returning (1, 0) like the reference does.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["scale_and_shift_np", "scale_np", "scale_and_shift",
           "interpolate_frames_np"]


def scale_and_shift_np(prediction, target, mask):
    prediction = prediction.astype(np.float32)
    target = target.astype(np.float32)
    mask = mask.astype(np.float32)
    a_00 = np.sum(mask * prediction * prediction)
    a_01 = np.sum(mask * prediction)
    a_11 = np.sum(mask)
    b_0 = np.sum(mask * prediction * target)
    b_1 = np.sum(mask * target)
    det = a_00 * a_11 - a_01 * a_01
    if det == 0:
        return 1.0, 0.0
    return ((a_11 * b_0 - a_01 * b_1) / det, (-a_01 * b_0 + a_00 * b_1) / det)


def scale_np(prediction, target, mask):
    """Scale-only variant (reference utils/util.py:23-38)."""
    prediction = prediction.astype(np.float32)
    target = target.astype(np.float32)
    mask = mask.astype(np.float32)
    a_00 = np.sum(mask * prediction * prediction)
    b_0 = np.sum(mask * prediction * target)
    return b_0 / (a_00 + 1e-6)


def scale_and_shift(prediction: jnp.ndarray, target: jnp.ndarray,
                    mask: jnp.ndarray):
    """Batched jnp version: reduces over all axes but the leading batch axis.

    Returns (scale [B], shift [B]).  Degenerate systems (det==0) yield
    scale=1, shift=0 like the torch reference (loss/loss.py:84-96).
    """
    axes = tuple(range(1, prediction.ndim))
    m = mask.astype(jnp.float32)
    p = prediction.astype(jnp.float32)
    t = target.astype(jnp.float32)
    a_00 = jnp.sum(m * p * p, axis=axes)
    a_01 = jnp.sum(m * p, axis=axes)
    a_11 = jnp.sum(m, axis=axes)
    b_0 = jnp.sum(m * p * t, axis=axes)
    b_1 = jnp.sum(m * t, axis=axes)
    det = a_00 * a_11 - a_01 * a_01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    scale = jnp.where(valid, (a_11 * b_0 - a_01 * b_1) / safe_det, 1.0)
    shift = jnp.where(valid, (-a_01 * b_0 + a_00 * b_1) / safe_det, 0.0)
    return scale, shift


def interpolate_frames_np(frames_pre, frames_post):
    """Linear cross-fade between two equal-length frame lists
    (reference utils/util.py:65-74)."""
    assert len(frames_pre) == len(frames_post)
    n = len(frames_pre)
    step = 1.0 / (n - 1)
    weights = [0.0] + [i * step for i in range(1, n - 1)] + [1.0]
    return [frames_pre[i] * (1 - weights[i]) + frames_post[i] * weights[i]
            for i in range(n)]
