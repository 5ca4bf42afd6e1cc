"""Streaming video depth: bounded-memory arbitrary-length clips.

Re-design of the reference streaming path
(reference video_depth_anything/video_depth_stream.py:76-160): the python
list of per-frame KV-cache tensors becomes a set of fixed-capacity device
ring buffers, so every step is a single jitted call with static shapes —
no host<->device cache traffic, HBM use is constant in clip length.

Policy replicated exactly (reference :57-59, :133-158):
- window = entries [0:2] + [-29:] of the logical list (31 entries; frame 0
  is a permanent anchor)
- after frame id >= 11, the second-oldest entry is evicted (gap=41)
Host keeps only the logical-slot indirection (a list of ints); cache tensors
never leave HBM.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vdn.ops.resize import resize2d
from vdn.pipelines.transform import (adjust_input_size_for_ratio,
                                     preprocess_frame)

INFER_LEN = 32
OVERLAP = 10
INTERP_LEN = 8
GAP = (INFER_LEN - OVERLAP) * 2 - 1 - (OVERLAP - INTERP_LEN)  # == 41
CAPACITY = GAP + 2  # max logical entries ever alive (43)


class VideoDepthStreamPipeline:
    def __init__(self, model, params, input_size: int = 518):
        self.model = model
        self.params = params
        self.default_input_size = input_size
        self.input_size: Optional[int] = None
        self.frame_hw: Optional[Tuple[int, int]] = None
        self.slots: List[int] = []       # logical order -> physical slot
        self.free: List[int] = []
        self.buffers = None              # tuple(8) of [B*N_i, CAP, C_i]
        self.id = -1

        def first(params, x):
            def run(m, x):
                f = m.forward_features(x)
                return m.forward_depth(f, x.shape)
            return model.apply(params, x, method=run)

        def step(params, x, buffers, sel, slot):
            """Decode one frame AND write its cache entry — one dispatch
            per frame (the tunnel's per-call latency dominates at batch 1,
            so fusing decode+write measurably helps)."""
            def run(m, x):
                caches = tuple(buf[:, sel] for buf in buffers)
                f = m.forward_features(x)
                return m.forward_depth(f, x.shape, caches=caches)
            depth, entries = model.apply(params, x, method=run)
            new_buffers = tuple(
                jax.lax.dynamic_update_slice(buf, e.astype(buf.dtype),
                                             (0, slot, 0))
                for buf, e in zip(buffers, entries))
            return depth, new_buffers

        self._first = jax.jit(first)
        self._step = jax.jit(step, donate_argnums=(2,))

    def reset(self):
        self.slots, self.free, self.buffers = [], [], None
        self.input_size = None
        self.frame_hw = None
        self.id = -1

    def _depth_to_numpy(self, depth) -> np.ndarray:
        h, w = self.frame_hw
        out = resize2d(np.asarray(depth)[..., None], (h, w),
                       "bilinear", align_corners=True)
        return np.asarray(out)[0, -1, :, :, 0]

    def infer_video_depth_one(self, frame: np.ndarray) -> np.ndarray:
        """frame: RGB HWC (uint8 or float 0-255) -> depth [H, W] fp32."""
        self.id += 1
        if self.input_size is None:
            h, w = frame.shape[:2]
            self.frame_hw = (h, w)
            self.input_size = adjust_input_size_for_ratio(
                h, w, self.default_input_size)
        else:
            assert frame.shape[:2] == self.frame_hw

        x = preprocess_frame(frame, self.input_size)[None, None]  # [1,1,h,w,3]

        if self.buffers is None:
            depth, entries = self._first(self.params, x)
            # replicate the first frame's cache across the initial window
            # (reference video_depth_stream.py:117)
            self.buffers = tuple(
                jnp.zeros((e.shape[0], CAPACITY, e.shape[2]), e.dtype)
                .at[:, :INFER_LEN].set(e) for e in entries)
            self.slots = list(range(INFER_LEN))
            self.free = list(range(INFER_LEN, CAPACITY))
        else:
            sel = self.slots[0:2] + self.slots[-(INFER_LEN - 3):]
            assert len(sel) == INFER_LEN - 1
            slot = self.free.pop()
            depth, self.buffers = self._step(
                self.params, x, self.buffers,
                jnp.asarray(sel, jnp.int32), jnp.asarray(slot, jnp.int32))
            self.slots.append(slot)

        # sliding-window eviction (reference :155-158)
        if self.id + INFER_LEN > GAP + 1:
            self.free.append(self.slots.pop(1))

        return self._depth_to_numpy(depth)
