"""Host-side SAM2 video predictor (reference sam2/sam2_video_predictor.py,
single-object tracking).

Orchestrates Sam2VideoModel per frame: prompts condition frame 0 through
the no-mem path, later frames cross-attend to a memory assembled from up to
``num_maskmem`` previous mask memories (+ conditioning frames at temporal
position 0) and object-pointer tokens with signed temporal encodings —
the reference's selection policy at eval stride 1
(sam2_base.py:522-556, :588-640)."""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vdn.models.sam2_video import Sam2VideoModel
from vdn.ops.resize import resize2d


class Sam2VideoPredictor:
    IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

    def __init__(self, model: Sam2VideoModel, params,
                 mask_threshold: float = 0.0):
        self.model = model
        self.params = params
        self.mask_threshold = mask_threshold
        m = model
        self._encode_raw = jax.jit(
            lambda p, x: m.apply(p, x, method=m.encode_image_raw))
        self._add_no_mem = jax.jit(
            lambda p, f: m.apply(p, f, method=m.add_no_mem))
        self._predict_pts = jax.jit(
            lambda p, f, pc, pl: m.apply(p, f, point_coords=pc,
                                         point_labels=pl,
                                         multimask_output=True,
                                         method=m.predict))
        self._predict_track = jax.jit(
            lambda p, f: m.apply(p, f, multimask_output=True,
                                 method=m.predict))
        self._condition = jax.jit(
            lambda p, f, mem, mem_pos, n: m.apply(
                p, f, mem, mem_pos, n, method=m.condition_features),
            static_argnums=(4,))
        self._encode_memory = jax.jit(
            lambda p, f, hm, obj: m.apply(p, f, hm, obj,
                                          method=m.encode_memory))
        self._maskmem_tpos = jax.jit(
            lambda p, pos, t: m.apply(p, pos, t,
                                      method=m.maskmem_pos_with_tpos),
            static_argnums=(2,))
        self._obj_tokens = jax.jit(
            lambda p, ptrs, td: m.apply(p, ptrs, td,
                                        method=m.obj_ptr_tokens))

    # ------------------------------------------------------------------
    def init_state(self, frames: np.ndarray) -> Dict:
        """frames [N, H, W, 3] RGB uint8/float."""
        s = self.model.image_size
        import cv2
        proc = np.stack([
            (cv2.resize(f.astype(np.float32) / 255.0, (s, s),
                        interpolation=cv2.INTER_LINEAR)
             - self.IMAGENET_MEAN) / self.IMAGENET_STD
            for f in frames])
        return {
            "images": proc,
            "orig_hw": frames.shape[1:3],
            "num_frames": len(frames),
            "features": {},          # frame_idx -> raw feature dict
            "cond_outputs": {},      # frame_idx -> output dict
            "non_cond_outputs": {},
        }

    def _features(self, state, frame_idx):
        if frame_idx not in state["features"]:
            state["features"][frame_idx] = self._encode_raw(
                self.params, state["images"][frame_idx][None])
        return state["features"][frame_idx]

    def _store(self, state, frame_idx, feats, high_res_masks, obj_ptr,
               obj_logits, cond: bool):
        maskmem_feat, maskmem_pos = self._encode_memory(
            self.params, feats, high_res_masks, obj_logits)
        out = {"maskmem_features": maskmem_feat,
               "maskmem_pos_enc": maskmem_pos, "obj_ptr": obj_ptr}
        (state["cond_outputs"] if cond
         else state["non_cond_outputs"])[frame_idx] = out

    def _best_mask(self, low_res, high_res, ious):
        best = int(np.argmax(np.asarray(ious)[0]))
        return high_res[:, best:best + 1]

    def _mask_to_original(self, state, high_res_mask) -> np.ndarray:
        h, w = state["orig_hw"]
        m = resize2d(np.asarray(high_res_mask).transpose(0, 2, 3, 1),
                     (h, w), "bilinear", align_corners=False)
        return np.asarray(m)[0, :, :, 0] > self.mask_threshold

    # ------------------------------------------------------------------
    def add_new_points(self, state: Dict, frame_idx: int,
                       points, labels) -> np.ndarray:
        """Prompt a conditioning frame; returns the mask at original res."""
        h, w = state["orig_hw"]
        s = self.model.image_size
        pc = np.asarray(points, np.float32)[None] * np.array(
            [s / w, s / h], np.float32)
        pl = np.asarray(labels, np.float32)[None]
        feats = self._features(state, frame_idx)
        cond_feats = self._add_no_mem(self.params, feats)
        low, high, ious, obj_ptr, obj_logits = self._predict_pts(
            self.params, cond_feats, pc, pl)
        best_high = self._best_mask(low, high, ious)
        self._store(state, frame_idx, feats, best_high, obj_ptr,
                    obj_logits, cond=True)
        return self._mask_to_original(state, best_high)

    def _assemble_memory(self, state, frame_idx
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        model = self.model
        mems, poss = [], []
        # conditioning frames at temporal position 0
        cond = state["cond_outputs"]
        for t, out in sorted(cond.items()):
            f = out["maskmem_features"]
            p = self._maskmem_tpos(self.params, out["maskmem_pos_enc"], 0)
            b, hh, ww, c = f.shape
            mems.append(np.asarray(f).reshape(b, hh * ww, c))
            poss.append(np.asarray(p).reshape(b, hh * ww, c))
        # previous frames at temporal positions 1..num_maskmem-1
        # (eval stride 1: prev_frame_idx = frame_idx - t_rel)
        for t_pos in range(1, model.num_maskmem):
            t_rel = model.num_maskmem - t_pos
            prev_idx = frame_idx - t_rel
            out = state["non_cond_outputs"].get(prev_idx)
            if out is None:
                continue
            f = out["maskmem_features"]
            p = self._maskmem_tpos(self.params, out["maskmem_pos_enc"],
                                   t_pos)
            b, hh, ww, c = f.shape
            mems.append(np.asarray(f).reshape(b, hh * ww, c))
            poss.append(np.asarray(p).reshape(b, hh * ww, c))
        # object pointers: past conditioning frames + previous frames
        pos_and_ptrs = [(frame_idx - t, out["obj_ptr"])
                        for t, out in sorted(cond.items())
                        if t <= frame_idx]
        max_ptrs = min(state["num_frames"], model.max_obj_ptrs_in_encoder)
        for t_diff in range(1, max_ptrs):
            t = frame_idx - t_diff
            if t < 0:
                break
            out = state["non_cond_outputs"].get(t)
            if out is not None:
                pos_and_ptrs.append((t_diff, out["obj_ptr"]))
        n_obj_tokens = 0
        if pos_and_ptrs:
            t_diffs = jnp.asarray([p for p, _ in pos_and_ptrs],
                                  jnp.float32)
            ptrs = jnp.concatenate([ptr for _, ptr in pos_and_ptrs],
                                   axis=0)
            tokens, tok_pos = self._obj_tokens(self.params, ptrs, t_diffs)
            n_obj_tokens = tokens.shape[0]
            mems.append(np.asarray(tokens)[None])
            poss.append(np.asarray(tok_pos)[None])
        memory = jnp.asarray(np.concatenate(mems, axis=1))
        memory_pos = jnp.asarray(np.concatenate(poss, axis=1))
        return memory, memory_pos, n_obj_tokens

    def propagate(self, state: Dict, start: Optional[int] = None,
                  end: Optional[int] = None):
        """Yield (frame_idx, mask) for frames after the conditioning
        frame(s) (reference propagate_in_video)."""
        first_cond = min(state["cond_outputs"])
        start = first_cond + 1 if start is None else start
        end = state["num_frames"] if end is None else end
        for t in range(start, end):
            feats = self._features(state, t)
            memory, memory_pos, n_obj = self._assemble_memory(state, t)
            cond_feats = self._condition(self.params, feats, memory,
                                         memory_pos, n_obj)
            low, high, ious, obj_ptr, obj_logits = self._predict_track(
                self.params, cond_feats)
            best_high = self._best_mask(low, high, ious)
            self._store(state, t, feats, best_high, obj_ptr, obj_logits,
                        cond=False)
            yield t, self._mask_to_original(state, best_high)
