"""Host-side SAM2 video predictor (reference sam2/sam2_video_predictor.py).

Orchestrates Sam2VideoModel per frame and per object.  Each object is
tracked independently on its own memory dicts exactly like the reference
(batch_size=1 slices, sam2_video_predictor.py:125-230); frames receiving
prompts condition through the no-mem path, later frames cross-attend to a
memory assembled from up to ``num_maskmem`` mask memories (conditioning
frames at temporal position 0) plus object-pointer tokens with signed
temporal encodings — the reference's eval-stride-1 selection policy
(sam2_base.py:522-556, :588-640), mirrored for reverse tracking.

Supported prompt/tracking surface (reference parity):
- point/box prompts, incl. correction clicks on already-tracked frames
  (previous mask logits fed back into the decoder, predictor :252-264)
- mask-input prompts (add_new_mask -> SAM2Base._use_mask_as_output)
- forward and reverse propagation (propagate_in_video reverse=True)
- multiple objects per video (per-object state, outputs per frame are
  {obj_id: mask})

Divergence (documented): memory is encoded when an output is stored
rather than deferred to propagate() — equivalent under the default
``non_overlap_masks_for_mem_enc=False`` config the reference evals with.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

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
            lambda p, f, pc, pl, mi, mm: m.apply(
                p, f, point_coords=pc, point_labels=pl, mask_input=mi,
                multimask_output=mm, method=m.predict),
            static_argnums=(5,))
        self._predict_track = jax.jit(
            lambda p, f: m.apply(p, f, multimask_output=True,
                                 method=m.predict))
        self._use_mask = jax.jit(
            lambda p, f, mi: m.apply(p, f, mi, method=m.use_mask_as_output))
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
            "objects": {},           # obj_id -> per-object tracking state
        }

    def _obj(self, state, obj_id) -> Dict:
        if obj_id not in state["objects"]:
            state["objects"][obj_id] = {
                "cond_outputs": {},      # frame_idx -> stored output
                "non_cond_outputs": {},
                "point_inputs": {},      # frame_idx -> (coords, labels)
                "frames_tracked": {},    # frame_idx -> {"reverse": bool}
            }
        return state["objects"][obj_id]

    def _features(self, state, frame_idx):
        if frame_idx not in state["features"]:
            state["features"][frame_idx] = self._encode_raw(
                self.params, state["images"][frame_idx][None])
        return state["features"][frame_idx]

    def _store(self, state, obj, frame_idx, high_res_masks, low_res_masks,
               obj_ptr, obj_logits, cond: bool):
        feats = self._features(state, frame_idx)
        maskmem_feat, maskmem_pos = self._encode_memory(
            self.params, feats, high_res_masks, obj_logits)
        out = {"maskmem_features": maskmem_feat,
               "maskmem_pos_enc": maskmem_pos, "obj_ptr": obj_ptr,
               "pred_masks": np.asarray(low_res_masks)}
        (obj["cond_outputs"] if cond
         else obj["non_cond_outputs"])[frame_idx] = out

    def _best_mask(self, low_res, high_res, ious):
        best = int(np.argmax(np.asarray(ious)[0]))
        return high_res[:, best:best + 1], low_res[:, best:best + 1]

    def _mask_to_original(self, state, low_res_mask) -> np.ndarray:
        """Reference outputs upsample the LOW-res logits to video res
        (sam2_video_predictor.py:387-407 _get_orig_video_res_output)."""
        h, w = state["orig_hw"]
        m = resize2d(np.asarray(low_res_mask, np.float32
                                ).transpose(0, 2, 3, 1),
                     (h, w), "bilinear", align_corners=False)
        return np.asarray(m)[0, :, :, 0] > self.mask_threshold

    # ------------------------------------------------------------------
    def add_new_points(self, state: Dict, frame_idx: int,
                       points=None, labels=None, obj_id=0, box=None,
                       clear_old_points: bool = True) -> np.ndarray:
        """Point/box prompt on a frame for one object; returns the mask at
        original resolution (reference add_new_points_or_box:161-290).
        A box is encoded as two corner points with labels 2/3.  On frames
        already tracked, the previous mask logits are fed back into the
        decoder (correction clicks)."""
        obj = self._obj(state, obj_id)
        h, w = state["orig_hw"]
        s = self.model.image_size
        scale = np.array([s / w, s / h], np.float32)
        pts, lbls = [], []
        if box is not None:
            assert clear_old_points, "box prompts require clear_old_points"
            pts.append(np.asarray(box, np.float32).reshape(2, 2) * scale)
            lbls.append(np.asarray([2.0, 3.0], np.float32))
        if points is not None:
            pts.append(np.asarray(points, np.float32) * scale)
            lbls.append(np.asarray(labels, np.float32))
        pc = np.concatenate(pts, axis=0)
        pl = np.concatenate(lbls, axis=0)
        if not clear_old_points and frame_idx in obj["point_inputs"]:
            pc0, pl0 = obj["point_inputs"][frame_idx]
            pc = np.concatenate([pc0, pc], axis=0)
            pl = np.concatenate([pl0, pl], axis=0)
        obj["point_inputs"][frame_idx] = (pc, pl)

        is_init = frame_idx not in obj["frames_tracked"]
        reverse = (False if is_init
                   else obj["frames_tracked"][frame_idx]["reverse"])
        # previous mask logits on this frame -> decoder mask input
        # (reference :252-264, clamped to [-32, 32])
        prev = (obj["cond_outputs"].get(frame_idx)
                or obj["non_cond_outputs"].get(frame_idx))
        mask_input = None
        if prev is not None:
            mask_input = np.clip(prev["pred_masks"], -32.0, 32.0)
            mask_input = mask_input.transpose(0, 2, 3, 1)  # NHWC

        feats = self._features(state, frame_idx)
        if is_init:
            cond_feats = self._add_no_mem(self.params, feats)
        else:
            memory, memory_pos, n_obj = self._assemble_memory(
                state, obj, frame_idx, reverse)
            cond_feats = self._condition(self.params, feats, memory,
                                         memory_pos, n_obj)
        # multimask only for 0..1 effective points (sam2_base._use_multimask
        # with multimask_min/max_pt_num = 0/1)
        multimask = pl.shape[0] <= 1
        low, high, ious, obj_ptr, obj_logits = self._predict_pts(
            self.params, cond_feats, pc[None], pl[None], mask_input,
            multimask)
        best_high, best_low = self._best_mask(low, high, ious)
        self._store(state, obj, frame_idx, best_high, best_low, obj_ptr,
                    obj_logits, cond=True)
        return self._mask_to_original(state, best_low)

    def add_new_mask(self, state: Dict, frame_idx: int, mask: np.ndarray,
                     obj_id=0) -> np.ndarray:
        """Binary mask prompt (reference add_new_mask:300-383 ->
        SAM2Base._use_mask_as_output)."""
        obj = self._obj(state, obj_id)
        s = self.model.image_size
        m = np.asarray(mask).astype(np.float32)[None, None]  # [1,1,H,W]
        if m.shape[-2:] != (s, s):
            m = np.asarray(resize2d(m.transpose(0, 2, 3, 1), (s, s),
                                    "bilinear_aa", False)
                           ).transpose(0, 3, 1, 2)
            m = (m >= 0.5).astype(np.float32)
        obj["point_inputs"].pop(frame_idx, None)
        feats = self._features(state, frame_idx)
        low, high, ious, obj_ptr, obj_logits = self._use_mask(
            self.params, feats, jnp.asarray(m))
        self._store(state, obj, frame_idx, high, low, obj_ptr, obj_logits,
                    cond=True)
        return self._mask_to_original(state, low)

    # ------------------------------------------------------------------
    def _assemble_memory(self, state, obj, frame_idx, reverse: bool
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
        model = self.model
        sign = -1 if reverse else 1
        mems, poss = [], []
        # conditioning frames at temporal position 0
        cond = obj["cond_outputs"]
        for t, out in sorted(cond.items()):
            f = out["maskmem_features"]
            p = self._maskmem_tpos(self.params, out["maskmem_pos_enc"], 0)
            b, hh, ww, c = f.shape
            mems.append(np.asarray(f).reshape(b, hh * ww, c))
            poss.append(np.asarray(p).reshape(b, hh * ww, c))
        # nearest frames at temporal positions 1..num_maskmem-1, mirrored
        # when tracking in reverse (reference :536-560, eval stride 1)
        for t_pos in range(1, model.num_maskmem):
            t_rel = model.num_maskmem - t_pos
            prev_idx = frame_idx - sign * t_rel
            out = obj["non_cond_outputs"].get(prev_idx)
            if out is None:
                continue
            f = out["maskmem_features"]
            p = self._maskmem_tpos(self.params, out["maskmem_pos_enc"],
                                   t_pos)
            b, hh, ww, c = f.shape
            mems.append(np.asarray(f).reshape(b, hh * ww, c))
            poss.append(np.asarray(p).reshape(b, hh * ww, c))
        # object pointers: conditioning frames in the tracking past, then
        # up to max_obj_ptrs-1 previous tracked frames; temporal offsets are
        # signed by tracking direction (reference :588-640, sam2.1
        # use_signed_tpos_enc_to_obj_ptrs)
        pos_and_ptrs = [(sign * (frame_idx - t), out["obj_ptr"])
                        for t, out in sorted(cond.items())
                        if (t >= frame_idx if reverse else t <= frame_idx)]
        max_ptrs = min(state["num_frames"], model.max_obj_ptrs_in_encoder)
        for t_diff in range(1, max_ptrs):
            t = frame_idx - sign * t_diff
            if t < 0 or t >= state["num_frames"]:
                break
            out = obj["non_cond_outputs"].get(t)
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

    def _track_one(self, state, obj, frame_idx, reverse: bool):
        feats = self._features(state, frame_idx)
        memory, memory_pos, n_obj = self._assemble_memory(
            state, obj, frame_idx, reverse)
        cond_feats = self._condition(self.params, feats, memory,
                                     memory_pos, n_obj)
        low, high, ious, obj_ptr, obj_logits = self._predict_track(
            self.params, cond_feats)
        best_high, best_low = self._best_mask(low, high, ious)
        self._store(state, obj, frame_idx, best_high, best_low, obj_ptr,
                    obj_logits, cond=False)
        return best_low

    def propagate(self, state: Dict, start: Optional[int] = None,
                  end: Optional[int] = None, reverse: bool = False):
        """Yield (frame_idx, {obj_id: mask}) over the processing order
        (reference propagate_in_video:536-632).  Forward runs start..end-1;
        reverse runs start..0 descending.  Frames holding conditioning
        outputs for an object re-yield the stored mask."""
        objects = state["objects"]
        assert objects, "no prompts added"
        first_cond = min(t for o in objects.values()
                         for t in o["cond_outputs"])
        if start is None:
            start = first_cond
        if reverse:
            order = range(start, -1, -1) if start > 0 else []
        else:
            stop = state["num_frames"] if end is None else end
            order = range(start, stop)
        for t in order:
            masks = {}
            for obj_id, obj in objects.items():
                if t in obj["cond_outputs"]:
                    low = obj["cond_outputs"][t]["pred_masks"]
                else:
                    existing = obj["non_cond_outputs"].get(t)
                    if existing is not None and t in obj["frames_tracked"]:
                        low = existing["pred_masks"]
                    else:
                        low = self._track_one(state, obj, t, reverse)
                obj["frames_tracked"][t] = {"reverse": reverse}
                masks[obj_id] = self._mask_to_original(state, low)
            yield t, masks
