"""Legacy SAM2 video predictor API (reference
sam2/sam2_video_predictor_legacy.py, 1172 LoC).

The legacy predictor differs from the modern per-object API
(vdn/pipelines/sam2_video.py) in three observable ways:

1. **Consolidated multi-object state** — prompts are staged in temporary
   per-object dicts and consolidated when propagation starts
   (``propagate_in_video_preflight``, legacy:593-661): every known object
   receives an output on every prompted frame.  Objects without a prompt
   there get ``NO_OBJ_SCORE`` placeholder masks, ``object_score_logits``
   of 10.0, and a dummy object pointer computed from an *empty mask* on
   that frame (legacy:556-591, :426-554) — and those placeholders are
   memory-encoded, so they condition the object's later tracking.
2. **No new objects after tracking starts** (legacy:130-162) — the modern
   predictor lifts this restriction; the legacy one raises.
3. **Batched outputs** — ``add_new_points_or_box`` / ``add_new_mask`` /
   ``propagate_in_video`` return ``(frame_idx, obj_ids, video_res_masks)``
   with mask *logits* stacked over all objects ``[num_obj, 1, H, W]``
   (legacy:301-315, :738-745), optionally after the non-overlap
   constraint (sam2_base.py _apply_non_overlapping_constraints).

The reference runs all objects batched along dim 0 through one
``track_step``; every per-object slice of that computation is independent
(attention batches, convs, pointer tokens), so this adapter runs the same
math per object through the modern predictor's jitted methods —
numerically identical, and the per-object memories stay reusable by the
modern API.  Memory for prompted frames is encoded at preflight from the
consolidated low-res masks upsampled to the image size (legacy:533-554),
which equals the decoder's high-res output (sam2_base._forward_sam_heads
upsamples the same way).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vdn.models.sam2_video import Sam2VideoModel
from vdn.ops.resize import resize2d
from vdn.pipelines.sam2_video import Sam2VideoPredictor

# reference sam2/modeling/sam2_base.py:15 — "a large negative value as a
# placeholder score for missing objects"
NO_OBJ_SCORE = -1024.0


class Sam2VideoPredictorLegacy:
    """Drop-in equivalent of the reference legacy SAM2VideoPredictor."""

    def __init__(self, model: Sam2VideoModel, params,
                 mask_threshold: float = 0.0,
                 non_overlap_masks: bool = False,
                 add_all_frames_to_correct_as_cond: bool = False):
        self._p = Sam2VideoPredictor(model, params, mask_threshold)
        self.non_overlap_masks = non_overlap_masks
        self.add_all_frames_to_correct_as_cond = \
            add_all_frames_to_correct_as_cond

    # -- state ----------------------------------------------------------
    def init_state(self, frames: np.ndarray) -> Dict:
        """frames [N, H, W, 3] RGB uint8/float (the reference loads a
        video path; frame decoding lives in vdn.utils.video_io)."""
        state = self._p.init_state(frames)
        state.update(
            obj_id_to_idx={}, obj_idx_to_id={}, obj_ids=[],
            point_inputs_per_obj={}, mask_inputs_per_obj={},
            # per-object output dicts use the modern predictor's key names
            # so Sam2VideoPredictor._assemble_memory applies unchanged
            output_dict_per_obj={}, temp_output_dict_per_obj={},
            consolidated_frame_inds={"cond": set(), "non_cond": set()},
            tracking_has_started=False,
            frames_already_tracked={},
        )
        return state

    def _obj_id_to_idx(self, state, obj_id) -> int:
        """(legacy:130-162) — new ids allowed only before tracking."""
        obj_idx = state["obj_id_to_idx"].get(obj_id)
        if obj_idx is not None:
            return obj_idx
        if state["tracking_has_started"]:
            raise RuntimeError(
                f"Cannot add new object id {obj_id} after tracking starts. "
                f"All existing object ids: {state['obj_ids']}. "
                f"Please call 'reset_state' to restart from scratch.")
        obj_idx = len(state["obj_id_to_idx"])
        state["obj_id_to_idx"][obj_id] = obj_idx
        state["obj_idx_to_id"][obj_idx] = obj_id
        state["obj_ids"] = list(state["obj_id_to_idx"])
        state["point_inputs_per_obj"][obj_idx] = {}
        state["mask_inputs_per_obj"][obj_idx] = {}
        state["output_dict_per_obj"][obj_idx] = {
            "cond_outputs": {}, "non_cond_outputs": {}}
        state["temp_output_dict_per_obj"][obj_idx] = {
            "cond_outputs": {}, "non_cond_outputs": {}}
        return obj_idx

    def _num_obj(self, state) -> int:
        return len(state["obj_idx_to_id"])

    # -- prompts --------------------------------------------------------
    def add_new_points_or_box(self, state: Dict, frame_idx: int, obj_id,
                              points=None, labels=None,
                              clear_old_points: bool = True,
                              normalize_coords: bool = True, box=None
                              ) -> Tuple[int, List, np.ndarray]:
        """(legacy add_new_points_or_box:173-315).  Returns
        ``(frame_idx, obj_ids, video_res_mask_logits [num_obj,1,H,W])``."""
        obj_idx = self._obj_id_to_idx(state, obj_id)
        if (points is None) != (labels is None):
            raise ValueError("points and labels must be provided together")
        if points is None and box is None:
            raise ValueError(
                "at least one of points or box must be provided as input")
        pts = (np.zeros((0, 2), np.float32) if points is None
               else np.asarray(points, np.float32).reshape(-1, 2))
        lbl = (np.zeros((0,), np.float32) if labels is None
               else np.asarray(labels, np.float32).reshape(-1))
        if box is not None:
            if not clear_old_points:
                raise ValueError(
                    "cannot add box without clearing old points, since box "
                    "prompt must be provided before any point prompt")
            pts = np.concatenate(
                [np.asarray(box, np.float32).reshape(2, 2), pts], axis=0)
            lbl = np.concatenate(
                [np.asarray([2.0, 3.0], np.float32), lbl], axis=0)
        s = self._p.model.image_size
        if normalize_coords:
            h, w = state["orig_hw"]
            pts = pts / np.asarray([w, h], np.float32)
        pts = pts * s
        if not clear_old_points and \
                frame_idx in state["point_inputs_per_obj"][obj_idx]:
            pc0, pl0 = state["point_inputs_per_obj"][obj_idx][frame_idx]
            pts = np.concatenate([pc0, pts], axis=0)
            lbl = np.concatenate([pl0, lbl], axis=0)
        state["point_inputs_per_obj"][obj_idx][frame_idx] = (pts, lbl)
        state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)

        is_init = frame_idx not in state["frames_already_tracked"]
        reverse = (False if is_init else
                   state["frames_already_tracked"][frame_idx]["reverse"])
        is_cond = is_init or self.add_all_frames_to_correct_as_cond
        storage = "cond_outputs" if is_cond else "non_cond_outputs"

        # previous mask logits -> decoder input (correction clicks,
        # legacy:272-287: temp dict first, then cond, then non-cond)
        obj_out = state["output_dict_per_obj"][obj_idx]
        prev = (state["temp_output_dict_per_obj"][obj_idx][storage]
                .get(frame_idx)
                or obj_out["cond_outputs"].get(frame_idx)
                or obj_out["non_cond_outputs"].get(frame_idx))
        mask_input = None
        if prev is not None:
            mask_input = np.clip(prev["pred_masks"], -32.0, 32.0)
            mask_input = mask_input.transpose(0, 2, 3, 1)  # NHWC

        p = self._p
        feats = p._features(state, frame_idx)
        if is_init:
            cond_feats = p._add_no_mem(p.params, feats)
        else:
            memory, memory_pos, n_obj = p._assemble_memory(
                state, obj_out, frame_idx, reverse)
            cond_feats = p._condition(p.params, feats, memory, memory_pos,
                                      n_obj)
        multimask = lbl.shape[0] <= 1
        low, high, ious, obj_ptr, obj_logits = p._predict_pts(
            p.params, cond_feats, pts[None], lbl[None], mask_input,
            multimask)
        _, best_low = p._best_mask(low, high, ious)
        # mem encoding deferred to preflight (legacy:288-301)
        state["temp_output_dict_per_obj"][obj_idx][storage][frame_idx] = {
            "obj_ptr": np.asarray(obj_ptr),
            "pred_masks": np.asarray(best_low),
            "object_score_logits": np.asarray(obj_logits)}
        return (frame_idx, list(state["obj_ids"]),
                self._consolidate_video_res(state, frame_idx))

    # legacy:316-319 deprecation alias
    add_new_points = add_new_points_or_box

    def add_new_mask(self, state: Dict, frame_idx: int, obj_id,
                     mask: np.ndarray) -> Tuple[int, List, np.ndarray]:
        """(legacy add_new_mask:321-404 -> _use_mask_as_output)."""
        obj_idx = self._obj_id_to_idx(state, obj_id)
        p = self._p
        s = p.model.image_size
        m = np.asarray(mask).astype(np.float32)[None, None]
        if m.shape[-2:] != (s, s):
            m = np.asarray(resize2d(m.transpose(0, 2, 3, 1), (s, s),
                                    "bilinear_aa", False)
                           ).transpose(0, 3, 1, 2)
            m = (m >= 0.5).astype(np.float32)
        state["mask_inputs_per_obj"][obj_idx][frame_idx] = m
        state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        is_init = frame_idx not in state["frames_already_tracked"]
        is_cond = is_init or self.add_all_frames_to_correct_as_cond
        storage = "cond_outputs" if is_cond else "non_cond_outputs"
        feats = p._features(state, frame_idx)
        low, _high, _ious, obj_ptr, obj_logits = p._use_mask(
            p.params, feats, jnp.asarray(m))
        state["temp_output_dict_per_obj"][obj_idx][storage][frame_idx] = {
            "obj_ptr": np.asarray(obj_ptr),
            "pred_masks": np.asarray(low),
            "object_score_logits": np.asarray(obj_logits)}
        return (frame_idx, list(state["obj_ids"]),
                self._consolidate_video_res(state, frame_idx))

    # -- consolidation --------------------------------------------------
    def _lookup(self, state, obj_idx, frame_idx) -> Optional[Dict]:
        """temp (either bucket) -> per-obj cond -> non-cond
        (legacy:487-500)."""
        temp = state["temp_output_dict_per_obj"][obj_idx]
        out = (temp["cond_outputs"].get(frame_idx)
               or temp["non_cond_outputs"].get(frame_idx))
        if out is None:
            obj_out = state["output_dict_per_obj"][obj_idx]
            out = (obj_out["cond_outputs"].get(frame_idx)
                   or obj_out["non_cond_outputs"].get(frame_idx))
        return out

    def _consolidate_video_res(self, state, frame_idx) -> np.ndarray:
        """Stack all objects' current masks on a frame at video res,
        NO_OBJ_SCORE for missing (legacy:426-530 with
        consolidate_at_video_res=True, run_mem_encoder=False)."""
        h, w = state["orig_hw"]
        n = self._num_obj(state)
        out = np.full((n, 1, h, w), NO_OBJ_SCORE, np.float32)
        for obj_idx in range(n):
            entry = self._lookup(state, obj_idx, frame_idx)
            if entry is None:
                continue
            out[obj_idx] = np.asarray(
                resize2d(entry["pred_masks"].transpose(0, 2, 3, 1),
                         (h, w), "bilinear", False)).transpose(0, 3, 1, 2)
        if self.non_overlap_masks:
            out = self._apply_non_overlapping_constraints(out)
        return out

    def _empty_mask_ptr(self, state, frame_idx) -> np.ndarray:
        """Dummy pointer from an empty mask (legacy:556-591; the reference
        routes it through track_step, which under
        use_mask_input_as_output_without_sam is _use_mask_as_output)."""
        p = self._p
        s = p.model.image_size
        feats = p._features(state, frame_idx)
        _, _, _, ptr, _ = p._use_mask(p.params, feats,
                                      jnp.zeros((1, 1, s, s), jnp.float32))
        return np.asarray(ptr)

    def _consolidate_and_encode(self, state, frame_idx, storage: str):
        """Give EVERY object an output on ``frame_idx`` and memory-encode
        it (legacy _consolidate_temp_output_across_obj with
        run_mem_encoder=True + _add_output_per_object)."""
        p = self._p
        s = p.model.image_size
        low_hw = None
        feats = p._features(state, frame_idx)
        empty_ptr = None
        for obj_idx in range(self._num_obj(state)):
            entry = self._lookup(state, obj_idx, frame_idx)
            if entry is None:
                if low_hw is None:
                    low_hw = s // 4
                if empty_ptr is None:
                    empty_ptr = self._empty_mask_ptr(state, frame_idx)
                entry = {
                    "obj_ptr": empty_ptr,
                    "pred_masks": np.full((1, 1, low_hw, low_hw),
                                          NO_OBJ_SCORE, np.float32),
                    # sigmoid(10)=1: assume present (legacy:477-483)
                    "object_score_logits": np.full((1, 1), 10.0,
                                                   np.float32)}
            low = entry["pred_masks"]
            low_hw = low.shape[-1]
            high = np.asarray(resize2d(low.transpose(0, 2, 3, 1), (s, s),
                                       "bilinear", False)
                              ).transpose(0, 3, 1, 2)
            feat, pos = p._encode_memory(
                p.params, feats, jnp.asarray(high),
                jnp.asarray(entry["object_score_logits"]))
            obj_out = state["output_dict_per_obj"][obj_idx]
            obj_out[storage][frame_idx] = {
                "maskmem_features": feat, "maskmem_pos_enc": pos,
                "obj_ptr": entry["obj_ptr"], "pred_masks": low,
                "object_score_logits": entry["object_score_logits"]}

    def propagate_in_video_preflight(self, state) -> None:
        """(legacy:593-661)."""
        state["tracking_has_started"] = True
        inds = state["consolidated_frame_inds"]
        for storage in ("non_cond_outputs", "cond_outputs"):
            key = "cond" if storage == "cond_outputs" else "non_cond"
            temp_frames = set()
            for temp in state["temp_output_dict_per_obj"].values():
                temp_frames.update(temp[storage].keys())
            inds[key].update(temp_frames)
            for frame_idx in sorted(temp_frames):
                self._consolidate_and_encode(state, frame_idx, storage)
            for temp in state["temp_output_dict_per_obj"].values():
                temp[storage].clear()
        # a cond output supersedes any prior non-cond one (legacy:644-651)
        for obj_out in state["output_dict_per_obj"].values():
            for frame_idx in obj_out["cond_outputs"]:
                obj_out["non_cond_outputs"].pop(frame_idx, None)
        inds["non_cond"] -= inds["cond"]
        # consolidated frames must be exactly the prompted ones
        # (legacy:653-661)
        input_frames = set()
        for d in state["point_inputs_per_obj"].values():
            input_frames.update(d.keys())
        for d in state["mask_inputs_per_obj"].values():
            input_frames.update(d.keys())
        assert inds["cond"] | inds["non_cond"] == input_frames

    # -- tracking -------------------------------------------------------
    def _track_obj(self, state, obj_idx, frame_idx, reverse) -> np.ndarray:
        p = self._p
        obj_out = state["output_dict_per_obj"][obj_idx]
        feats = p._features(state, frame_idx)
        memory, memory_pos, n_obj = p._assemble_memory(
            state, obj_out, frame_idx, reverse)
        cond_feats = p._condition(p.params, feats, memory, memory_pos,
                                  n_obj)
        low, high, ious, obj_ptr, obj_logits = p._predict_track(
            p.params, cond_feats)
        best_high, best_low = p._best_mask(low, high, ious)
        feat, pos = p._encode_memory(p.params, feats, best_high,
                                     obj_logits)
        obj_out["non_cond_outputs"][frame_idx] = {
            "maskmem_features": feat, "maskmem_pos_enc": pos,
            "obj_ptr": np.asarray(obj_ptr),
            "pred_masks": np.asarray(best_low),
            "object_score_logits": np.asarray(obj_logits)}
        return np.asarray(best_low)

    def propagate_in_video(self, state, start_frame_idx: Optional[int] =
                           None, max_frame_num_to_track: Optional[int] =
                           None, reverse: bool = False):
        """Yield ``(frame_idx, obj_ids, video_res_mask_logits)``
        (legacy:663-745)."""
        self.propagate_in_video_preflight(state)
        inds = state["consolidated_frame_inds"]
        if not inds["cond"]:
            raise RuntimeError(
                "No points are provided; please add points first")
        num_frames = state["num_frames"]
        if start_frame_idx is None:
            start_frame_idx = min(inds["cond"])
        if max_frame_num_to_track is None:
            max_frame_num_to_track = num_frames
        if reverse:
            end = max(start_frame_idx - max_frame_num_to_track, 0)
            order = (range(start_frame_idx, end - 1, -1)
                     if start_frame_idx > 0 else [])
        else:
            end = min(start_frame_idx + max_frame_num_to_track,
                      num_frames - 1)
            order = range(start_frame_idx, end + 1)
        h, w = state["orig_hw"]
        for frame_idx in order:
            if frame_idx in inds["cond"] or frame_idx in inds["non_cond"]:
                bucket = ("cond_outputs" if frame_idx in inds["cond"]
                          else "non_cond_outputs")
                lows = [state["output_dict_per_obj"][i][bucket][frame_idx]
                        ["pred_masks"]
                        for i in range(self._num_obj(state))]
            else:
                # the reference runs one batched track_step over all
                # objects (legacy:718-731); every per-object slice of it
                # is independent, so this per-object loop is exact
                lows = [self._track_obj(state, i, frame_idx, reverse)
                        for i in range(self._num_obj(state))]
            state["frames_already_tracked"][frame_idx] = {
                "reverse": reverse}
            low_all = np.concatenate(lows, axis=0)
            masks = np.asarray(resize2d(low_all.transpose(0, 2, 3, 1),
                                        (h, w), "bilinear", False)
                               ).transpose(0, 3, 1, 2)
            if self.non_overlap_masks:
                masks = self._apply_non_overlapping_constraints(masks)
            yield frame_idx, list(state["obj_ids"]), masks

    # -- bookkeeping ----------------------------------------------------
    @staticmethod
    def _apply_non_overlapping_constraints(masks: np.ndarray) -> np.ndarray:
        """Keep only the argmax object per pixel; clamp the rest to <= -10
        (reference sam2_base.py _apply_non_overlapping_constraints)."""
        if masks.shape[0] == 1:
            return masks
        best = np.argmax(masks, axis=0, keepdims=True)
        keep = best == np.arange(masks.shape[0])[:, None, None, None]
        return np.where(keep, masks, np.clip(masks, None, -10.0))

    def clear_all_prompts_in_frame(self, state, frame_idx, obj_id,
                                   need_output: bool = True):
        """(legacy:777-848)."""
        obj_idx = self._obj_id_to_idx(state, obj_id)
        state["point_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        state["mask_inputs_per_obj"][obj_idx].pop(frame_idx, None)
        temp = state["temp_output_dict_per_obj"][obj_idx]
        temp["cond_outputs"].pop(frame_idx, None)
        temp["non_cond_outputs"].pop(frame_idx, None)
        frame_has_input = any(
            frame_idx in state["point_inputs_per_obj"][i]
            or frame_idx in state["mask_inputs_per_obj"][i]
            for i in range(self._num_obj(state)))
        if not frame_has_input:
            inds = state["consolidated_frame_inds"]
            was_cond = frame_idx in inds["cond"]
            inds["cond"].discard(frame_idx)
            inds["non_cond"].discard(frame_idx)
            if was_cond:
                # downgrade the frame's cond outputs to non-cond
                # (legacy:810-821)
                state["frames_already_tracked"].pop(frame_idx, None)
            for obj_out in state["output_dict_per_obj"].values():
                out = obj_out["cond_outputs"].pop(frame_idx, None)
                if out is not None:
                    obj_out["non_cond_outputs"][frame_idx] = out
            if not inds["cond"]:
                self._reset_tracking_results(state)
        if not need_output:
            return None
        return (frame_idx, list(state["obj_ids"]),
                self._consolidate_video_res(state, frame_idx))

    def remove_object(self, state, obj_id, strict: bool = False,
                      need_output: bool = True):
        """(legacy:1042-1155) — per-object dict storage makes the
        reference's batched-tensor re-slicing plain key remapping."""
        old_idx = state["obj_id_to_idx"].get(obj_id)
        updated_frames = []
        if old_idx is None:
            if not strict:
                return state["obj_ids"], updated_frames
            raise RuntimeError(
                f"Cannot remove object id {obj_id} as it doesn't exist. "
                f"All existing object ids: {state['obj_ids']}.")
        if len(state["obj_id_to_idx"]) == 1:
            self.reset_state(state)
            return state["obj_ids"], updated_frames
        input_frames = set(state["point_inputs_per_obj"][old_idx])
        input_frames |= set(state["mask_inputs_per_obj"][old_idx])
        for frame_idx in input_frames:
            self.clear_all_prompts_in_frame(state, frame_idx, obj_id,
                                            need_output=False)
        remain = [i for i in range(self._num_obj(state)) if i != old_idx]
        new_ids = [state["obj_idx_to_id"][i] for i in remain]
        for container_key in ("point_inputs_per_obj", "mask_inputs_per_obj",
                              "output_dict_per_obj",
                              "temp_output_dict_per_obj"):
            container = state[container_key]
            state[container_key] = {new: container[old]
                                    for new, old in enumerate(remain)}
        state["obj_id_to_idx"] = {oid: i for i, oid in enumerate(new_ids)}
        state["obj_idx_to_id"] = dict(enumerate(new_ids))
        state["obj_ids"] = new_ids
        if need_output:
            updated_frames = [
                (f, self._consolidate_video_res(state, f))
                for f in sorted(state["consolidated_frame_inds"]["cond"]
                                | state["consolidated_frame_inds"]
                                ["non_cond"])]
        return state["obj_ids"], updated_frames

    def _reset_tracking_results(self, state) -> None:
        for d in state["point_inputs_per_obj"].values():
            d.clear()
        for d in state["mask_inputs_per_obj"].values():
            d.clear()
        for d in state["output_dict_per_obj"].values():
            d["cond_outputs"].clear()
            d["non_cond_outputs"].clear()
        for d in state["temp_output_dict_per_obj"].values():
            d["cond_outputs"].clear()
            d["non_cond_outputs"].clear()
        state["consolidated_frame_inds"]["cond"].clear()
        state["consolidated_frame_inds"]["non_cond"].clear()
        state["tracking_has_started"] = False
        state["frames_already_tracked"].clear()

    def reset_state(self, state) -> None:
        """(legacy:848-858)."""
        self._reset_tracking_results(state)
        state["obj_id_to_idx"].clear()
        state["obj_idx_to_id"].clear()
        state["obj_ids"].clear()
        state["point_inputs_per_obj"].clear()
        state["mask_inputs_per_obj"].clear()
        state["output_dict_per_obj"].clear()
        state["temp_output_dict_per_obj"].clear()
