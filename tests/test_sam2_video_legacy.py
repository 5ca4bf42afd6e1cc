"""Legacy SAM2 video predictor parity (reference
sam2/sam2_video_predictor_legacy.py).

The oracle is the reference legacy ``SAM2VideoPredictor`` itself (a
SAM2Base subclass), built on the same tiny config as
test_sam2_video_parity and driven through its real public API:
``init_state`` (video loading monkeypatched to hand it pre-normalized
frames), ``add_new_points_or_box`` / ``add_new_mask``,
``propagate_in_video``.  The legacy-specific behaviors under test:

- consolidation at preflight gives EVERY object an output on every
  prompted frame — NO_OBJ_SCORE placeholder masks, object_score_logits
  10.0, empty-mask dummy pointers (legacy:426-591) — and those
  placeholders are memory-encoded;
- batched ``(frame_idx, obj_ids, [num_obj,1,H,W])`` logits outputs;
- no new object ids once tracking has started (legacy:130-162).
"""

import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()

import tests.test_hiera_parity  # noqa: F401,E402  (iopath shim)

import sam2.sam2_video_predictor_legacy as ref_legacy_mod  # noqa: E402
from sam2.sam2_video_predictor_legacy import (  # noqa: E402
    SAM2VideoPredictor as RefLegacy)

from tests.test_sam2_video_parity import (  # noqa: E402
    D, MEM, TRUNK_CFG, _build_ref)
from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.models.sam2_video import Sam2VideoModel  # noqa: E402
from vdn.nn.hiera import HIERA_CONFIGS  # noqa: E402
from vdn.pipelines.sam2_video_legacy import (  # noqa: E402
    NO_OBJ_SCORE, Sam2VideoPredictorLegacy)

N_FRAMES = 4
SIZE = 128


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    ref = _build_ref(cls=RefLegacy)
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    HIERA_CONFIGS.setdefault("tiny_video_test", dict(TRUNK_CFG))
    model = Sam2VideoModel(trunk_variant="tiny_video_test", d_model=D,
                           mem_dim=MEM, image_size=SIZE)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (N_FRAMES, SIZE, SIZE, 3), np.uint8)
    return ref, model, params, frames


def _ref_state(ref, images_nhwc: np.ndarray):
    """Reference init_state with load_video_frames bypassed so the oracle
    sees the exact pre-normalized pixels the vdn predictor computed."""
    imgs = torch.from_numpy(
        images_nhwc.transpose(0, 3, 1, 2).copy()).float()
    orig = ref_legacy_mod.load_video_frames
    ref_legacy_mod.load_video_frames = lambda **kw: (imgs, SIZE, SIZE)
    try:
        return ref.init_state(video_path="<in-memory>")
    finally:
        ref_legacy_mod.load_video_frames = orig


def _agreement(a_logits: np.ndarray, b_logits: np.ndarray) -> float:
    return float(((a_logits > 0) == (b_logits > 0)).mean())


PTS_A = np.array([[40.0, 60.0]], np.float32)
PTS_B = np.array([[90.0, 30.0]], np.float32)
LBL = np.array([1], np.float32)
MASK_B = np.zeros((SIZE, SIZE), np.float32)
MASK_B[20:70, 60:120] = 1.0


def _prompt_both(ref, leg, state, ref_state):
    """obj 1: points on frame 0; obj 2: mask on frame 1 — so each
    prompted frame has one object missing (placeholder path)."""
    with torch.no_grad():
        r0 = ref.add_new_points_or_box(
            ref_state, 0, 1, points=torch.from_numpy(PTS_A),
            labels=torch.from_numpy(LBL).to(torch.int32))
        r1 = ref.add_new_mask(ref_state, 1, 2, torch.from_numpy(MASK_B))
    v0 = leg.add_new_points_or_box(state, 0, 1, points=PTS_A, labels=LBL)
    v1 = leg.add_new_mask(state, 1, 2, MASK_B)
    return (r0, r1), (v0, v1)


def test_legacy_multi_object_rollout(setup):
    ref, model, params, frames = setup
    leg = Sam2VideoPredictorLegacy(model, params)
    state = leg.init_state(frames)
    ref_state = _ref_state(ref, state["images"])

    (r0, r1), (v0, v1) = _prompt_both(ref, leg, state, ref_state)

    # prompt-time batched outputs: frame idx, obj ids, [num_obj,1,H,W]
    assert r0[0] == v0[0] == 0 and list(r0[1]) == list(v0[1]) == [1]
    assert v0[2].shape == (1, 1, SIZE, SIZE)
    assert _agreement(r0[2].numpy(), v0[2]) > 0.99

    # frame 1 now has two objects; obj 1 has no output there yet ->
    # exact NO_OBJ_SCORE placeholder row in both implementations
    assert r1[0] == v1[0] == 1 and list(r1[1]) == list(v1[1]) == [1, 2]
    assert v1[2].shape == (2, 1, SIZE, SIZE)
    np.testing.assert_array_equal(
        r1[2][0].numpy(), np.full((1, SIZE, SIZE), NO_OBJ_SCORE))
    np.testing.assert_array_equal(
        v1[2][0], np.full((1, SIZE, SIZE), NO_OBJ_SCORE))
    assert _agreement(r1[2][1].numpy(), v1[2][1]) > 0.99

    # full propagation: placeholders memory-encoded at preflight, then
    # batched tracking — per-object masks must agree frame by frame
    ref_out = {}
    with torch.no_grad():
        for t, ids, masks in ref.propagate_in_video(ref_state):
            ref_out[t] = (list(ids), masks.numpy())
    got_out = {}
    for t, ids, masks in leg.propagate_in_video(state):
        got_out[t] = (list(ids), masks)
    assert set(ref_out) == set(got_out) == set(range(N_FRAMES))
    for t in range(N_FRAMES):
        assert ref_out[t][0] == got_out[t][0] == [1, 2]
        for obj in range(2):
            ref_m, got_m = ref_out[t][1][obj], got_out[t][1][obj]
            if np.all(ref_m == NO_OBJ_SCORE):
                np.testing.assert_array_equal(got_m, ref_m)
            else:
                agree = _agreement(ref_m, got_m)
                assert agree > 0.99, f"frame {t} obj {obj}: {agree:.4f}"

    # legacy restriction: no new ids after tracking starts
    with pytest.raises(RuntimeError, match="Cannot add new object"):
        leg.add_new_points_or_box(state, 2, 99, points=PTS_A, labels=LBL)
    with pytest.raises(RuntimeError, match="Cannot add new object"):
        ref.add_new_points_or_box(
            ref_state, 2, 99, points=torch.from_numpy(PTS_A),
            labels=torch.from_numpy(LBL).to(torch.int32))


def test_legacy_non_overlap_constraint():
    """Exact parity of the static non-overlap op (sam2_base.py
    _apply_non_overlapping_constraints)."""
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(3, 1, 16, 16)).astype(np.float32)
    ref = RefLegacy._apply_non_overlapping_constraints(
        None, torch.from_numpy(logits)).numpy()
    got = Sam2VideoPredictorLegacy._apply_non_overlapping_constraints(
        logits)
    np.testing.assert_array_equal(ref, got)
    one = rng.normal(size=(1, 1, 8, 8)).astype(np.float32)
    np.testing.assert_array_equal(
        Sam2VideoPredictorLegacy._apply_non_overlapping_constraints(one),
        one)


def test_legacy_remove_and_clear(setup):
    """remove_object / clear_all_prompts_in_frame / reset_state
    bookkeeping (legacy:777-858, :1042-1155)."""
    _, model, params, frames = setup
    leg = Sam2VideoPredictorLegacy(model, params)
    state = leg.init_state(frames)
    leg.add_new_points_or_box(state, 0, 1, points=PTS_A, labels=LBL)
    leg.add_new_mask(state, 1, 2, MASK_B)
    for _ in leg.propagate_in_video(state):
        pass

    # removing a missing id is a no-op unless strict
    ids, _ = leg.remove_object(state, 99)
    assert ids == [1, 2]
    with pytest.raises(RuntimeError, match="doesn't exist"):
        leg.remove_object(state, 99, strict=True)

    ids, updated = leg.remove_object(state, 2)
    assert ids == [1]
    assert state["obj_id_to_idx"] == {1: 0}
    # obj 2's prompted frame loses cond status; frame 0 keeps it, so
    # tracking results survive and re-propagation works single-object
    assert state["consolidated_frame_inds"]["cond"] == {0}
    assert updated and all(m.shape == (1, 1, SIZE, SIZE)
                           for _, m in updated)
    out = {t: m for t, _, m in leg.propagate_in_video(state)}
    assert out[0].shape == (1, 1, SIZE, SIZE)

    # clearing the only prompted frame resets tracking results
    res = leg.clear_all_prompts_in_frame(state, 0, 1)
    assert res[1] == [1]
    assert not state["tracking_has_started"]
    assert not state["consolidated_frame_inds"]["cond"]

    leg.reset_state(state)
    assert state["obj_ids"] == [] and state["output_dict_per_obj"] == {}


def test_legacy_remove_before_tracking_resets(setup):
    """Reference quirk, reproduced: removing an object BEFORE tracking
    starts resets all tracking inputs — clear_all_prompts_in_frame's
    reset trigger checks the cond outputs, which stay empty until
    preflight (legacy:838-841)."""
    ref, model, params, frames = setup
    leg = Sam2VideoPredictorLegacy(model, params)
    state = leg.init_state(frames)
    leg.add_new_points_or_box(state, 0, 1, points=PTS_A, labels=LBL)
    leg.add_new_mask(state, 1, 2, MASK_B)
    leg.remove_object(state, 2)
    assert state["point_inputs_per_obj"][0] == {}  # obj 1 wiped too
    with pytest.raises(RuntimeError, match="No points"):
        next(leg.propagate_in_video(state))

    ref_state = _ref_state(ref, Sam2VideoPredictorLegacy(
        model, params).init_state(frames)["images"])
    with torch.no_grad():
        ref.add_new_points_or_box(
            ref_state, 0, 1, points=torch.from_numpy(PTS_A),
            labels=torch.from_numpy(LBL).to(torch.int32))
        ref.add_new_mask(ref_state, 1, 2, torch.from_numpy(MASK_B))
        ref.remove_object(ref_state, 2)
    assert ref_state["point_inputs_per_obj"][0] == {}
