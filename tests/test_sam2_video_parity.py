"""SAM2 video tracking parity: prompt frame 0, track frames 1-2, compare
masks/pointers/memories against the reference SAM2Base track_step.

The reference repo's own video path is broken as shipped — the fork renamed
the memory encoder's output keys (memory_encoder.py:181: memory_feature/
memory_pos_enc) while sam2_base.py:695-697 reads vision_features/
vision_pos_enc — so the oracle patches the encoder instance to restore the
upstream contract."""

import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()

import tests.test_hiera_parity  # noqa: F401,E402  (iopath shim)

from sam2.modeling.backbones.hieradet import Hiera as RefHiera  # noqa: E402
from sam2.modeling.backbones.image_encoder import (  # noqa: E402
    FpnNeck as RefFpnNeck, ImageEncoder as RefImageEncoder)
from sam2.modeling.memory_attention import (  # noqa: E402
    MemoryAttention as RefMA, MemoryAttentionLayer as RefMAL)
from sam2.modeling.memory_encoder import (  # noqa: E402
    CXBlock, Fuser, MaskDownSampler, MemoryEncoder)
from sam2.modeling.position_encoding import PositionEmbeddingSine  # noqa
from sam2.modeling.sam.transformer import RoPEAttention  # noqa: E402
from sam2.modeling.sam2_base import SAM2Base  # noqa: E402

from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.models.sam2_video import Sam2VideoModel  # noqa: E402
from vdn.nn.hiera import HIERA_CONFIGS  # noqa: E402
from vdn.pipelines.sam2_video import Sam2VideoPredictor  # noqa: E402

D = 32
MEM = 16
TRUNK_CFG = dict(embed_dim=D, num_heads=1, stages=(1, 1, 2, 1),
                 global_att_blocks=(3,), window_spec=(8, 4, 14, 7),
                 window_pos_embed_bkg_spatial_size=(14, 14))


def _build_ref(cls=SAM2Base, **extra):
    """Build the tiny reference model; ``cls`` may be any SAM2Base
    subclass (test_sam2_video_legacy.py passes the legacy predictor)."""
    trunk = RefHiera(**TRUNK_CFG)
    neck = RefFpnNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=D),
        d_model=D, backbone_channel_list=[8 * D, 4 * D, 2 * D, D],
        fpn_top_down_levels=[2, 3], fpn_interp_model="nearest")
    ie = RefImageEncoder(trunk=trunk, neck=neck, scalp=1)
    layer = RefMAL(
        activation="relu", d_model=D, dim_feedforward=2048, dropout=0.1,
        pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=True,
        pos_enc_at_cross_attn_queries=False,
        self_attention=RoPEAttention(embedding_dim=D, num_heads=1,
                                     dropout=0.1),
        cross_attention=RoPEAttention(embedding_dim=D, num_heads=1,
                                      dropout=0.1, rope_k_repeat=True,
                                      kv_in_dim=MEM))
    ma = RefMA(d_model=D, pos_enc_at_input=True, layer=layer, num_layers=4)
    me = MemoryEncoder(
        out_dim=MEM, in_dim=D,
        mask_downsampler=MaskDownSampler(embed_dim=D, kernel_size=3,
                                         stride=2, padding=1,
                                         total_stride=16),
        fuser=Fuser(layer=CXBlock(D), num_layers=2),
        position_encoding=PositionEmbeddingSine(num_pos_feats=MEM))
    # restore the upstream output contract the fork broke
    orig_forward = me.forward

    def fixed_forward(pix, masks, skip_mask_sigmoid=False):
        out = orig_forward(pix, masks, skip_mask_sigmoid)
        return {"vision_features": out["memory_feature"],
                "vision_pos_enc": [out["memory_pos_enc"]]}

    me.forward = fixed_forward

    # second fork breakage: memory_attention was rewired batch-first for the
    # depth MemoryBlock (its batch-size assert now reads shape[0]), while
    # sam2_base calls it seq-first — wrap to restore upstream semantics
    ma_orig = ma.forward

    def ma_fixed(curr, memory, curr_pos=None, memory_pos=None,
                 num_obj_ptr_tokens=0):
        if isinstance(curr, list):
            assert len(curr) == 1
            curr, curr_pos = curr[0], curr_pos[0]
        out = ma_orig(curr.transpose(0, 1), memory.transpose(0, 1),
                      curr_pos.transpose(0, 1),
                      memory_pos.transpose(0, 1), num_obj_ptr_tokens)
        return out.transpose(0, 1)

    ma.forward = ma_fixed

    return cls(
        image_encoder=ie, memory_attention=ma, memory_encoder=me,
        num_maskmem=7, image_size=128, backbone_stride=16,
        sigmoid_scale_for_mem_enc=20.0, sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True, no_obj_embed_spatial=True,
        use_high_res_features_in_sam=True, multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True, use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=True, proj_tpos_enc_in_obj_ptrs=True,
        use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True, use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0, multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True, **extra).eval()


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    ref = _build_ref()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    HIERA_CONFIGS["tiny_video_test"] = dict(TRUNK_CFG)
    model = Sam2VideoModel(trunk_variant="tiny_video_test", d_model=D,
                           mem_dim=MEM, image_size=128)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, 128, 128, 3), np.uint8)
    return ref, model, params, frames


def _ref_rollout(ref, images, order, point_inputs_at=None, mask_at=None,
                 reverse=False):
    """Reference per-object rollout via _track_step; returns high-res masks
    per frame index."""
    output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
    ref_masks = {}
    with torch.no_grad():
        for t in order:
            img_t = torch.from_numpy(
                np.moveaxis(images[t], -1, 0).copy())[None]
            backbone_out = ref.forward_image(img_t)
            _, feats, pos, sizes = ref._prepare_backbone_features(
                backbone_out)
            point_inputs = mask_inputs = None
            is_cond = False
            if point_inputs_at and t in point_inputs_at:
                is_cond = True
                pts, lbl = point_inputs_at[t]
                point_inputs = {
                    "point_coords": torch.from_numpy(pts[None]),
                    "point_labels": torch.from_numpy(
                        lbl[None]).to(torch.int32)}
            if mask_at and t in mask_at:
                is_cond = True
                mask_inputs = torch.from_numpy(mask_at[t][None, None])
            current_out, sam_outputs, _, _ = ref._track_step(
                t, is_cond, feats, pos, sizes, point_inputs, mask_inputs,
                output_dict, len(images), reverse, None)
            (_, _, _, low_best, high_best, obj_ptr, obj_logits) = \
                sam_outputs
            ref._encode_memory_in_output(feats, sizes, point_inputs, True,
                                         high_best, obj_logits,
                                         current_out)
            current_out["obj_ptr"] = obj_ptr
            bucket = ("cond_frame_outputs" if is_cond
                      else "non_cond_frame_outputs")
            output_dict[bucket][t] = current_out
            ref_masks[t] = high_best.numpy()
    return ref_masks


def test_video_tracking_matches(setup):
    ref, model, params, frames = setup
    pred = Sam2VideoPredictor(model, params)
    state = pred.init_state(frames)
    points = np.array([[40.0, 60.0]], np.float32)
    labels = np.array([1], np.float32)

    ref_masks = _ref_rollout(ref, state["images"], range(3),
                             point_inputs_at={0: (points, labels)})

    mask0 = pred.add_new_points(state, 0, points, labels)
    got_masks = {}
    for t, masks in pred.propagate(state):
        got_masks[t] = masks[0]

    assert (mask0 == (ref_masks[0][0, 0] > 0)).mean() > 0.99
    for t in (1, 2):
        agree = (got_masks[t] == (ref_masks[t][0, 0] > 0)).mean()
        assert agree > 0.99, f"frame {t}: agreement {agree:.4f}"
    obj = state["objects"][0]
    assert set(obj["cond_outputs"]) == {0}
    assert set(obj["non_cond_outputs"]) == {1, 2}


def test_mask_prompt_matches(setup):
    """add_new_mask -> _use_mask_as_output parity + tracking from a mask."""
    ref, model, params, frames = setup
    pred = Sam2VideoPredictor(model, params)
    state = pred.init_state(frames)
    mask_in = np.zeros((128, 128), np.float32)
    mask_in[30:80, 40:100] = 1.0

    ref_masks = _ref_rollout(ref, state["images"], range(3),
                             mask_at={0: mask_in})

    mask0 = pred.add_new_mask(state, 0, mask_in)
    got = {}
    for t, masks in pred.propagate(state):
        got[t] = masks[0]
    assert (mask0 == (ref_masks[0][0, 0] > 0)).mean() > 0.99
    for t in (1, 2):
        agree = (got[t] == (ref_masks[t][0, 0] > 0)).mean()
        assert agree > 0.99, f"frame {t}: agreement {agree:.4f}"


def test_reverse_tracking_matches(setup):
    """Prompt the LAST frame, propagate in reverse (reference
    propagate_in_video reverse=True semantics)."""
    ref, model, params, frames = setup
    pred = Sam2VideoPredictor(model, params)
    state = pred.init_state(frames)
    points = np.array([[70.0, 50.0]], np.float32)
    labels = np.array([1], np.float32)

    ref_masks = _ref_rollout(ref, state["images"], [2, 1, 0],
                             point_inputs_at={2: (points, labels)},
                             reverse=True)

    pred.add_new_points(state, 2, points, labels)
    got = {}
    for t, masks in pred.propagate(state, reverse=True):
        got[t] = masks[0]
    assert set(got) == {0, 1, 2}
    for t in (1, 0):
        agree = (got[t] == (ref_masks[t][0, 0] > 0)).mean()
        assert agree > 0.99, f"frame {t}: agreement {agree:.4f}"


def test_multi_object_independent(setup):
    """Two objects tracked in one state must equal each tracked alone
    (the reference runs per-object batch_size=1 slices)."""
    _, model, params, frames = setup
    pA = np.array([[40.0, 60.0]], np.float32)
    pB = np.array([[90.0, 30.0]], np.float32)
    lab = np.array([1], np.float32)

    def run(prompts):
        pred = Sam2VideoPredictor(model, params)
        state = pred.init_state(frames)
        for obj_id, pts in prompts.items():
            pred.add_new_points(state, 0, pts, lab, obj_id=obj_id)
        return {t: masks for t, masks in pred.propagate(state)}

    both = run({0: pA, 1: pB})
    only_a = run({0: pA})
    only_b = run({1: pB})
    for t in range(3):
        np.testing.assert_array_equal(both[t][0], only_a[t][0])
        np.testing.assert_array_equal(both[t][1], only_b[t][1])
