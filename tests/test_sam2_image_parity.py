"""End-to-end SAM2 image segmentation parity: encode_image + predict vs a
hand-built reference SAM2Base (the reference normally assembles it from
hydra yamls, sam2/build_sam.py — hydra is absent here, and the constructor
takes plain modules)."""

import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()

import tests.test_hiera_parity  # noqa: F401,E402  (installs iopath shim)

from sam2.modeling.backbones.hieradet import Hiera as RefHiera  # noqa: E402
from sam2.modeling.backbones.image_encoder import (  # noqa: E402
    FpnNeck as RefFpnNeck, ImageEncoder as RefImageEncoder)
from sam2.modeling.memory_attention import (  # noqa: E402
    MemoryAttention, MemoryAttentionLayer)
from sam2.modeling.memory_encoder import (  # noqa: E402
    CXBlock, Fuser, MaskDownSampler, MemoryEncoder)
from sam2.modeling.position_encoding import PositionEmbeddingSine  # noqa
from sam2.modeling.sam.transformer import RoPEAttention  # noqa: E402
from sam2.modeling.sam2_base import SAM2Base  # noqa: E402

from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.models.sam2_image import Sam2ImageModel  # noqa: E402

D = 32
TRUNK_CFG = dict(embed_dim=D, num_heads=1, stages=(1, 1, 2, 1),
                 global_att_blocks=(3,), window_spec=(8, 4, 14, 7),
                 window_pos_embed_bkg_spatial_size=(14, 14))


def _build_ref():
    trunk = RefHiera(**TRUNK_CFG)
    neck = RefFpnNeck(position_encoding=PositionEmbeddingSine(num_pos_feats=D),
                      d_model=D, backbone_channel_list=[8 * D, 4 * D,
                                                        2 * D, D],
                      fpn_top_down_levels=[2, 3],
                      fpn_interp_model="nearest")
    ie = RefImageEncoder(trunk=trunk, neck=neck, scalp=1)
    layer = MemoryAttentionLayer(
        activation="gelu", d_model=D, dim_feedforward=2 * D, dropout=0.1,
        pos_enc_at_attn=False, pos_enc_at_cross_attn_keys=False,
        pos_enc_at_cross_attn_queries=True,
        self_attention=RoPEAttention(embedding_dim=D, num_heads=1),
        cross_attention=RoPEAttention(embedding_dim=D, num_heads=1,
                                      rope_k_repeat=True))
    ma = MemoryAttention(d_model=D, pos_enc_at_input=True, layer=layer,
                         num_layers=1)
    me = MemoryEncoder(
        out_dim=D, in_dim=D,
        mask_downsampler=MaskDownSampler(embed_dim=D, kernel_size=3,
                                         stride=2, padding=1,
                                         total_stride=16),
        fuser=Fuser(layer=CXBlock(D), num_layers=1),
        position_encoding=PositionEmbeddingSine(num_pos_feats=D))
    return SAM2Base(
        image_encoder=ie, memory_attention=ma, memory_encoder=me,
        image_size=128, backbone_stride=16,
        use_high_res_features_in_sam=True, directly_add_no_mem_embed=True,
        multimask_output_in_sam=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, fixed_no_obj_ptr=True,
        use_obj_ptrs_in_encoder=True, iou_prediction_use_sigmoid=True,
        use_multimask_token_for_obj_ptr=True).eval()


def _drop_memory_keys(key):
    for prefix in ("memory_attention.", "memory_encoder.",
                   "maskmem_tpos_enc", "no_mem_pos_enc",
                   "mask_downsample"):
        if key.startswith(prefix):
            return None
    return key


def test_sam2_image_end_to_end():
    torch.manual_seed(0)
    ref = _build_ref()
    params = {"params": convert_torch_state(
        _reference.state_dict_numpy(ref), rename=_drop_memory_keys)}
    from vdn.nn.hiera import HIERA_CONFIGS
    HIERA_CONFIGS["tiny_test"] = dict(TRUNK_CFG)
    model = Sam2ImageModel(trunk_variant="tiny_test", d_model=D,
                           image_size=128)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, 128, 128, 3)).astype(np.float32)
    img_t = torch.from_numpy(np.moveaxis(img, -1, 1).copy())

    with torch.no_grad():
        backbone_out = ref.forward_image(img_t)
        _, vision_feats, _, sizes = ref._prepare_backbone_features(
            backbone_out)
        vision_feats[-1] = vision_feats[-1] + ref.no_mem_embed
        feats = [f.permute(1, 2, 0).view(1, -1, *s)
                 for f, s in zip(vision_feats, sizes)]
        image_embed, high0, high1 = feats[-1], feats[0], feats[1]
        points = {"point_coords": torch.tensor([[[40.0, 60.0],
                                                 [90.0, 30.0]]]),
                  "point_labels": torch.tensor([[1, 0]], dtype=torch.int32)}
        (r_low, r_high, r_iou, _, _, r_ptr, r_obj) = \
            ref._forward_sam_heads(image_embed, point_inputs=points,
                                   high_res_features=[high0, high1],
                                   multimask_output=True)

    features = model.apply(params, img, method=model.encode_image)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(features["image_embed"]), -1, 1),
        image_embed.numpy(), rtol=2e-3, atol=2e-3)
    g_low, g_high, g_iou, g_ptr, g_obj = model.apply(
        params, features,
        point_coords=np.array([[[40.0, 60.0], [90.0, 30.0]]], np.float32),
        point_labels=np.array([[1, 0]], np.float32),
        multimask_output=True, method=model.predict)

    np.testing.assert_allclose(np.asarray(g_low), r_low.numpy(),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g_iou), r_iou.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_obj), r_obj.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g_ptr), r_ptr.numpy(),
                               rtol=2e-3, atol=2e-3)
