"""SAM2 component parity: prompt encoder, two-way transformer + mask
decoder, FPN neck vs the reference sam2.modeling tree."""

import numpy as np
import torch

from tests import _reference

_reference.add_reference_to_path()

from sam2.modeling.sam.prompt_encoder import (  # noqa: E402
    PromptEncoder as RefPromptEncoder)
from sam2.modeling.sam.mask_decoder import (  # noqa: E402
    MaskDecoder as RefMaskDecoder)
from sam2.modeling.sam.transformer import (  # noqa: E402
    TwoWayTransformer as RefTwoWay)
from sam2.modeling.position_encoding import (  # noqa: E402
    PositionEmbeddingSine)
from sam2.modeling.backbones.image_encoder import (  # noqa: E402
    FpnNeck as RefFpnNeck)

from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.nn.sam2 import (FpnNeck, MaskDecoder, PromptEncoder,  # noqa: E402
                         TwoWayTransformer)

EMBED = 32


def _nchw(x):
    return np.moveaxis(x, -1, 1).copy()


def test_prompt_encoder_matches():
    torch.manual_seed(0)
    ref = RefPromptEncoder(embed_dim=EMBED, image_embedding_size=(8, 8),
                           input_image_size=(128, 128),
                           mask_in_chans=16).eval()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    model = PromptEncoder(embed_dim=EMBED, image_embedding_size=(8, 8),
                          input_image_size=(128, 128), mask_in_chans=16)

    rng = np.random.default_rng(0)
    points = (rng.random((2, 3, 2)) * 128).astype(np.float32)
    labels = rng.integers(0, 2, (2, 3)).astype(np.float32)
    boxes = np.array([[10, 20, 60, 90], [5, 5, 100, 100]], np.float32)
    masks = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)

    with torch.no_grad():
        ref_sparse, ref_dense = ref(
            points=(torch.from_numpy(points), torch.from_numpy(labels)),
            boxes=torch.from_numpy(boxes),
            masks=torch.from_numpy(_nchw(masks)))
        ref_pe = ref.get_dense_pe().numpy()

    got_sparse, got_dense = model.apply(params, points, labels, boxes,
                                        masks)
    np.testing.assert_allclose(np.asarray(got_sparse), ref_sparse.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(_nchw(np.asarray(got_dense)),
                               ref_dense.numpy(), rtol=1e-4, atol=1e-4)
    got_pe = model.apply(params, method=model.get_dense_pe)
    np.testing.assert_allclose(_nchw(np.asarray(got_pe)), ref_pe,
                               rtol=1e-4, atol=1e-4)


def test_mask_decoder_matches():
    torch.manual_seed(1)
    ref_tx = RefTwoWay(depth=2, embedding_dim=EMBED, num_heads=4,
                       mlp_dim=64)
    ref = RefMaskDecoder(
        transformer_dim=EMBED, transformer=ref_tx,
        use_high_res_features=True, pred_obj_scores=True,
        pred_obj_scores_mlp=True, use_multimask_token_for_obj_ptr=True,
        dynamic_multimask_via_stability=True,
        iou_head_hidden_dim=EMBED).eval()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    model = MaskDecoder(transformer_dim=EMBED, use_high_res_features=True,
                        two_way_heads=4, two_way_mlp_dim=64,
                        iou_head_hidden_dim=EMBED)

    rng = np.random.default_rng(1)
    b, h, w = 2, 8, 8
    img = rng.standard_normal((b, h, w, EMBED)).astype(np.float32)
    pe = rng.standard_normal((1, h, w, EMBED)).astype(np.float32)
    sparse = rng.standard_normal((b, 3, EMBED)).astype(np.float32)
    dense = rng.standard_normal((b, h, w, EMBED)).astype(np.float32)
    # high-res skips arrive pre-projected (d/8 and d/4 channels) — the
    # conv_s0/s1 projections run outside the decoder forward in SAM2Base
    s0 = rng.standard_normal((b, 4 * h, 4 * w, EMBED // 8)).astype(
        np.float32)
    s1 = rng.standard_normal((b, 2 * h, 2 * w, EMBED // 4)).astype(
        np.float32)

    for multimask in (True, False):
        with torch.no_grad():
            r_masks, r_iou, r_tok, r_obj = ref(
                image_embeddings=torch.from_numpy(_nchw(img)),
                image_pe=torch.from_numpy(_nchw(pe)),
                sparse_prompt_embeddings=torch.from_numpy(sparse.copy()),
                dense_prompt_embeddings=torch.from_numpy(_nchw(dense)),
                multimask_output=multimask, repeat_image=False,
                high_res_features=[torch.from_numpy(_nchw(s0)),
                                   torch.from_numpy(_nchw(s1))])
        g_masks, g_iou, g_tok, g_obj = model.apply(
            params, img, pe, sparse, dense, multimask,
            high_res_features=(s0, s1))
        np.testing.assert_allclose(np.asarray(g_masks), r_masks.numpy(),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"multimask={multimask}")
        np.testing.assert_allclose(np.asarray(g_iou), r_iou.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g_tok), r_tok.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(g_obj), r_obj.numpy(),
                                   rtol=2e-3, atol=2e-3)


def test_fpn_neck_matches():
    torch.manual_seed(2)
    chans = [128, 64, 48, 32]  # high-stride first (reference convention)
    ref = RefFpnNeck(position_encoding=PositionEmbeddingSine(num_pos_feats=32),
                     d_model=32, backbone_channel_list=chans,
                     fpn_top_down_levels=[2, 3],
                     fpn_interp_model="nearest").eval()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    model = FpnNeck(d_model=32, backbone_channel_list=tuple(chans),
                    fpn_top_down_levels=(2, 3), fpn_interp_model="nearest")

    rng = np.random.default_rng(2)
    sizes = [32, 16, 8, 4]
    xs = [rng.standard_normal((1, s, s, c)).astype(np.float32)
          for s, c in zip(sizes, chans[::-1])]
    with torch.no_grad():
        ref_out, ref_pos = ref([torch.from_numpy(_nchw(x)) for x in xs])
    got_out, got_pos = model.apply(params, xs)
    for i in range(4):
        np.testing.assert_allclose(_nchw(np.asarray(got_out[i])),
                                   ref_out[i].numpy(), rtol=1e-4,
                                   atol=1e-4, err_msg=f"level {i}")
        np.testing.assert_allclose(_nchw(np.asarray(got_pos[i])),
                                   ref_pos[i].numpy(), rtol=1e-4,
                                   atol=1e-4)
