"""Sangyu head / head v1 / FusionLayer parity vs reference models/."""

import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()

from models.video_depth_head_v2_sangyu import (  # noqa: E402
    VideoDepthAnythingHeadV2 as RefSangyu)
from models.video_depth_head import (  # noqa: E402
    VideoDepthAnythingHead as RefHeadV1)
from models.fusion_block import FusionLayer as RefFusion  # noqa: E402

from vdn.core.convert import convert_torch_state  # noqa: E402
from vdn.nn.video_heads import (FusionLayer, VideoDepthHeadSangyu,  # noqa
                                VideoDepthHeadV1)


def _to_ref(feat_nhwc):  # [B,S,H,W,C] -> [B,S,C,H,W]
    return np.moveaxis(feat_nhwc, -1, 2).copy()


def test_sangyu_head_matches():
    torch.manual_seed(0)
    ref = RefSangyu(sequence_length=4, attention_feature_levels=[2, 3]).eval()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    model = VideoDepthHeadSangyu(sequence_length=4,
                                 attention_feature_levels=(2, 3))

    rng = np.random.default_rng(0)
    ch = [96, 192, 384, 768]
    sizes = [16, 8, 4, 2]
    feats = [rng.standard_normal((1, 4, sz, sz, c)).astype(np.float32)
             for sz, c in zip(sizes, ch)]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(_to_ref(f)) for f in feats]).numpy()
    got = np.asarray(model.apply(params, feats))
    np.testing.assert_allclose(_to_ref(got), ref_out, rtol=2e-3, atol=2e-3)


def test_head_v1_matches():
    torch.manual_seed(1)
    ref = RefHeadV1(input_dim=384, sequence_length=2,
                    img_size=(56, 56)).eval()
    params = {"params": convert_torch_state(
        _reference.state_dict_numpy(ref),
        convt_patterns=[r"decoder\.\d+\.0\."])}
    model = VideoDepthHeadV1(input_dim=384, sequence_length=2,
                             img_size=(56, 56))
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 16, 384)).astype(np.float32)  # B*S=2
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feats.copy())).numpy()
    got = np.asarray(model.apply(params, feats))
    np.testing.assert_allclose(_to_ref(got), ref_out, rtol=2e-3, atol=2e-3)


def test_fusion_layer_matches():
    torch.manual_seed(2)
    ref = RefFusion(lhs_channels=16, out_channels=8, bn=False,
                    activation=torch.nn.ReLU(False)).eval()
    params = {"params": convert_torch_state(_reference.state_dict_numpy(ref))}
    model = FusionLayer(out_channels=8)
    rng = np.random.default_rng(2)
    lhs = rng.standard_normal((1, 2, 8, 8, 16)).astype(np.float32)
    rhs = rng.standard_normal((1, 2, 16, 16, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(_to_ref(lhs)),
                      torch.from_numpy(_to_ref(rhs))).numpy()
    got = np.asarray(model.apply(params, lhs, rhs))
    np.testing.assert_allclose(_to_ref(got), ref_out, rtol=1e-4, atol=1e-4)


def test_v1_full_parity():
    """Head-to-toe v1 parity vs the reference VideoDepthEstimationModel.

    The reference pulls the MAE hub Hiera over the network (unavailable
    offline), so torch.hub.load is stubbed with the SAM2-variant Hiera both
    sides share (numerics-parity-tested in test_hiera_parity); everything
    else — normal_vector prep, dual-encoder feature sums, the .view layout
    scramble (video_depth_model.py:96-97), the sangyu head, the normal
    reassembly — is the reference's own graph."""
    import jax
    import tests.test_hiera_parity  # noqa: F401 (iopath shim)
    from sam2.modeling.backbones.hieradet import Hiera as RefHiera
    from models.video_depth_model import (
        VideoDepthEstimationModel as RefV1)
    import models.hiera_image_encoder as ref_enc_mod

    from vdn.models.video_depth_v1 import VideoDepthEstimationModel
    from vdn.nn.hiera import HIERA_CONFIGS

    torch.manual_seed(0)

    class FakeHub(torch.nn.Module):
        """hub-hiera interface over the SAM2 hieradet trunk."""

        def __init__(self):
            super().__init__()
            self.trunk = RefHiera(**HIERA_CONFIGS["hiera_tiny"])

        def forward(self, x, return_intermediates=False):
            levels = [f.permute(0, 2, 3, 1).contiguous()
                      for f in self.trunk(x)]
            return None, levels

    orig_hub_load = torch.hub.load
    torch.hub.load = lambda *a, **k: FakeHub()
    try:
        ref = RefV1(sequence_length=2, attention_feature_levels=[2, 3],
                    encoder="hiera_tiny_224", use_final_relu=True).eval()
    finally:
        torch.hub.load = orig_hub_load

    params = {"params": convert_torch_state(
        _reference.state_dict_numpy(ref),
        rename=lambda k: k.replace(".model.trunk.", "."))}
    model = VideoDepthEstimationModel(
        sequence_length=2, encoder="hiera_tiny",
        attention_feature_levels=(2, 3), use_final_relu=True)

    rng = np.random.default_rng(7)
    depth = rng.random((1, 2, 64, 64)).astype(np.float32)
    img = rng.random((1, 2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref_depth, ref_normal = ref(
            torch.from_numpy(depth),
            torch.from_numpy(np.moveaxis(img, -1, 2).copy()))
    got_depth, got_normal = model.apply(params, depth, img)
    np.testing.assert_allclose(np.asarray(got_depth), ref_depth.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_normal), -1, 2),
                               ref_normal.numpy(), rtol=2e-3, atol=2e-3)


def test_v1_model_assembly_smoke():
    """Full v1 assembly: dual Hiera + sangyu head wiring (shapes + finite).
    (The reference's own assembly needs network access for torch-hub Hiera
    and scrambles layouts via .view — see vdn/models/video_depth_v1.py.)"""
    import jax
    from vdn.models.video_depth_v1 import VideoDepthEstimationModel
    model = VideoDepthEstimationModel(
        sequence_length=2, encoder="hiera_tiny",
        attention_feature_levels=(3,), use_final_relu=True)
    rng = np.random.default_rng(3)
    depth = rng.random((1, 2, 64, 64)).astype(np.float32)
    img = rng.random((1, 2, 64, 64, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), depth, img)
    out_depth, normal = model.apply(params, depth, img)
    assert out_depth.shape == (1, 2, 64, 64)
    assert normal.shape == (1, 2, 64, 64, 3)
    assert np.isfinite(np.asarray(out_depth)).all()
    assert (np.asarray(out_depth) >= 0).all()  # final relu


def test_head_v2_matches():
    from models.video_depth_head_v2 import (
        VideoDepthAnythingHeadV2 as RefHeadV2)
    from vdn.nn.video_heads import VideoDepthHeadV2
    torch.manual_seed(4)
    ref = RefHeadV2(sequence_length=2).eval()
    params = {"params": convert_torch_state(
        _reference.state_dict_numpy(ref),
        convt_patterns=[r"upscale_layers\.\d+\.0\.",
                        r"final_upscale_layer\.0\.",
                        r"final_upscale_layer\.3\."])}
    model = VideoDepthHeadV2(sequence_length=2)
    rng = np.random.default_rng(4)
    ch = [96, 192, 384, 768]
    sizes = [16, 8, 4, 2]
    feats = [rng.standard_normal((1, 2, sz, sz, c)).astype(np.float32)
             for sz, c in zip(sizes, ch)]
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(_to_ref(f)) for f in feats]).numpy()
    got = np.asarray(model.apply(params, feats))
    np.testing.assert_allclose(_to_ref(got), ref_out, rtol=2e-3, atol=2e-3)
