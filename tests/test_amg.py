"""AMG utils parity vs reference sam2/utils/amg.py + generator smoke."""

import numpy as np
import pytest
import torch

from tests import _reference

_reference.add_reference_to_path()

from sam2.utils import amg as ref_amg  # noqa: E402

from vdn.ops import amg as M  # noqa: E402


def _random_masks(seed, n=4, h=24, w=32):
    return np.random.default_rng(seed).random((n, h, w)) > 0.6


def test_rle_roundtrip_matches_reference():
    masks = _random_masks(0)
    ref_rles = ref_amg.mask_to_rle_pytorch(torch.from_numpy(masks))
    for i in range(masks.shape[0]):
        got = M.mask_to_rle(masks[i])
        assert got["counts"] == ref_rles[i]["counts"]
        assert got["size"] == ref_rles[i]["size"]
        np.testing.assert_array_equal(M.rle_to_mask(got), masks[i])
        assert M.area_from_rle(got) == int(masks[i].sum())


def test_stability_and_boxes_match():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((5, 16, 20)).astype(np.float32) * 3
    ref = ref_amg.calculate_stability_score(
        torch.from_numpy(logits), 0.0, 1.0).numpy()
    got = M.calculate_stability_score(logits, 0.0, 1.0)
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    masks = _random_masks(2)
    masks[0] = False  # empty mask -> zero box
    ref_boxes = ref_amg.batched_mask_to_box(torch.from_numpy(masks)).numpy()
    got_boxes = M.batched_mask_to_box(masks)
    np.testing.assert_array_equal(got_boxes, ref_boxes)


def test_point_grids_and_crop_boxes_match():
    np.testing.assert_allclose(M.build_point_grid(4),
                               ref_amg.build_point_grid(4))
    ref_boxes, ref_layers = ref_amg.generate_crop_boxes((100, 150), 2, 0.3)
    got_boxes, got_layers = M.generate_crop_boxes((100, 150), 2, 0.3)
    assert got_boxes == ref_boxes and got_layers == ref_layers


def test_remove_small_regions_matches():
    # a big blob with a small hole and a tiny island
    mask = np.zeros((30, 30), bool)
    mask[5:25, 5:25] = True
    mask[10:12, 10:12] = False   # hole of 4 px
    mask[0:2, 27:29] = True      # island of 4 px
    for mode in ("holes", "islands"):
        ref_out, ref_mod = ref_amg.remove_small_regions(mask.copy(), 10,
                                                        mode)
        got_out, got_mod = M.remove_small_regions(mask.copy(), 10, mode)
        np.testing.assert_array_equal(got_out, ref_out)
        assert got_mod == ref_mod


def test_nms_prefers_high_scores():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.5, 0.9, 0.8])
    keep = M.nms_boxes(boxes, scores, 0.5)
    assert list(keep) == [1, 2]


@pytest.mark.slow
def test_automatic_mask_generator_smoke():
    import jax
    from vdn.nn.hiera import HIERA_CONFIGS
    from vdn.models.sam2_image import Sam2ImageModel, Sam2ImagePredictor
    from vdn.pipelines.sam2_amg import Sam2AutomaticMaskGenerator
    HIERA_CONFIGS["amg_mini"] = dict(
        embed_dim=32, num_heads=1, stages=(1, 1, 2, 1),
        global_att_blocks=(3,), window_spec=(8, 4, 14, 7),
        window_pos_embed_bkg_spatial_size=(14, 14))
    model = Sam2ImageModel(trunk_variant="amg_mini", d_model=32,
                           image_size=128)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 128, 128, 3), np.float32))
    pred = Sam2ImagePredictor(model, params)
    gen = Sam2AutomaticMaskGenerator(pred, points_per_side=2,
                                     pred_iou_thresh=-1.0,
                                     stability_score_thresh=0.0)
    img = np.random.default_rng(0).integers(0, 255, (96, 96, 3), np.uint8)
    records = gen.generate(img)
    assert isinstance(records, list)
    for r in records:
        assert set(r) >= {"segmentation", "area", "bbox", "predicted_iou"}
        m = np.asarray(r["segmentation"]["counts"]).sum()
        assert m == 96 * 96  # counts sum to the pixel count


def test_automatic_mask_generator_output_parity(monkeypatch):
    """Full generator output parity vs the reference
    SAM2AutomaticMaskGenerator on a shared hand-built SAM2Base.

    The reference generator needs torchvision (transforms + ops.boxes) and
    torch.jit.script, none usable in this image — shimmed here with
    torch-functional equivalents; the 128x128 input makes the Resize an
    identity so preprocessing matches our cv2 path exactly."""
    import sys
    import types

    import jax

    # --- torchvision shims the reference predictor/generator needs ---
    tvt = sys.modules["torchvision.transforms"]

    class ToTensor:
        def __call__(self, x):
            t = torch.from_numpy(np.asarray(x)).float()
            return t.permute(2, 0, 1) / 255.0

    class Resize(torch.nn.Module):
        def __init__(self, size):
            super().__init__()
            self.size = tuple(size)

        def forward(self, x):
            if x.shape[-2:] == self.size:
                return x
            return torch.nn.functional.interpolate(
                x[None], size=self.size, mode="bilinear",
                antialias=True)[0]

    class Normalize(torch.nn.Module):
        def __init__(self, mean, std):
            super().__init__()
            self.m = torch.tensor(mean).view(-1, 1, 1)
            self.s = torch.tensor(std).view(-1, 1, 1)

        def forward(self, x):
            return (x - self.m) / self.s

    tvt.ToTensor, tvt.Resize, tvt.Normalize = ToTensor, Resize, Normalize

    def box_area(b):
        return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])

    def batched_nms(boxes, scores, idxs, iou_threshold):
        order = scores.argsort(descending=True)
        suppressed = torch.zeros(len(boxes), dtype=torch.bool)
        keep = []
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            x1 = torch.maximum(boxes[:, 0], boxes[i, 0])
            y1 = torch.maximum(boxes[:, 1], boxes[i, 1])
            x2 = torch.minimum(boxes[:, 2], boxes[i, 2])
            y2 = torch.minimum(boxes[:, 3], boxes[i, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            iou = inter / (box_area(boxes) + box_area(boxes[i]) - inter)
            suppressed |= (iou > iou_threshold) & (idxs == idxs[i])
        return torch.tensor(keep, dtype=torch.long)

    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.batched_nms, boxes_mod.box_area = batched_nms, box_area
    ops.boxes = boxes_mod
    sys.modules["torchvision"].ops = ops
    monkeypatch.setitem(sys.modules, "torchvision.ops", ops)
    monkeypatch.setitem(sys.modules, "torchvision.ops.boxes", boxes_mod)
    monkeypatch.setattr(torch.jit, "script", lambda m, *a, **k: m)

    from tests.test_sam2_image_parity import _build_ref, TRUNK_CFG, D
    from sam2.automatic_mask_generator import SAM2AutomaticMaskGenerator
    from tests.test_sam2_image_parity import _drop_memory_keys
    from vdn.core.convert import convert_torch_state
    from vdn.nn.hiera import HIERA_CONFIGS
    from vdn.models.sam2_image import Sam2ImageModel, Sam2ImagePredictor
    from vdn.pipelines.sam2_amg import Sam2AutomaticMaskGenerator
    from vdn.ops.amg import rle_to_mask

    torch.manual_seed(0)
    ref_model = _build_ref()
    kwargs = dict(points_per_side=3, points_per_batch=4,
                  pred_iou_thresh=0.0, stability_score_thresh=0.0,
                  stability_score_offset=1.0, box_nms_thresh=0.7,
                  crop_n_layers=0, min_mask_region_area=0)
    ref_gen = SAM2AutomaticMaskGenerator(model=ref_model,
                                         output_mode="binary_mask",
                                         **kwargs)
    # the reference predictor hardcodes 1024-px feature sizes
    # (sam2_image_predictor.py _bb_feat_sizes); fix for image_size=128
    ref_gen.predictor._bb_feat_sizes = [(32, 32), (16, 16), (8, 8)]

    params = {"params": convert_torch_state(
        _reference.state_dict_numpy(ref_model), rename=_drop_memory_keys)}
    HIERA_CONFIGS["tiny_test"] = dict(TRUNK_CFG)
    model = Sam2ImageModel(trunk_variant="tiny_test", d_model=D,
                           image_size=128)
    got_gen = Sam2AutomaticMaskGenerator(
        Sam2ImagePredictor(model, params), **kwargs)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (128, 128, 3), np.uint8)
    with torch.no_grad():
        ref_records = ref_gen.generate(img)
    got_records = got_gen.generate(img)

    assert len(got_records) == len(ref_records) > 0

    def key(rec, seg):
        return (tuple(int(v) for v in rec["bbox"]), int(seg.sum()))

    ref_set = {key(r, r["segmentation"]) for r in ref_records}
    got_set = {key(r, rle_to_mask(r["segmentation"])) for r in got_records}
    assert got_set == ref_set
    # score-level agreement on matched records
    ref_by_key = {key(r, r["segmentation"]): r for r in ref_records}
    for r in got_records:
        k = key(r, rle_to_mask(r["segmentation"]))
        np.testing.assert_allclose(r["predicted_iou"],
                                   ref_by_key[k]["predicted_iou"],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(r["stability_score"],
                                   ref_by_key[k]["stability_score"],
                                   rtol=1e-3, atol=1e-3)
