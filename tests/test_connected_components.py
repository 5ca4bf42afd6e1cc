"""Native CCL kernel vs scipy ground truth."""

import numpy as np
from scipy import ndimage

from vdn.ops import connected_components as cc


def _random_masks(seed, n=3, h=48, w=64, p=0.4):
    return (np.random.default_rng(seed).random((n, h, w)) < p)


def test_native_matches_scipy():
    masks = _random_masks(0)
    labels, areas = cc.get_connected_components(masks)
    assert cc._load_native() is not None, "native lib must build"
    structure = np.ones((3, 3), np.int32)
    for i in range(masks.shape[0]):
        ref_lab, num = ndimage.label(masks[i], structure=structure)
        # label IDs may differ; compare partitions + areas
        assert (labels[i] > 0).sum() == (ref_lab > 0).sum()
        assert labels[i].max() == num
        counts = np.bincount(ref_lab.ravel())
        counts[0] = 0
        np.testing.assert_array_equal(areas[i], counts[ref_lab])
        # same-partition check: each ref component maps to one label
        for comp in range(1, num + 1):
            sel = ref_lab == comp
            assert len(np.unique(labels[i][sel])) == 1


def test_empty_and_full():
    empty = np.zeros((1, 8, 8), bool)
    lab, area = cc.get_connected_components(empty)
    assert lab.max() == 0 and area.max() == 0
    full = np.ones((1, 8, 8), bool)
    lab, area = cc.get_connected_components(full)
    assert lab.max() == 1 and area.max() == 64


def test_fill_holes():
    mask = np.ones((1, 10, 10), np.float32)
    mask[0, 4:6, 4:6] = -1.0   # small hole
    out = cc.fill_holes_in_mask_scores(mask, max_area=8)
    assert (out > 0).all()
    big = np.ones((1, 10, 10), np.float32)
    big[0, :, :5] = -1.0  # large region stays
    out2 = cc.fill_holes_in_mask_scores(big, max_area=8)
    assert (out2[0, :, :5] < 0).all()


def test_nchw_shape():
    masks = _random_masks(1)[:, None]
    lab, area = cc.get_connected_components(masks)
    assert lab.shape == masks.shape
