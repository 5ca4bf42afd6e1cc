"""DA-2K protocol, visualization grids, metric datasets (synthetic)."""

import json
import os

import cv2
import numpy as np

from vdn.eval.da2k import evaluate_da2k
from vdn.data.metric_datasets import (KITTI, VKITTI2,
                                      hypersim_distance_to_depth)
from vdn.utils.visualization import create_sample_visualization


def test_da2k_protocol(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images" / "indoor"
    os.makedirs(img_dir)
    cv2.imwrite(str(img_dir / "a.jpg"),
                rng.integers(0, 255, (32, 32, 3), np.uint8))
    ann = {"images/indoor/a.jpg": [
        {"point1": [5, 5], "point2": [20, 20], "closer_point": "point1"},
        {"point1": [10, 10], "point2": [25, 25], "closer_point": "point1"},
    ]}
    (tmp_path / "annotations.json").write_text(json.dumps(ann))

    # gradient depth: top-left is "closest" (largest value)
    def infer(raw):
        h, w = raw.shape[:2]
        yy, xx = np.mgrid[0:h, 0:w]
        return (2 * h - yy - xx).astype(np.float32)

    out = evaluate_da2k(str(tmp_path), infer)
    assert out["accuracy"] == 1.0 and out["num_pairs"] == 2
    # inverted depth gets everything wrong
    out2 = evaluate_da2k(str(tmp_path), lambda r: -infer(r))
    assert out2["accuracy"] == 0.0


def test_visualization_grid(tmp_path):
    rng = np.random.default_rng(1)
    s, h, w = 3, 16, 20
    path = tmp_path / "viz.png"
    create_sample_visualization(
        rgb=rng.random((s, h, w, 3)).astype(np.float32),
        input_depth=rng.random((s, h, w)).astype(np.float32),
        pred_depth=rng.random((s, h, w)).astype(np.float32),
        gt_depth=rng.random((s, h, w)).astype(np.float32),
        residual=None, save_path=str(path))
    assert path.exists() and path.stat().st_size > 1000


def test_hypersim_distance_conversion():
    dist = np.full((768, 1024), 5.0, np.float32)
    depth = hypersim_distance_to_depth(dist)
    assert depth.shape == (768, 1024)
    # center pixel: distance ~= depth; corners: depth < distance
    assert abs(depth[384, 512] - 5.0) < 0.01
    assert depth[0, 0] < 5.0


def test_kitti_vkitti_datasets(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 80, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "img.png"), img)
    depth_png = (rng.random((64, 80)) * 20000).astype(np.uint16)
    cv2.imwrite(str(tmp_path / "depth.png"), depth_png)
    fl = tmp_path / "list.txt"
    fl.write_text(f"{tmp_path}/img.png {tmp_path}/depth.png\n")

    kitti = KITTI(str(fl), mode="val", size=(56, 56))
    s = kitti[0]
    assert s["image"].shape[-1] == 3 and s["image"].shape[0] >= 56
    assert s["depth"].max() <= 65535 / 256.0
    assert s["valid_mask"].dtype == bool

    vk = VKITTI2(str(fl), mode="train", size=(56, 56))
    sv = vk[0]
    assert sv["image"].shape == (56, 56, 3)  # random crop applied
    assert sv["depth"].shape == (56, 56)
    assert (sv["valid_mask"] == (sv["depth"] <= 80)).all()
