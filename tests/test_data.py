"""Data layer: synthetic Sintel fixture through dataset/factory/loader."""

import os

import cv2
import numpy as np
import pytest
import yaml

from vdn.data.base import read_dpt_file
from vdn.data.datasets import SintelDataset
from vdn.data.factory import (BatchLoader, ConcatDataset, WeightedSampler,
                              create_datasets)


def _write_dpt(path, arr):
    with open(path, "wb") as f:
        np.float32(202021.25).tofile(f)
        np.int32(arr.shape[1]).tofile(f)
        np.int32(arr.shape[0]).tofile(f)
        arr.astype(np.float32).tofile(f)


@pytest.fixture(scope="module")
def sintel_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sintel")
    rng = np.random.default_rng(0)
    for scene in ["alley_1", "cave_2"]:
        for sub in ["rgb", "depth", "depth_anything_v2"]:
            os.makedirs(root / sub / scene, exist_ok=True)
        for i in range(6):
            rgb = rng.integers(0, 255, (40, 60, 3), np.uint8)
            cv2.imwrite(str(root / "rgb" / scene / f"frame_{i:04d}.png"),
                        rgb)
            depth = rng.random((40, 60)).astype(np.float32) * 10
            _write_dpt(str(root / "depth" / scene / f"frame_{i:04d}.dpt"),
                       depth)
            da = (rng.random((40, 60)) * 65535).astype(np.uint16)
            cv2.imwrite(str(root / "depth_anything_v2" / scene
                            / f"frame_{i:04d}.png"), da)
    return root


def test_sintel_dataset(sintel_root):
    ds = SintelDataset(str(sintel_root),
                       data_types=["rgb", "depth", "depth_anything_v2",
                                   "mask"],
                       sequence_length=4, sequence_stride=2,
                       output_size=(32, 48))
    # 2 scenes x 2 windows (6 frames, len 4, stride 2)
    assert len(ds) == 4
    item = ds[0]
    assert item["rgb"].shape == (4, 32, 48, 3)
    assert item["rgb"].dtype == np.float32 and item["rgb"].max() <= 1.0
    assert item["depth"].shape == (4, 32, 48)
    assert item["depth_anything_v2"].max() > 255  # uint16 range preserved
    assert item["mask"].dtype == bool and item["mask"].all()


def test_dpt_roundtrip(tmp_path):
    arr = np.random.default_rng(1).random((7, 9)).astype(np.float32)
    _write_dpt(str(tmp_path / "x.dpt"), arr)
    np.testing.assert_array_equal(read_dpt_file(str(tmp_path / "x.dpt")),
                                  arr)


def test_factory_and_loader(sintel_root, tmp_path):
    cfg = {
        "dataset_common": {"sequence_length": 4, "sequence_stride": 2,
                           "output_size": [32, 48],
                           "use_random_crop": True},
        "datasets": {"Sintel": {
            "train_split": 0.5,
            "data_types": ["rgb", "depth", "depth_anything_v2", "mask"],
            "params": {"root_dir": str(sintel_root)},
        }},
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    train = create_datasets(["Sintel"], str(cfg_path), "train")
    val = create_datasets(["Sintel"], str(cfg_path), "val")
    assert len(train[0]) == 2 and len(val[0]) == 2
    concat = ConcatDataset(train)
    sampler = WeightedSampler(concat)
    loader = BatchLoader(concat, batch_size=2, sampler=sampler,
                         num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    b = batches[0]
    assert b["rgb"].shape == (2, 4, 32, 48, 3)
    assert b["depth"].shape == (2, 4, 32, 48)
    assert b["mask"].dtype == bool
    assert len(b["rgb_paths"]) == 2


def test_prefetch_to_device(sintel_root, tmp_path):
    import jax
    import yaml
    from vdn.data.factory import (BatchLoader, ConcatDataset,
                                  create_datasets, prefetch_to_device)
    cfg = {
        "dataset_common": {"sequence_length": 4, "sequence_stride": 2,
                           "output_size": [32, 48],
                           "use_random_crop": False},
        "datasets": {"Sintel": {
            "train_split": 0.5,
            "data_types": ["rgb", "depth", "mask"],
            "params": {"root_dir": str(sintel_root)},
        }},
    }
    cfg_path = tmp_path / "pf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    concat = ConcatDataset(create_datasets(["Sintel"], str(cfg_path),
                                           "train"))
    loader = BatchLoader(concat, batch_size=2, shuffle=False,
                         num_workers=2)
    host = list(loader)
    dev = list(prefetch_to_device(loader, size=2))
    assert len(dev) == len(host)
    for hb, db in zip(host, dev):
        assert isinstance(db["rgb"], jax.Array)
        np.testing.assert_array_equal(np.asarray(db["rgb"]), hb["rgb"])
        assert db["rgb_paths"] == hb["rgb_paths"]  # host passthrough
