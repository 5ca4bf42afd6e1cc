"""Generate tiny real-format data fixtures into tests/fixtures/.

Breaks the round-1 circularity where dataset tests wrote files through the
same code they tested: the .dpt bytes here come from struct.pack (not the
numpy reader's inverse), and the Hypersim expected values come from the
REFERENCE's own distance->depth implementation, stored as literal arrays.

Run from the repo root: python tools/make_data_fixtures.py
"""

from __future__ import annotations

import os
import struct
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "tests", "fixtures")


def sintel_dpt():
    """Hand-packed .dpt (tag 202021.25, w, h, row-major float32)."""
    h, w = 5, 6
    rng = np.random.default_rng(21)
    depth = (rng.random((h, w)) * 40 + 0.5).astype(np.float32)
    buf = struct.pack("<f", 202021.25) + struct.pack("<ii", w, h)
    for v in depth.reshape(-1):
        buf += struct.pack("<f", float(v))
    with open(os.path.join(OUT, "sintel.dpt"), "wb") as f:
        f.write(buf)
    np.save(os.path.join(OUT, "sintel_expected.npy"), depth)
    print("sintel.dpt", len(buf), "bytes")


def hypersim_h5():
    """Full-frame (768x1024) smooth distance field (gzip h5) + the
    reference implementation's planar-depth output on a 32x32 probe."""
    import h5py
    from tests import _reference
    _reference.add_reference_to_path()
    sys.path.insert(0, os.path.join("/root/reference", "metric_depth"))
    from dataset.hypersim import hypersim_distance_to_depth as ref_convert

    yy, xx = np.mgrid[0:768, 0:1024].astype(np.float32)
    distance = 5.0 + 3.0 * np.sin(xx / 200) * np.cos(yy / 150)
    distance = np.round(distance * 64) / 64  # quantize -> gzip-friendly
    distance[10:20, 30:40] = np.nan  # hypersim NaN holes
    with h5py.File(os.path.join(OUT, "hypersim_dist.h5"), "w") as f:
        f.create_dataset("dataset", data=distance.astype(np.float32),
                         compression="gzip", compression_opts=9)
    import torch
    expected = ref_convert(torch.from_numpy(distance)).numpy()
    probe = expected[::24, ::32]  # 32x32 probe grid
    np.save(os.path.join(OUT, "hypersim_expected_probe.npy"),
            probe.astype(np.float32))
    print("hypersim_dist.h5",
          os.path.getsize(os.path.join(OUT, "hypersim_dist.h5")), "bytes")


def vkitti2_png():
    """uint16 depth-in-centimeters png (cv2-written standard PNG)."""
    import cv2
    rng = np.random.default_rng(22)
    cm = (rng.random((8, 10)) * 12000).astype(np.uint16)
    cm[0, 0] = 65535  # beyond the 80 m valid cutoff
    assert cv2.imwrite(os.path.join(OUT, "vkitti2_depth.png"), cm)
    np.save(os.path.join(OUT, "vkitti2_expected_m.npy"),
            cm.astype(np.float32) / 100.0)
    print("vkitti2_depth.png written")


def main():
    os.makedirs(OUT, exist_ok=True)
    sintel_dpt()
    hypersim_h5()
    vkitti2_png()


if __name__ == "__main__":
    main()
