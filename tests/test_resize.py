"""resize2d must match torch.nn.functional.interpolate bit-for-bit-ish.

Covers every interpolate call-site convention used by the reference:
bilinear align_corners=True (DPT fusion path), bicubic half-pixel with
explicit scale_factor (pos-embed interpolation), nearest, and down/up sizes.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vdn.ops.resize import interpolate_like_torch, resize2d


def _torch_resize(x_nhwc, **kw):
    t = torch.from_numpy(np.ascontiguousarray(np.moveaxis(x_nhwc, -1, 1)))
    y = F.interpolate(t, **kw)
    return np.moveaxis(y.numpy(), 1, -1)


CASES = [
    dict(size=(37, 37), mode="bilinear", align_corners=True),
    dict(size=(64, 48), mode="bilinear", align_corners=True),
    dict(size=(7, 9), mode="bilinear", align_corners=True),   # downsample
    dict(size=(64, 48), mode="bilinear", align_corners=False),
    dict(size=(5, 5), mode="bilinear", align_corners=False),  # downsample
    dict(size=(64, 48), mode="bicubic", align_corners=False),
    dict(size=(64, 48), mode="bicubic", align_corners=True),
    dict(size=(9, 11), mode="bicubic", align_corners=False),  # downsample
    dict(size=(40, 40), mode="nearest"),
    dict(size=(13, 13), mode="nearest"),
    dict(scale_factor=2.0, mode="bilinear", align_corners=True),
    dict(scale_factor=(1.3513, 2.7), mode="bicubic", align_corners=False),
    dict(scale_factor=(0.5678, 0.9), mode="bicubic", align_corners=False),
]


@pytest.mark.parametrize("case", CASES)
def test_matches_torch(case):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 19, 23, 3)).astype(np.float32)
    ref = _torch_resize(x, **case)
    kw = dict(case)
    got = np.asarray(interpolate_like_torch(
        x, size=kw.pop("size", None), scale_factor=kw.pop("scale_factor", None),
        mode=kw.pop("mode"), align_corners=kw.pop("align_corners", False)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_identity_is_noop():
    x = np.random.default_rng(1).standard_normal((1, 8, 8, 2)).astype(np.float32)
    y = resize2d(x, (8, 8), "bilinear", align_corners=True)
    np.testing.assert_array_equal(np.asarray(y), x)


def test_pos_embed_convention():
    """The exact call from reference dinov2.py:199-205: bicubic with
    scale_factor=(w0+0.1)/sqrt(N), antialias=False."""
    N = 49  # 7x7 grid
    w0, h0 = 11 + 0.1, 9 + 0.1
    sx, sy = w0 / np.sqrt(N), h0 / np.sqrt(N)
    x = np.random.default_rng(2).standard_normal((1, 7, 7, 16)).astype(np.float32)
    ref = _torch_resize(x, scale_factor=(sx, sy), mode="bicubic",
                        align_corners=False)
    got = np.asarray(interpolate_like_torch(
        x, scale_factor=(sx, sy), mode="bicubic", align_corners=False))
    assert got.shape == ref.shape == (1, 11, 9, 16)
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
