import numpy as np

from vdn.ops.scale_shift import (interpolate_frames_np, scale_and_shift,
                                 scale_and_shift_np, scale_np)


def test_recovers_affine():
    rng = np.random.default_rng(0)
    pred = rng.standard_normal((4, 32, 32)).astype(np.float32)
    target = 2.5 * pred - 0.7
    mask = np.ones_like(pred)
    s, t = scale_and_shift_np(pred, target, mask)
    assert abs(s - 2.5) < 1e-4 and abs(t + 0.7) < 1e-4


def test_jnp_matches_np_batched():
    rng = np.random.default_rng(1)
    pred = rng.standard_normal((3, 16, 16)).astype(np.float32)
    target = rng.standard_normal((3, 16, 16)).astype(np.float32)
    mask = (rng.random((3, 16, 16)) > 0.3).astype(np.float32)
    s, t = scale_and_shift(pred, target, mask)
    for b in range(3):
        s_np, t_np = scale_and_shift_np(pred[b], target[b], mask[b])
        np.testing.assert_allclose(float(s[b]), s_np, rtol=1e-4)
        np.testing.assert_allclose(float(t[b]), t_np, rtol=1e-4, atol=1e-5)


def test_degenerate_returns_identity():
    zeros = np.zeros((1, 4, 4), np.float32)
    s, t = scale_and_shift(zeros, zeros, zeros)
    assert float(s[0]) == 1.0 and float(t[0]) == 0.0


def test_scale_only():
    pred = np.full((8,), 2.0, np.float32)
    target = np.full((8,), 6.0, np.float32)
    assert abs(scale_np(pred, target, np.ones(8)) - 3.0) < 1e-5


def test_interpolate_frames_endpoints():
    pre = [np.full((2, 2), float(i)) for i in range(4)]
    post = [np.full((2, 2), 10.0 + i) for i in range(4)]
    out = interpolate_frames_np(pre, post)
    np.testing.assert_array_equal(out[0], pre[0])
    np.testing.assert_array_equal(out[-1], post[-1])
    np.testing.assert_allclose(out[1], pre[1] * (2 / 3) + post[1] * (1 / 3))
