"""Pallas banded-matmul resize vs the take-based reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vdn.ops.resize as vresize


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    monkeypatch.setattr(vresize, "_FORCE_PALLAS", True)
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def _no_pallas(presize):
    return [(presize, "supports", lambda *a, **k: False),
            (presize, "supports_rows", lambda *a, **k: False)]


def _ref(x, out_hw, method, align_corners):
    # take path, both pallas kernels disabled
    import vdn.ops.pallas.resize as presize
    saved = [(o, n, getattr(o, n)) for o, n, _ in _no_pallas(presize)]
    for o, n, f in _no_pallas(presize):
        setattr(o, n, f)
    try:
        return np.asarray(vresize.resize2d(x, out_hw, method, align_corners))
    finally:
        for o, n, f in saved:
            setattr(o, n, f)


@pytest.mark.parametrize("in_hw,out_hw,method,ac", [
    ((37, 37), (74, 74), "bilinear", True),
    ((74, 74), (37, 37), "bilinear", True),   # downsample band
    ((19, 37), (37, 74), "bilinear", True),
    ((21, 21), (37, 37), "bicubic", False),
])
def test_matches_take_path(in_hw, out_hw, method, ac):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2,) + in_hw + (128,)), jnp.float32)
    ref = _ref(x, out_hw, method, ac)
    got = np.asarray(vresize.resize2d(x, out_hw, method, ac))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_grad_matches_take_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 19, 19, 128)), jnp.float32)

    def loss_pallas(x):
        y = vresize.resize2d(x, (37, 37), "bilinear", True)
        return jnp.sum(y ** 2)

    g_pallas = np.asarray(jax.grad(loss_pallas)(x))

    import vdn.ops.pallas.resize as presize
    saved = [(o, n, getattr(o, n)) for o, n, _ in _no_pallas(presize)]
    for o, n, f in _no_pallas(presize):
        setattr(o, n, f)
    try:
        g_ref = np.asarray(jax.grad(loss_pallas)(x))
    finally:
        for o, n, f in saved:
            setattr(o, n, f)
    np.testing.assert_allclose(g_pallas, g_ref, rtol=1e-5, atol=1e-5)


def test_unsupported_small_channel_falls_back():
    # M=1 channel: supports() must reject, take path result returned
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 8, 1)),
                    jnp.float32)
    out = vresize.resize2d(x, (16, 16), "bilinear", True)
    assert out.shape == (2, 16, 16, 1)


def test_rows_kernel_matches_take_path():
    """The H-axis outer-row kernel (resize_rows) fwd + bwd vs take path."""
    import vdn.ops.pallas.resize as presize
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 21, 24, 128)), jnp.float32)
    idx_taken = []
    orig = presize.supports_rows
    presize.supports_rows = lambda *a, **k: (idx_taken.append(1),
                                             orig(*a, **k))[1]
    try:
        ref = _ref(x, (37, 40), "bilinear", True)
        got = np.asarray(vresize.resize2d(x, (37, 40), "bilinear", True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
        assert idx_taken, "rows path was never consulted"

        def loss(x):
            return jnp.sum(vresize.resize2d(x, (37, 40), "bilinear",
                                            True) ** 2)

        g_rows = np.asarray(jax.grad(loss)(x))
    finally:
        presize.supports_rows = orig
    saved = [(o, n, getattr(o, n)) for o, n, _ in _no_pallas(presize)]
    for o, n, f in _no_pallas(presize):
        setattr(o, n, f)
    try:
        g_ref = np.asarray(jax.grad(loss)(x))
    finally:
        for o, n, f in saved:
            setattr(o, n, f)
    np.testing.assert_allclose(g_rows, g_ref, rtol=1e-5, atol=1e-5)
