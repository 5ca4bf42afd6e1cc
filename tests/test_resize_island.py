"""Fused W-resize+island kernel vs the composite (resize2d +
packed_island_head) reference, interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.resize_island import (_composite_reference,
                                          fused_resize_island)


def _inputs(n, h, w, c, o=32, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    feat = jnp.asarray(r(n, h, w, c))
    w1 = jnp.asarray(r(3, 3, c, o) / np.sqrt(9 * c))
    b1 = jnp.asarray(0.1 * r(o))
    w2 = jnp.asarray(r(o, 1) / np.sqrt(o))
    b2 = jnp.asarray(0.1 * r(1))
    return feat, w1, b1, w2, b2


@pytest.mark.parametrize("n,h,w,c,out_hw", [
    (2, 37, 37, 128, (64, 64)),     # pack-divisible output width
    (1, 21, 21, 128, (37, 37)),     # odd output width (G*4 crop) + relu
    (1, 30, 30, 256, (53, 53)),     # wider channels
])
def test_fused_matches_composite(n, h, w, c, out_hw):
    args = _inputs(n, h, w, c)
    with pltpu.force_tpu_interpret_mode():
        got = fused_resize_island(*args, out_hw, False, 1.0)
    want = _composite_reference(*args, out_hw, False, 1.0)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_sigmoid_head():
    args = _inputs(1, 19, 19, 128, seed=3)
    with pltpu.force_tpu_interpret_mode():
        got = fused_resize_island(*args, (40, 40), True, 20.0)
    want = _composite_reference(*args, (40, 40), True, 20.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_composite():
    args = _inputs(1, 16, 16, 128, seed=4)

    def loss(fn, feat, w1):
        out = fn(feat, w1, *args[2:], (29, 29), False, 1.0)
        return jnp.sum(out ** 2)

    def k_fn(*a):
        with pltpu.force_tpu_interpret_mode():
            return fused_resize_island(*a)

    gk = jax.grad(lambda f, w: loss(k_fn, f, w), argnums=(0, 1))(
        args[0], args[1])
    gr = jax.grad(lambda f, w: loss(_composite_reference, f, w),
                  argnums=(0, 1))(args[0], args[1])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
