"""Radix select (vdn.ops.select) vs sorting — exact order statistics."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vdn.ops.select import kth_smallest, differentiable_value  # noqa: E402


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kth_matches_sort(seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((4, 997)).astype(np.float32) * 100
    x[0, :5] = [0.0, -0.0, np.inf, -np.inf, 3.5]
    x[1, :3] = 7.25  # exact ties
    s = np.sort(x, axis=-1)
    for k in (1, 2, 498, 996, 997):
        got = np.asarray(kth_smallest(jnp.asarray(x), k))
        np.testing.assert_array_equal(got, s[:, k - 1])


def test_kth_traced_k_and_clamp():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 64)).astype(np.float32)
    s = np.sort(x, axis=-1)
    ks = jnp.asarray([1, 32, 64])
    got = np.asarray(jax.jit(kth_smallest)(jnp.asarray(x), ks))
    np.testing.assert_array_equal(got, s[[0, 1, 2], [0, 31, 63]])
    # out-of-range clamps
    np.testing.assert_array_equal(
        np.asarray(kth_smallest(jnp.asarray(x), 0)), s[:, 0])
    np.testing.assert_array_equal(
        np.asarray(kth_smallest(jnp.asarray(x), 999)), s[:, -1])


def test_differentiable_value_grad():
    x = jnp.asarray([[1.0, 5.0, 5.0, 9.0]])
    v = kth_smallest(x, 2)
    np.testing.assert_array_equal(np.asarray(v), [5.0])

    def f(x):
        return jnp.sum(differentiable_value(x, kth_smallest(x, 2)))

    g = np.asarray(jax.grad(f)(x))
    np.testing.assert_allclose(g, [[0.0, 0.5, 0.5, 0.0]])


def test_trimmed_loss_matches_sorted_reference():
    from vdn.train.losses import trimmed_mae_loss

    rng = np.random.default_rng(4)
    pred = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    tgt = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    mask = (rng.random((2, 3, 32, 32)) > 0.2).astype(np.float32)

    # sorted reference (the pre-radix implementation)
    flat = np.abs((pred - tgt).reshape(-1))
    m = mask.reshape(-1) > 0
    vals = np.where(m, flat, np.inf)
    order = np.sort(vals)
    keep = int(np.floor(m.sum() * 0.8))
    want = order[:keep].sum() / mask.sum()

    got = float(trimmed_mae_loss(jnp.asarray(pred), jnp.asarray(tgt),
                                 jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-6)
