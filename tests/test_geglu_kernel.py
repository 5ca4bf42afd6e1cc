"""Fused LN+GEGLU kernel vs the unfused reference math (interpret mode
on the CPU mesh) + gradient parity of the recompute backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.geglu import _reference_tail, fused_ln_geglu_residual


def _inputs(n, c, mult=4, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    f = c * mult
    x = jnp.asarray(r(n, c), dtype)
    ls = jnp.asarray(1 + 0.1 * r(c))
    lb = jnp.asarray(0.1 * r(c))
    w0 = jnp.asarray(r(c, 2 * f) / np.sqrt(c))
    b0 = jnp.asarray(0.1 * r(2 * f))
    w2 = jnp.asarray(r(f, c) / np.sqrt(f))
    b2 = jnp.asarray(0.1 * r(c))
    return x, ls, lb, w0, b0, w2, b2


@pytest.mark.parametrize("n,c", [(300, 256), (64, 128)])
def test_kernel_matches_reference(n, c):
    args = _inputs(n, c)
    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_geglu_residual(*args)
    want = _reference_tail(*args, eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_matches_motion_feedforward():
    """The kernel must reproduce LayerNorm+FeedForward+residual from
    vdn.nn.motion (the XLA path the CPU parity tests exercise)."""
    from vdn.nn.layers import LayerNorm
    from vdn.nn.motion import FeedForward

    class Tail(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x):
            return FeedForward(x.shape[-1], name="ff")(
                LayerNorm(name="ff_norm")(x)) + x

    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (40, 128)).astype(np.float32))
    m = Tail()
    params = m.init(jax.random.PRNGKey(0), x)
    want = m.apply(params, x)
    p = params["params"]
    with pltpu.force_tpu_interpret_mode():
        got = fused_ln_geglu_residual(
            x, p["ff_norm"]["scale"], p["ff_norm"]["bias"],
            p["ff"]["net_0"]["proj"]["kernel"],
            p["ff"]["net_0"]["proj"]["bias"],
            p["ff"]["net_2"]["kernel"], p["ff"]["net_2"]["bias"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_gradients_match_reference():
    args = _inputs(48, 128, seed=2)

    def loss_k(x, w0):
        with pltpu.force_tpu_interpret_mode():
            out = fused_ln_geglu_residual(x, args[1], args[2], w0,
                                          *args[4:])
        return jnp.sum(out ** 2)

    def loss_r(x, w0):
        out = _reference_tail(x, args[1], args[2], w0, *args[4:],
                              eps=1e-6)
        return jnp.sum(out ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(args[0], args[3])
    gr = jax.grad(loss_r, argnums=(0, 1))(args[0], args[3])
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
