"""Fused temporal-attention kernel vs the XLA reference math
(interpret mode on the CPU mesh; the TPU hot path runs the same kernel
compiled).  Covers both motion-module widths (C=256 dh=32, C=1024
dh=128), non-divisible token counts (OOB rows dropped on store), and
gradient parity of the custom_vjp recompute backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.temporal_attention import (
    temporal_attention_block, xla_temporal_attention_block)


def _inputs(bn, t, c, dtype, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s).astype(np.float32)
    x = jnp.asarray(r(bn, t, c), dtype)
    pe = jnp.asarray(r(t, c))
    wq, wk, wv, wo = (jnp.asarray(r(c, c) / np.sqrt(c)) for _ in range(4))
    bo = jnp.asarray(r(c) * 0.1)
    return x, pe, wq, wk, wv, wo, bo


@pytest.mark.parametrize("bn,t,c,heads", [
    (300, 32, 256, 8),    # mm2/mm3 width, non-divisible token count
    (64, 32, 1024, 8),    # mm0/mm1 width (block shrinks for VMEM)
    (16, 8, 256, 8),      # short window
])
def test_kernel_matches_xla(bn, t, c, heads):
    args = _inputs(bn, t, c, jnp.float32)
    scale = (c // heads) ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = temporal_attention_block(*args, heads, scale)
    want = xla_temporal_attention_block(*args, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_close_to_fp32():
    args32 = _inputs(128, 32, 256, jnp.float32, seed=1)
    args16 = (args32[0].astype(jnp.bfloat16),) + args32[1:]
    scale = 32 ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = temporal_attention_block(*args16, 8, scale)
    want = xla_temporal_attention_block(*args16, 8, scale)
    # bf16 dot-accumulation reassociation: a few elements land 1-2 bf16
    # ULPs apart (measured max 2^-6 on 1M elements)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2 ** -5)


@pytest.mark.parametrize("bn,t,c,heads", [
    (128, 8, 256, 8),     # v4 train-window shape (t=8, mixer width)
    (24, 32, 1024, 8),    # wide-channel block-shrink path
])
def test_pallas_bwd_dx_matches_xla(bn, t, c, heads):
    """The dx backward kernel (the only live cotangent under the frozen
    canonical recipe) against jax.vjp of the XLA reference."""
    from vdn.ops.pallas.temporal_attention import _fused_bwd_dx_impl

    args = _inputs(bn, t, c, jnp.float32, seed=3)
    x, pe, wq, wk, wv, wo, bo = args
    scale = (c // heads) ** -0.5
    g = jnp.asarray(np.random.default_rng(4).standard_normal(
        (bn, t, c)).astype(np.float32))
    _, vjp = jax.vjp(
        lambda xx: xla_temporal_attention_block(
            xx, pe, wq, wk, wv, wo, bo, heads, scale), x)
    want, = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_bwd_dx_impl(x, pe, g, wq, wk, wv, wo, heads, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_gradients_flow_through_kernel():
    args = _inputs(40, 16, 256, jnp.float32, seed=2)
    scale = 32 ** -0.5

    def loss_k(x, wq):
        with pltpu.force_tpu_interpret_mode():
            out = temporal_attention_block(
                x, args[1], wq, *args[3:], 8, scale)
        return jnp.sum(out ** 2)

    def loss_x(x, wq):
        out = xla_temporal_attention_block(
            x, args[1], wq, *args[3:], 8, scale)
        return jnp.sum(out ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(args[0], args[2])
    gx = jax.grad(loss_x, argnums=(0, 1))(args[0], args[2])
    for a, b in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
