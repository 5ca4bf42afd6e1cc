"""int8 (W8A8 dynamic) serving kernels: vdn/ops/pallas/int8.py.

Three layers of checking:
  1. the quantization math itself (round-trip bounds, exact simulation),
  2. kernels vs a jnp simulation of the *same quantized arithmetic*
     (tight tolerance — validates the kernel, not the quantization),
  3. kernels vs the float path (coarse tolerance — validates that the
     quantization noise is the only difference and is bounded),
plus the model-level gate: a tiny ViT forward with quantize="int8"
stays within quantization noise of the float forward, and the flag is
inert without the TPU gate.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.int8 import (fused_ln_mlp_residual_int8, int8_linear,
                                 quantize_weight_cols)
from vdn.ops.pallas.mlp import _reference_tail


def _sim_quant_rows(xf):
    s = np.maximum(np.max(np.abs(xf), axis=1, keepdims=True) / 127.0,
                   1e-30)
    # round-half-to-even matches jnp.round
    q = np.asarray(jnp.round(jnp.asarray(xf / s)), np.float64)
    return q, s


def _sim_int8_linear(x, w, b):
    xf = np.asarray(x, np.float64)
    wf = np.asarray(w, np.float64)
    sw = np.maximum(np.max(np.abs(wf), axis=0, keepdims=True) / 127.0,
                    1e-30)
    wq = np.asarray(jnp.round(jnp.asarray(wf / sw)), np.float64)
    q, sx = _sim_quant_rows(xf)
    out = (q @ wq) * sx * sw
    if b is not None:
        out = out + np.asarray(b, np.float64)
    return out


def test_quantize_weight_cols_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((96, 160)).astype(np.float32)
    wq, s = jax.jit(quantize_weight_cols)(jnp.asarray(w))
    assert wq.dtype == jnp.int8
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - w)
    # symmetric round: at most half a quantization step per element
    assert (err <= np.asarray(s) / 2 + 1e-7).all()
    # full int8 range is used in every column
    assert (np.abs(np.asarray(wq)).max(axis=0) == 127).all()


def test_int8_linear_matches_simulation():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((96, 128)).astype(np.float32)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    b = rng.standard_normal((256,)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = int8_linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))
    sim = _sim_int8_linear(x, w, b)
    np.testing.assert_allclose(np.asarray(out, np.float64), sim,
                               rtol=1e-5, atol=1e-4)


def test_int8_linear_close_to_float():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((64, 128)).astype(np.float32)
    w = rng.standard_normal((128, 512)).astype(np.float32)
    b = rng.standard_normal((512,)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(int8_linear(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b)))
    ref = x @ w + b
    scale = np.std(ref)
    assert np.abs(out - ref).max() < 0.12 * scale
    # typical (rms) error well under 2% of signal
    assert np.sqrt(np.mean((out - ref) ** 2)) < 0.02 * scale


def test_int8_linear_bf16_and_3d():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 48, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = int8_linear(x, w, None)
    assert out.shape == (2, 48, 256)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(x, np.float32).reshape(-1, 128) @ np.asarray(w)
    d = np.abs(np.asarray(out, np.float32).reshape(-1, 256) - ref)
    assert d.max() < 0.15 * np.std(ref)


def _mlp_args(n=96, c=128, f=256, dtype=jnp.float32, seed=4):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, c)), dtype)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, f)) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(f), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, c)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.05 * rng.standard_normal(c), jnp.float32)
    return x, ln_s, ln_b, w1, b1, w2, b2, gamma


def test_fused_ln_mlp_int8_close_to_float():
    args = _mlp_args()
    ref = np.asarray(_reference_tail(*args, eps=1e-6), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_ln_mlp_residual_int8(*args, eps=1e-6),
                         np.float32)
    x = np.asarray(args[0], np.float32)
    # the residual passes through exactly; compare the MLP contribution
    d = np.abs(out - ref)
    scale = np.std(ref - x)
    assert d.max() < 0.12 * scale
    assert np.sqrt(np.mean(d ** 2)) < 0.02 * scale


def test_fused_ln_mlp_int8_bf16():
    args = _mlp_args(dtype=jnp.bfloat16, seed=5)
    ref = np.asarray(_reference_tail(*args, eps=1e-6), np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_ln_mlp_residual_int8(*args, eps=1e-6),
                         np.float32)
    x = np.asarray(args[0], np.float32)
    scale = np.std(ref - x)
    assert np.abs(out - ref).max() < 0.15 * scale


def test_fused_ln_swiglu_int8_close_to_float():
    from vdn.ops.pallas.int8 import fused_ln_swiglu_residual_int8

    rng = np.random.default_rng(8)
    n, c, f = 96, 128, 192
    x = jnp.asarray(rng.standard_normal((n, c)), jnp.float32)
    ln_s = jnp.asarray(1.0 + 0.1 * rng.standard_normal(c), jnp.float32)
    ln_b = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w12 = jnp.asarray(rng.standard_normal((c, 2 * f)) / np.sqrt(c),
                      jnp.float32)
    b12 = jnp.asarray(0.1 * rng.standard_normal(2 * f), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((f, c)) / np.sqrt(f), jnp.float32)
    b3 = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    gamma = jnp.asarray(1.0 + 0.05 * rng.standard_normal(c), jnp.float32)

    # float reference: LN -> w12 -> silu(x1)*x2 -> w3 -> ls -> residual
    xf = np.asarray(x, np.float64)
    mean = xf.mean(-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(-1, keepdims=True)
    y = (xf - mean) / np.sqrt(var + 1e-6)
    y = y * np.asarray(ln_s) + np.asarray(ln_b)
    x12 = y @ np.asarray(w12) + np.asarray(b12)
    x1, x2 = x12[:, :f], x12[:, f:]
    h = x1 / (1 + np.exp(-x1)) * x2
    ref = xf + (h @ np.asarray(w3) + np.asarray(b3)) * np.asarray(gamma)

    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(fused_ln_swiglu_residual_int8(
            x, ln_s, ln_b, w12, b12, w3, b3, gamma), np.float64)
    scale = np.std(ref - xf)
    d = np.abs(out - ref)
    assert d.max() < 0.15 * scale
    assert np.sqrt(np.mean(d ** 2)) < 0.025 * scale


def test_vit_int8_swiglu_forward_drift():
    """vitg-style block (ffn=swiglufused) through the int8 path."""
    from vdn.nn.vit import DinoVisionTransformer

    kw = dict(embed_dim=128, depth=2, num_heads=4, img_size=56,
              ffn="swiglufused", use_flash=False)
    x = jnp.asarray(np.random.default_rng(9).random((1, 56, 56, 3)),
                    jnp.float32)
    fmodel = DinoVisionTransformer(**kw)
    params = fmodel.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(fmodel.apply(params, x))
    qmodel = DinoVisionTransformer(**kw, quantize="int8")
    os.environ["VDN_FORCE_INT8"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(qmodel.apply(params, x))
    finally:
        del os.environ["VDN_FORCE_INT8"]
    assert not np.allclose(out, ref)
    d = np.abs(out - ref)
    assert d.max() < 0.15 * np.std(ref)
    assert np.sqrt(np.mean(d ** 2)) < 0.03 * np.std(ref)


def test_vit_int8_forward_drift():
    """Model plumbing: tiny ViT, quantize='int8' forced on (CPU interpret
    mode) stays within quantization noise of the float forward."""
    from vdn.nn.vit import DinoVisionTransformer

    kw = dict(embed_dim=128, depth=2, num_heads=4, img_size=56,
              use_flash=False)
    x = jnp.asarray(np.random.default_rng(6).random((1, 56, 56, 3)),
                    jnp.float32)
    fmodel = DinoVisionTransformer(**kw)
    params = fmodel.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(fmodel.apply(params, x))

    qmodel = DinoVisionTransformer(**kw, quantize="int8")
    os.environ["VDN_FORCE_INT8"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(qmodel.apply(params, x))
    finally:
        del os.environ["VDN_FORCE_INT8"]
    assert not np.allclose(out, ref)  # the int8 path actually ran
    d = np.abs(out - ref)
    assert d.max() < 0.15 * np.std(ref)
    assert np.sqrt(np.mean(d ** 2)) < 0.03 * np.std(ref)


def test_vit_int8_flag_inert_off_tpu():
    """Without the force knob the gate requires a real TPU, so the flag
    is a no-op on CPU: bitwise-identical to the float forward."""
    from vdn.nn.vit import DinoVisionTransformer

    kw = dict(embed_dim=128, depth=1, num_heads=4, img_size=56,
              use_flash=False)
    x = jnp.asarray(np.random.default_rng(7).random((1, 56, 56, 3)),
                    jnp.float32)
    fmodel = DinoVisionTransformer(**kw)
    params = fmodel.init(jax.random.PRNGKey(0), x)
    qmodel = DinoVisionTransformer(**kw, quantize="int8")
    np.testing.assert_array_equal(np.asarray(fmodel.apply(params, x)),
                                  np.asarray(qmodel.apply(params, x)))
