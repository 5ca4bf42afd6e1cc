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


# ---------------- int8 convolution (vdn/ops/int8_conv.py) ----------------


def _sim_int8_conv(x, w):
    """numpy/float64 simulation of the exact quantized conv arithmetic:
    per-frame activation scales, per-output-channel weight scales."""
    import torch
    xf = np.asarray(x, np.float64)
    wf = np.asarray(w, np.float64)
    sw = np.maximum(np.abs(wf).max(axis=(0, 1, 2)) / 127.0, 1e-30)
    wq = np.asarray(jnp.round(jnp.asarray(wf / sw)), np.float64)
    sx = np.maximum(np.abs(xf).max(axis=(1, 2, 3), keepdims=True) / 127.0,
                    1e-30)
    q = np.asarray(jnp.round(jnp.asarray(xf / sx)), np.float64)
    y = torch.nn.functional.conv2d(
        torch.from_numpy(q.transpose(0, 3, 1, 2)),
        torch.from_numpy(wq.transpose(3, 2, 0, 1)), padding=1).numpy()
    return y.transpose(0, 2, 3, 1) * sx * sw


def test_int8_conv_matches_simulation():
    from vdn.ops.int8_conv import int8_conv

    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 9, 11, 64)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 64, 96)) * 0.05).astype(np.float32)
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w), (1, 1),
                               [(1, 1), (1, 1)]), np.float64)
    want = _sim_int8_conv(x, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int8_conv_close_to_float():
    from vdn.ops.int8_conv import int8_conv

    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 17, 13, 64)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 64, 64)) * 0.05).astype(np.float32)
    got = np.asarray(int8_conv(jnp.asarray(x), jnp.asarray(w), (1, 1),
                               [(1, 1), (1, 1)]))
    ref = np.asarray(jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    d = np.abs(got - ref)
    assert np.sqrt(np.mean(d ** 2)) < 0.02 * np.std(ref)
    assert d.max() < 0.15 * np.std(ref)


def test_conv2d_int8_gate():
    """Conv2d(quantize='int8'): small shapes fall back to the float conv
    bitwise; gate-passing shapes actually quantize."""
    from vdn.nn.layers import Conv2d

    rng = np.random.default_rng(10)
    # below the row gate -> float path, bitwise identical
    x_small = jnp.asarray(rng.standard_normal((1, 16, 16, 64)), jnp.float32)
    conv_f = Conv2d(64, (3, 3), padding=1)
    conv_q = Conv2d(64, (3, 3), padding=1, quantize="int8")
    params = conv_f.init(jax.random.PRNGKey(0), x_small)
    np.testing.assert_array_equal(
        np.asarray(conv_f.apply(params, x_small)),
        np.asarray(conv_q.apply(params, x_small)))
    # above the gate (8*64*64 = 32768 output rows) -> int8 path engages
    x_big = jnp.asarray(rng.standard_normal((8, 64, 64, 64)), jnp.float32)
    f = np.asarray(conv_f.apply(params, x_big))
    q = np.asarray(conv_q.apply(params, x_big))
    assert not np.array_equal(f, q)
    d = np.abs(f - q)
    assert np.sqrt(np.mean(d ** 2)) < 0.02 * np.std(f)


def test_dpt_head_int8_drift():
    """Model plumbing: the DPT head with quantize='int8' (conv gate
    forced by a big-enough frame count) stays within quantization noise
    of the float head, and the fp32 output island is never quantized
    (the final convs' inputs differ only by upstream noise)."""
    from vdn.nn.dpt import DPTHead

    rng = np.random.default_rng(11)
    ph = pw = 8
    frames, c = 8, 64
    feats = [(jnp.asarray(rng.standard_normal((frames, ph * pw, c)),
                          jnp.float32), None) for _ in range(4)]
    kw = dict(in_channels=c, features=128, out_channels=(96, 128, 160, 192))
    fhead = DPTHead(**kw)
    params = fhead.init(jax.random.PRNGKey(0), feats, ph, pw)
    ref = np.asarray(fhead.apply(params, feats, ph, pw)[0])
    qhead = DPTHead(**kw, quantize="int8")
    out = np.asarray(qhead.apply(params, feats, ph, pw)[0])
    assert not np.allclose(out, ref)  # some conv took the int8 path
    d = np.abs(out - ref)
    assert np.sqrt(np.mean(d ** 2)) < 0.05 * np.std(ref), (
        np.sqrt(np.mean(d ** 2)) / np.std(ref))


def test_conv2d_int8_static_calibration():
    """quantize='int8_static': a mutable-quant_stats apply is the PTQ
    calibration pass — float-identical output, records amax; afterwards
    serving uses the stored scale and stays close to float.  Calibration
    state resolves at TRACE time (has_variable — no runtime cond), so an
    uncalibrated apply IS the dynamic per-frame path, bitwise."""
    from vdn.nn.layers import Conv2d

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 64)), jnp.float32)
    conv_f = Conv2d(64, (3, 3), padding=1)
    conv_d = Conv2d(64, (3, 3), padding=1, quantize="int8")
    conv_s = Conv2d(64, (3, 3), padding=1, quantize="int8_static")
    variables = conv_s.init(jax.random.PRNGKey(0), x)
    # the stats variable is only born in a calibration pass
    assert "quant_stats" not in variables
    fparams = {"params": variables["params"]}

    ref = np.asarray(conv_f.apply(fparams, x))

    # uncalibrated static == dynamic, bitwise (identical trace)
    np.testing.assert_array_equal(
        np.asarray(conv_s.apply(variables, x)),
        np.asarray(conv_d.apply(fparams, x)))

    # calibration pass: float output + recorded stats
    out_cal, muts = conv_s.apply(variables, x, mutable=["quant_stats"])
    np.testing.assert_array_equal(np.asarray(out_cal), ref)
    amax = float(muts["quant_stats"]["act_amax"])
    np.testing.assert_allclose(amax, float(jnp.max(jnp.abs(x))), rtol=1e-6)

    # calibrated serving: int8 engaged, bounded noise
    out = np.asarray(conv_s.apply({**variables, **muts}, x))
    assert not np.array_equal(out, ref)
    d = np.abs(out - ref)
    assert np.sqrt(np.mean(d ** 2)) < 0.02 * np.std(ref)


def test_int8_static_pipeline_plumbing():
    """quantize="int8_static" through the real serving pipelines: the
    first window / first frame runs the PTQ calibration pass and merges
    the recorded stats into the params.  At test shapes every conv
    fails the int8 size gate (and the encoder kernels are TPU-only), so
    the outputs must be BIT-IDENTICAL to the float model — this checks
    the calibration plumbing, not the quantized numerics (covered
    above)."""
    from vdn.models.video_depth_anything import VideoDepthAnything
    from vdn.pipelines.infer_video import infer_video_depth
    from vdn.pipelines.stream import VideoDepthStreamPipeline

    kw = dict(encoder="vits", features=64, out_channels=(48, 96, 192, 384),
              use_flash=False)
    fmodel = VideoDepthAnything(**kw)
    qmodel = VideoDepthAnything(**kw, quantize="int8_static")
    params = jax.jit(fmodel.init)(
        jax.random.PRNGKey(0), np.zeros((1, 2, 56, 56, 3), np.float32))
    rng = np.random.default_rng(21)
    frames = rng.integers(0, 256, size=(36, 64, 64, 3), dtype=np.uint8)

    ref, _ = infer_video_depth(fmodel, params, frames, 24, input_size=56)
    got, _ = infer_video_depth(qmodel, params, frames, 24, input_size=56)
    np.testing.assert_array_equal(got, ref)

    fpipe = VideoDepthStreamPipeline(fmodel, params, input_size=56)
    qpipe = VideoDepthStreamPipeline(qmodel, params, input_size=56)
    for i in range(3):
        np.testing.assert_array_equal(
            qpipe.infer_video_depth_one(frames[i]),
            fpipe.infer_video_depth_one(frames[i]))
    assert "quant_stats" in qpipe.params  # calibration actually ran


def test_dpt_head_int8_static_pipeline_shapes():
    """Model-level static PTQ: calibrate a DPT head via mutable apply,
    then serve; output within quantization noise of float, and the
    quant_stats tree has one amax per head conv."""
    from vdn.nn.dpt import DPTHead

    rng = np.random.default_rng(13)
    ph = pw = 8
    frames, c = 8, 64
    feats = [(jnp.asarray(rng.standard_normal((frames, ph * pw, c)),
                          jnp.float32), None) for _ in range(4)]
    kw = dict(in_channels=c, features=128, out_channels=(96, 128, 160, 192))
    fhead = DPTHead(**kw)
    variables = fhead.init(jax.random.PRNGKey(0), feats, ph, pw)
    ref = np.asarray(fhead.apply(
        {"params": variables["params"]}, feats, ph, pw)[0])

    shead = DPTHead(**kw, quantize="int8_static")
    svars = shead.init(jax.random.PRNGKey(0), feats, ph, pw)
    # params trees must match (quantization adds no parameters, and the
    # quant_stats are only born in a calibration pass)
    assert jax.tree.structure(variables["params"]) == \
        jax.tree.structure(svars["params"])
    assert "quant_stats" not in svars
    svars = {"params": variables["params"]}
    (out_cal, _), muts = shead.apply(svars, feats, ph, pw,
                                     mutable=["quant_stats"])
    np.testing.assert_allclose(np.asarray(out_cal), ref, rtol=1e-6,
                               atol=1e-6)
    out = np.asarray(shead.apply({**svars, **muts}, feats, ph, pw)[0])
    assert not np.allclose(out, ref)
    d = np.abs(out - ref)
    assert np.sqrt(np.mean(d ** 2)) < 0.05 * np.std(ref)
