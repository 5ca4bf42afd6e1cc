"""W8A8-dynamic int8 convolution (serving mode) — XLA-level.

Unlike the encoder matmuls (vdn/ops/pallas/int8.py, where an XLA-level
wrapper lost to bf16 because the quantized operands round-tripped HBM
between two custom-calls), convolutions quantize WELL at the XLA level
on TPU: `lax.conv_general_dilated` with int8 operands and
``preferred_element_type=int32`` lowers straight to the 394-TOPS int8
MXU path (tools/bench_int8_conv.py: 2.1x at the refinenet shape, ~8x at
296^2/C=64 where bf16 tiles badly), and the quantize/dequantize
elementwise passes fuse into the neighbouring producers/epilogues.

Scale granularity:
- weights: symmetric per-output-channel, s_o = amax|w[..., o]| / 127
  (recomputed per dispatch from the float params — cheap: the kernel is
  [kh, kw, Cin, Cout]; production deployments can pre-quantize).
- activations: symmetric per-FRAME (leading axis), s_n = amax|x_n|/127.
  A convolution never mixes batch entries, so per-frame scales are
  EXACT dequantization (each output pixel's int32 accumulator carries a
  single (s_n * s_o) factor) — strictly finer than the standard
  per-tensor conv quantization at zero extra cost.

Used by vdn.nn.layers.Conv2d under the model-level ``quantize="int8"``
serving flag for the DPT-head conv stack (the fp32 output island is
never quantized).  Serving-only: no VJP (jnp.round kills gradients);
the training path never sets the flag.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def quantize_weight_ochan(w):
    """[kh, kw, Cin, Cout] float -> (int8 kernel, fp32 scales [Cout])."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0        # [Cout]
    s = jnp.maximum(s, 1e-30)
    wq = jnp.round(wf / s).astype(jnp.int8)
    return wq, s


def quantize_frames(x):
    """NHWC float -> (int8, fp32 per-frame scales [N, 1, 1, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-30)
    q = jnp.round(xf * (1.0 / s)).astype(jnp.int8)
    return q, s


def int8_conv_enabled(x, kernel_shape, stride=(1, 1),
                      static: bool = False) -> bool:
    """Quantize only where the int8 MXU win beats the extra quantize
    pass (the dynamic per-frame scales cost one read+write of x that
    the float path doesn't pay): enough output rows to tile the
    (32,128) int8 MXU, enough MACs per element that the conv is
    compute-bound, and NOT the highest-resolution convs, where the
    quantize pass cancels the compute saving.  Thresholds from
    tools/bench_int8_conv.py / bench_int8_conv_variants.py slope
    timings on the vitl@518 head shapes (2026-08-19): 148^2 C=256
    3.16 vs 4.26 ms, 74^2 1.4x, 37^2 2.3x; 296^2 was a wash (9.64 vs
    9.66 ms) and is excluded.

    ``static`` (calibrated scales, see int8_conv's ``amax``): the
    round/clamp/convert fuses into the producer — no quantize pass —
    so the resolution exclusion is lifted.

    ``VDN_DISABLE_INT8_CONV=1`` forces the float conv everywhere (A/B
    knob, same convention as VDN_DISABLE_FUSED_MLP)."""
    import os
    if os.environ.get("VDN_DISABLE_INT8_CONV", "0") == "1":
        return False
    kh, kw, cin, cout = kernel_shape
    if cin < 64 or cout < 64:
        return False
    if os.environ.get("VDN_FORCE_INT8"):
        # tests / parity_run self-test on CPU: exercise the quantized
        # conv path at tiny shapes the serving gate would exclude
        return True
    n, h, w = x.shape[0], x.shape[1], x.shape[2]
    oh, ow = h // stride[0], w // stride[1]
    if n * oh * ow < 32 * 1024:
        return False
    if not static and oh * ow > 160 * 160:  # quantize-pass-bound at 296^2
        return False
    # MACs per input element read; 3x3 C>=128 or 1x1 C>=256-ish
    return kh * kw * cout >= 512


def int8_conv(x, kernel, stride, padding, feature_group_count=1,
              amax=None):
    """Drop-in for the fp conv: NHWC x, HWIO float kernel -> x.dtype out.

    ``padding``: list of (lo, hi) pairs (matching
    vdn.nn.layers._conv_nhwc).

    ``amax``: optional CALIBRATED activation absmax (scalar, from a PTQ
    calibration pass — see vdn.nn.layers.Conv2d quantize="int8_static").
    With it the activation scale is static, so XLA fuses the
    round/clamp/convert into the producing op (no extra HBM pass);
    values beyond the calibrated range clip to ±127.  Without it,
    per-frame dynamic scales are exact but cost one read+write of x.

    Cout is processed in <=128-wide chunks: XLA's int8 conv lowering
    runs at ~200 TOP/s with Cout=256 but ~330 TOP/s (84% of the 394-TOPS
    peak) as two Cout=128 convs (tools/bench_int8_conv_variants.py,
    'cout-split2').  The dequant epilogues fuse per chunk; results are
    bit-identical to the unsplit conv (same int32 accumulations).
    """
    assert feature_group_count == 1, "int8 path: no grouped convs"
    wq, sw = quantize_weight_ochan(kernel)
    if amax is None:
        xq, sx = quantize_frames(x)
    else:
        sx = jnp.maximum(amax.astype(jnp.float32), 1e-30) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                      -127, 127).astype(jnp.int8)
    cout = kernel.shape[-1]

    def one(wq_c, sw_c):
        y = lax.conv_general_dilated(
            xq, wq_c, window_strides=stride, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw_c)   # [N,1,1,1] * [chunk]
        return y.astype(x.dtype)

    if cout > 128 and cout % 128 == 0:
        return jnp.concatenate(
            [one(wq[..., c:c + 128], sw[c:c + 128])
             for c in range(0, cout, 128)], axis=-1)
    return one(wq, sw)
