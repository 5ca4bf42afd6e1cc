"""int8 (W8A8 dynamic) serving kernels for the encoder matmuls.

TPU v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(394 vs 197 T/s).  The encoder's weight matmuls (qkv, out-proj, fc1,
fc2) carry ~70% of its FLOPs, so quantized serving is the one lever
left after the bf16 path reached its structural floors (d=64 attention
padding, bandwidth-bound head).  Measured on this chip: a raw int8
[43840,1024]x[1024,4096] dot runs 1.74x the bf16 one (0.343 vs 0.596
ms slope-timed) — but an XLA-level quantize/dequant wrapper is 2.5x
SLOWER than plain bf16 because the int32 product and the quantized
operands round-trip HBM.  Hence these kernels: quantization and
dequantization happen in VMEM registers around the MXU dot, and only
bf16 activations ever touch HBM.

Two structural rules learned from the first cut (traced 2026-08-19):

1. **Stay 3D.**  The encoder's tokens are [B=frames, N=1370, C]; 1370
   is not a multiple of the 8-row tile, so a [B,N,C] <-> [B*N,C]
   flatten between two custom-calls is a *materialized relayout* (XLA
   can only fold it into an adjacent fusion, and between Pallas calls
   there is none): ~1.5 ms/layer of pure copies.  Every kernel here
   blocks the token axis per frame (grid = (B, N-blocks)) and never
   flattens.
2. **Absorb the XLA glue.**  With qkv/proj as custom-calls, LayerNorm
   and LayerScale+residual can no longer fuse into matmuls, so they
   become standalone VPU passes over [B,N,C] in HBM.  The qkv kernel
   takes the LN inside; the proj kernel takes LayerScale + residual
   inside; the MLP kernel (like its bf16 sibling) takes LN + LayerScale
   + residual inside.

Scheme (standard dynamic W8A8, symmetric, no zero points):
  - weights per-output-channel: wq[:, j] = round(w[:, j] / sw_j),
    sw_j = amax|w[:, j]| / 127 (`quantize_weight_cols`, XLA, runs once
    per dispatch on the fp32 params — ~25 us per weight, <1% of a
    window; production deployments can pre-quantize the tree and skip
    it entirely).
  - activations per row (per token), recomputed dynamically in-kernel:
    sx_i = amax|x_i| / 127.  The fused MLP kernel quantizes the hidden
    activations per (row, f-chunk), which is strictly finer than
    per-row.
  - dots accumulate int32 on the MXU; dequant is
    acc * (sx_i * sw_j) fused into the epilogue in VMEM.

Inference-only by design: the kernels define no VJP (jax.grad raises),
and the model-level `quantize="int8"` flag is a serving option — the
trainers never set it.  Numerics: relative error per matmul is the
quantization noise (~0.2-0.5% rms for LN'd activations), bounded
end-to-end by tests/test_int8.py against the bf16 path.

Reference equivalence: none — the reference (CUDA/torch fp16) has no
quantized path; this is a capability beyond it, guarded behind an
explicit flag.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.mlp import _gelu_f32

# In-model slope-timed sweep at the vitl window shape (bench.py --int8,
# 2026-08-19), rows/f_chunks -> fps: 704/2 -> 111.1 (kept); 704/1 ->
# 110.3; 704/4 -> 109.7; 352/4 -> 108.9; 352/8 -> 108.1; 1376/4 ->
# 107.9; 232/4 (the first 8-aligned cut) -> 105.7.  int8 MXU tiles are
# (32,128), so blocks are rounded to 32 rows — 1370 tokens/frame split
# as 2x704 pads 2.8%, vs 10%+ sublane waste for 8-aligned 232-row
# blocks.
_BLOCK_ROWS = int(_os.environ.get("VDN_INT8_BLOCK_ROWS", "704"))
_F_CHUNKS = int(_os.environ.get("VDN_INT8_F_CHUNKS", "2"))


def quantize_weight_cols(w):
    """fp32/bf16 [C, F] -> (int8 [C, F], fp32 scales [1, F]).

    Symmetric per-output-channel: wq = round(w / s), s_j = amax|w[:, j]|
    / 127.  Runs as plain XLA (outside the kernels) so it executes once
    per dispatch, not once per row block.
    """
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0   # [1, F]
    s = jnp.maximum(s, 1e-30)
    wq = jnp.round(wf / s).astype(jnp.int8)
    return wq, s


def _quantize_rows_f32(xf):
    """fp32 [bn, d] -> (int8 [bn, d], fp32 row scales [bn, 1]); in-kernel."""
    s = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0    # [bn, 1]
    s = jnp.maximum(s, 1e-30)
    q = jnp.round(xf * (1.0 / s)).astype(jnp.int8)
    return q, s


def _int8_dot(q, w):
    return jax.lax.dot_general(
        q, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _ln_f32(xf, ls, lb, eps):
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * ls.astype(jnp.float32) + lb.astype(jnp.float32)


def _block_rows(n: int) -> int:
    """Token-axis block: ~_BLOCK_ROWS rows, rounded up to the 32-row
    int8 MXU tile so partial-block padding stays small for
    non-tile-aligned N (e.g. 1370 -> 2 blocks of 704, 2.8% pad)."""
    if n <= _BLOCK_ROWS:
        return n
    nb = -(-n // _BLOCK_ROWS)
    return min(n, (-(-n // nb) + 31) // 32 * 32)


def _row3(a):
    return a.reshape(1, 1, -1)


def _wspec(c, f):
    return pl.BlockSpec((c, f), lambda i, j: (0, 0))


def _vspec(f):
    return pl.BlockSpec((1, 1, f), lambda i, j: (0, 0, 0))


def _xspec(bn, c):
    return pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0))


_PARAMS = lambda: pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"),
    vmem_limit_bytes=100 * 1024 * 1024)


def _dequant_chunks(q, sx, wq_ref, sw_ref, b_ref, o_ref, dt,
                    f_chunks: int):
    """o_ref[0] = dequant(q @ wq) + b, chunked over the output dim so
    chunk j's dequant (VPU) overlaps chunk j+1's dot (MXU)."""
    f = wq_ref.shape[1]
    fc = f // f_chunks
    for j in range(f_chunks):
        sl = slice(j * fc, (j + 1) * fc)
        acc = _int8_dot(q, wq_ref[:, sl])            # [bn, fc] int32
        o = acc.astype(jnp.float32) * sx * sw_ref[0, :, sl]
        o = o + b_ref[0, :, sl].astype(jnp.float32)
        o_ref[0, :, sl] = o.astype(dt)


def _ln_linear_kernel(x_ref, ls_ref, lb_ref, wq_ref, sw_ref, b_ref,
                      o_ref, *, eps: float, f_chunks: int):
    """LN -> per-row quant -> int8 dot -> dequant + bias (the qkv op)."""
    x = x_ref[0]                                     # [bn, C]
    y = _ln_f32(x.astype(jnp.float32), ls_ref[0], lb_ref[0], eps)
    q, sx = _quantize_rows_f32(y)
    _dequant_chunks(q, sx, wq_ref, sw_ref, b_ref, o_ref, x.dtype,
                    f_chunks)


def _linear_kernel(x_ref, wq_ref, sw_ref, b_ref, o_ref, *, f_chunks: int):
    """per-row quant -> int8 dot -> dequant + bias (generic linear)."""
    x = x_ref[0]
    q, sx = _quantize_rows_f32(x.astype(jnp.float32))
    _dequant_chunks(q, sx, wq_ref, sw_ref, b_ref, o_ref, x.dtype,
                    f_chunks)


def _proj_residual_kernel(x_ref, res_ref, wq_ref, sw_ref, b_ref, g_ref,
                          o_ref, *, f_chunks: int):
    """quant -> int8 dot -> dequant + bias -> res + gamma * out (the
    attention out-projection with LayerScale + residual absorbed)."""
    x = x_ref[0]
    q, sx = _quantize_rows_f32(x.astype(jnp.float32))
    f = wq_ref.shape[1]
    fc = f // f_chunks
    for j in range(f_chunks):
        sl = slice(j * fc, (j + 1) * fc)
        acc = _int8_dot(q, wq_ref[:, sl])
        o = acc.astype(jnp.float32) * sx * sw_ref[0, :, sl]
        o = o + b_ref[0, :, sl].astype(jnp.float32)
        o = o * g_ref[0, :, sl].astype(jnp.float32)
        o_ref[0, :, sl] = res_ref[0][:, sl] + o.astype(x.dtype)


def _ln_mlp_int8_kernel(x_ref, ls_ref, lb_ref, w1q_ref, s1_ref, b1_ref,
                        w2q_ref, s2_ref, b2_ref, g_ref, o_ref,
                        *, eps: float, f_chunks: int):
    """LN -> W8A8 fc1 -> GELU -> W8A8 fc2 -> LayerScale -> residual."""
    x = x_ref[0]                                     # [bn, C]
    y = _ln_f32(x.astype(jnp.float32), ls_ref[0], lb_ref[0], eps)
    q, sy = _quantize_rows_f32(y)                    # int8 [bn, C]

    f = w1q_ref.shape[1]
    fc = f // f_chunks
    o = None
    for j in range(f_chunks):
        sl = slice(j * fc, (j + 1) * fc)
        acc = _int8_dot(q, w1q_ref[:, sl])           # [bn, fc] int32
        h = acc.astype(jnp.float32) * sy * s1_ref[0, :, sl] \
            + b1_ref[0, :, sl].astype(jnp.float32)
        h = _gelu_f32(h, x.dtype)
        hq, sh = _quantize_rows_f32(h)               # per (row, chunk)
        acc2 = _int8_dot(hq, w2q_ref[sl, :])         # [bn, C] int32
        pj = acc2.astype(jnp.float32) * sh * s2_ref[0]
        o = pj if o is None else o + pj
    o = o + b2_ref[0].astype(jnp.float32)
    o_ref[0] = x + (o * g_ref[0].astype(jnp.float32)).astype(x.dtype)


def _call_3d(kernel, name, x3d, operands, out_f, f_chunks):
    """Shared pallas_call builder: x [B, N, C] blocked (1, bn, C) over a
    (B, N-blocks) grid.  `operands` is a list of (array, kind) with kind
    "vec" (a [len] vector riding as a [1,1,len] row), "mat" (a fully
    resident weight [r, c]) or "x" (another [B, N, F] tensor blocked
    like x).  Returns [B, N, out_f]."""
    b, n, c = x3d.shape
    bn = _block_rows(n)
    grid = (b, pl.cdiv(n, bn))
    in_specs = [_xspec(bn, c)]
    args = [x3d]
    for a, kind in operands:
        if kind == "x":
            in_specs.append(_xspec(bn, a.shape[-1]))
            args.append(a)
        elif kind == "mat":
            in_specs.append(_wspec(*a.shape))
            args.append(a)
        else:
            in_specs.append(_vspec(a.size))
            args.append(_row3(a))
    return pl.pallas_call(
        functools.partial(kernel, f_chunks=f_chunks),
        grid=grid,
        in_specs=in_specs,
        out_specs=_xspec(bn, out_f),
        out_shape=jax.ShapeDtypeStruct((b, n, out_f), x3d.dtype),
        compiler_params=_PARAMS(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * c * out_f,
            bytes_accessed=b * n * (c + out_f) * x3d.dtype.itemsize
            + sum(m.size for m, kind in operands if kind == "mat"),
            transcendentals=0),
        name=name,
    )(*args)


def _f_chunks_for(f: int) -> int:
    return _F_CHUNKS if f % _F_CHUNKS == 0 and f >= 2048 else 1


def int8_ln_linear(x, ln_scale, ln_bias, w, b, eps: float = 1e-6):
    """LayerNorm(x) @ w + b with the LN fused into the int8 kernel.

    x [B, N, C], w [C, F] -> [B, N, F].  The encoder's qkv projection:
    fusing LN here keeps it off the standalone-VPU-pass path a Pallas
    neighborhood would otherwise force (see module docstring, rule 2).
    """
    wq, sw = quantize_weight_cols(w)
    kernel = functools.partial(_ln_linear_kernel, eps=eps)
    return _call_3d(kernel, "ln_linear_int8", x,
                    [(ln_scale, "vec"), (ln_bias, "vec"), (wq, "mat"),
                     (sw, "vec"), (b, "vec")],
                    w.shape[1], _f_chunks_for(w.shape[1]))


def int8_linear(x, w, b=None):
    """x [..., C] @ w [C, F] (+ b) with W8A8-dynamic int8 MXU dots.

    Quantizes `w` per output channel in XLA (once per dispatch) and the
    activations per row inside the kernel; returns x.dtype.  2D inputs
    are handled as a single-frame batch.
    """
    shape = x.shape
    x3 = x.reshape((1,) + shape if len(shape) == 2 else
                   (-1,) + shape[-2:])
    wq, sw = quantize_weight_cols(w)
    if b is None:
        b = jnp.zeros((w.shape[1],), jnp.float32)
    out = _call_3d(_linear_kernel, "linear_int8", x3,
                   [(wq, "mat"), (sw, "vec"), (b, "vec")],
                   w.shape[1], _f_chunks_for(w.shape[1]))
    return out.reshape(shape[:-1] + (w.shape[1],))


def int8_proj_residual(x, residual, w, b, gamma):
    """residual + gamma * (x @ w + b): the attention out-projection with
    LayerScale and the block residual absorbed into the kernel epilogue.

    x, residual [B, N, C]; w [C, C]."""
    wq, sw = quantize_weight_cols(w)
    return _call_3d(_proj_residual_kernel, "proj_residual_int8", x,
                    [(residual, "x"), (wq, "mat"), (sw, "vec"),
                     (b, "vec"), (gamma, "vec")],
                    w.shape[1], _f_chunks_for(w.shape[1]))


def _ln_swiglu_int8_kernel(x_ref, ls_ref, lb_ref, w12q_ref, s12_ref,
                           b12_ref, w3q_ref, s3_ref, b3_ref, g_ref,
                           o_ref, *, eps: float, f_chunks: int):
    """LN -> W8A8 w12 -> silu(x1)*x2 -> W8A8 w3 -> LayerScale ->
    residual (the vitg SwiGLU FFN; reference dinov2_layers/
    swiglu_ffn.py).  w12's columns are [gate | value] halves; each
    f-chunk runs one gate dot + one value dot so the chunks pair up."""
    x = x_ref[0]                                     # [bn, C]
    y = _ln_f32(x.astype(jnp.float32), ls_ref[0], lb_ref[0], eps)
    q, sy = _quantize_rows_f32(y)

    f = w12q_ref.shape[1] // 2
    fc = f // f_chunks
    o = None
    for j in range(f_chunks):
        sl1 = slice(j * fc, (j + 1) * fc)
        sl2 = slice(f + j * fc, f + (j + 1) * fc)
        a1 = _int8_dot(q, w12q_ref[:, sl1])
        x1 = a1.astype(jnp.float32) * sy * s12_ref[0, :, sl1] \
            + b12_ref[0, :, sl1].astype(jnp.float32)
        a2 = _int8_dot(q, w12q_ref[:, sl2])
        x2 = a2.astype(jnp.float32) * sy * s12_ref[0, :, sl2] \
            + b12_ref[0, :, sl2].astype(jnp.float32)
        # silu(x1) = x1 * sigmoid(x1); sigmoid via one exp2
        sig = 1.0 / (1.0 + jnp.exp2(x1 * (-1.4426950408889634)))
        h = x1 * sig * x2
        hq, sh = _quantize_rows_f32(h)
        acc = _int8_dot(hq, w3q_ref[sl1, :])         # [bn, C] int32
        pj = acc.astype(jnp.float32) * sh * s3_ref[0]
        o = pj if o is None else o + pj
    o = o + b3_ref[0].astype(jnp.float32)
    o_ref[0] = x + (o * g_ref[0].astype(jnp.float32)).astype(x.dtype)


def fused_ln_swiglu_residual_int8(x, ln_scale, ln_bias, w12, b12, w3, b3,
                                  gamma, eps: float = 1e-6):
    """Serving-path int8 SwiGLU FFN block tail (vitg).  x [B, N, C]."""
    shape = x.shape
    x3 = x.reshape((1,) + shape if len(shape) == 2 else x.shape)
    f = w12.shape[1] // 2
    w12q, s12 = quantize_weight_cols(w12)
    w3q, s3 = quantize_weight_cols(w3)
    kernel = functools.partial(_ln_swiglu_int8_kernel, eps=eps)
    out = _call_3d(kernel, "ln_swiglu_int8", x3,
                   [(ln_scale, "vec"), (ln_bias, "vec"), (w12q, "mat"),
                    (s12, "vec"), (b12, "vec"), (w3q, "mat"), (s3, "vec"),
                    (b3, "vec"), (gamma, "vec")],
                   x3.shape[-1],
                   _F_CHUNKS if f % _F_CHUNKS == 0 else 1)
    return out.reshape(shape)


def fused_ln_mlp_residual_int8(x, ln_scale, ln_bias, w1, b1, w2, b2,
                               gamma, eps: float = 1e-6):
    """Serving-path int8 variant of fused_ln_mlp_residual: LN (fp32) ->
    W8A8 fc1 -> GELU (fp32) -> W8A8 fc2 -> LayerScale -> residual.

    x [B, N, C] (3D-native: no flatten — see module docstring, rule 1).
    """
    shape = x.shape
    x3 = x.reshape((1,) + shape if len(shape) == 2 else x.shape)
    f = w1.shape[1]
    w1q, s1 = quantize_weight_cols(w1)
    w2q, s2 = quantize_weight_cols(w2)
    kernel = functools.partial(_ln_mlp_int8_kernel, eps=eps)
    out = _call_3d(kernel, "ln_mlp_int8", x3,
                   [(ln_scale, "vec"), (ln_bias, "vec"), (w1q, "mat"),
                    (s1, "vec"), (b1, "vec"), (w2q, "mat"), (s2, "vec"),
                    (b2, "vec"), (gamma, "vec")],
                   x3.shape[-1],
                   _F_CHUNKS if f % _F_CHUNKS == 0 else 1)
    return out.reshape(shape)


def int8_serving_enabled(rows: int) -> bool:
    """Model-level gate: TPU + encoder-scale token counts only (the
    CPU mesh and tiny shapes keep the float paths; kernel correctness
    on CPU is covered by interpret-mode tests)."""
    if _os.environ.get("VDN_DISABLE_INT8"):
        return False
    if _os.environ.get("VDN_FORCE_INT8"):  # tests: CPU interpret mode
        return True
    from vdn.ops.attention import _on_tpu
    # 1024: a single 518px image (1370 tokens) qualifies, so the image
    # pipelines' serving mode quantizes too; tiny shapes keep float
    return rows >= 1024 and _on_tpu()
