"""Pallas flash attention (TPU) — the ViT encoder hot path.

Replaces the reference's xformers memory-efficient attention
(reference depth_anything_v2/dinov2_layers/attention.py:64-81).  The XLA
einsum path materializes fp32 logits [B, H, T, T] in HBM — ~3.8 GB for a
32-frame vitl window — and round-1 profiling showed that tensor's traffic
alone was >50% of device time (669 GB/s sustained, 0.1 TF/s).  This kernel
keeps logits in VMEM.

Design (v2 — the round-1 kernel used a (bh, nq, nk) grid of 256-wide
blocks with online-softmax scratch carries; at ViT shapes the 18k tiny
grid steps' overhead made it *slower* than XLA, 29 ms vs 16 ms):

- **Full-K blocking**: each grid step loads one q block plus the ENTIRE
  K/V for that batch*head row and computes complete softmax rows in one
  shot (exact fp32 softmax, no running-max corrections, no scratch).
  At ViT scale (T=1370, D=64) a whole head's K/V is ~350 KB — tiny next
  to the 128 MB VMEM — so flash-style streaming over K is pure overhead.
- **No HBM padding**: Pallas tolerates block shapes that do not divide
  the array; out-of-bounds q rows are dropped on store, and K stays
  un-padded so no masking of key columns is needed at all.  D=64 rides
  in the 128-lane minor dim at half occupancy, which costs the same MXU
  cycles as padding (contraction 64 <= 128) but half the HBM traffic.
- grid = (B*H, ceil(T/block_q)); K/V blocks are revisited across the q
  axis, so they are DMA'd once per batch*head row.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# target q rows per grid step; actual block is fitted to T (see _pick_block).
# In-model slope-timed sweeps at the vitl window shape (B*H=512, T=1370,
# D=64) pick this; VDN_FLASH_BLOCK_Q overrides for tuning sweeps
# (isolated microbenches disagree with in-model ordering here).
import os as _os
DEFAULT_BLOCK_Q = int(_os.environ.get("VDN_FLASH_BLOCK_Q", "704"))
# bf16-exp experiment (default OFF): the per-layer trace suggested the
# forward was softmax-VPU-bound, so computing exp over bf16-rounded
# shifted logits (two lanes per VPU op; probabilities feed a bf16 AV
# matmul anyway; row sum still f32) looked like a win — but the honest
# in-model A/B (2026-08-17, vitl 518 flagship, slope method) measured
# 77.32 fps ON vs 77.74 fps OFF: the cast traffic cancels the packed
# exp.  Kept behind the env knob for re-testing on other chips; GATED on
# the value dtype so fp32-precision callers always get exact f32
# softmax (tests/test_flash_attention.py::test_bf16_exp_drift_bounded
# bounds the ON-path drift).
_BF16_EXP = _os.environ.get("VDN_FLASH_BF16_EXP", "0") != "0"
# Issue all head-slice QK dots before the softmaxes in the cols kernel
# (see _flash_cols_kernel) — A/B knob for MXU/VPU overlap.
_PIPELINE_HEADS = _os.environ.get("VDN_FLASH_PIPELINE", "0") != "0"


_LOG2E = 1.4426950408889634


def _softmax_rows(s, axis, v_dtype):
    """Shifted exp2 of base-2 logits (s = log2(e)*scale*qk, the fold
    happening on the tiny [bq, d] q block before the dot — no [bq, tk]
    scale pass), rounded to ``v_dtype`` (the AV-matmul input dtype).
    exp2(s2 - max(s2)) == exp(s - max(s)) exactly (log2e > 0 commutes
    with max), so this is the same unnormalized softmax.  The row sum is
    NOT computed here — it rides the AV dot as a ones column (the
    [bq, tk] cross-lane VPU sum was the most expensive softmax pass,
    while the AV dot's d=64 output pads to 128 lanes anyway, so column d
    carries sum(p) for free; exact for f32 inputs).  With
    VDN_FLASH_BF16_EXP the exp2 itself evaluates on bf16-rounded shifted
    logits (two lanes per VPU op) instead of rounding after."""
    m = jnp.max(s, axis=axis, keepdims=True)
    t = s - m
    if _BF16_EXP and v_dtype == jnp.bfloat16:
        return jnp.exp2(t.astype(jnp.bfloat16))
    return jnp.exp2(t).astype(v_dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [tk, d]
    d = q.shape[1]
    tk = k.shape[0]
    s = jax.lax.dot_general(
        q * jnp.asarray(scale * _LOG2E, q.dtype), k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [bq, tk] f32
    p = _softmax_rows(s, axis=1, v_dtype=v_ref.dtype)
    # row sum via a ones column of the AV dot (see _softmax_rows)
    vx = jnp.concatenate(
        [v_ref[0], jnp.ones((tk, 1), v_ref.dtype)], axis=1)
    pv = jax.lax.dot_general(
        p, vx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [bq, d+1]
    o_ref[0] = (pv[:, :d] / pv[:, d:d + 1]).astype(o_ref.dtype)


def _flash_colbias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *,
                          scale: float):
    """_flash_kernel + an additive per-COLUMN logits bias [1, tk]
    (natural-log units, -inf allowed): the memory-bank mask shape —
    vdn/nn/memory.py builds [1,1,1,cap*hw] slot-validity biases.  The
    bias folds into the base-2 logits as bias * log2(e)."""
    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [tk, d]
    d = q.shape[1]
    tk = k.shape[0]
    s = jax.lax.dot_general(
        q * jnp.asarray(scale * _LOG2E, q.dtype), k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [bq, tk] f32
    s = s + b_ref[:].astype(jnp.float32) * _LOG2E        # [1, tk] bcast
    p = _softmax_rows(s, axis=1, v_dtype=v_ref.dtype)
    vx = jnp.concatenate(
        [v_ref[0], jnp.ones((tk, 1), v_ref.dtype)], axis=1)
    pv = jax.lax.dot_general(
        p, vx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [bq, d+1]
    o_ref[0] = (pv[:, :d] / pv[:, d:d + 1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_bhtd_colbias(q, k, v, bias, scale: float, block_q: int):
    """q [BH, Tq, D], k/v [BH, Tk, D], bias [1, Tk] -> [BH, Tq, D]."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    # memory-bank kv rows run long (cap * 1369 ~ 8214): cap the q block
    # so the fp32 [bq, tk] logits stay within a sane VMEM slice
    max_bq = max(128, (24 * 1024 * 1024 // (4 * tk)) // 128 * 128)
    bq = _pick_block(tq, min(block_q, max_bq))
    grid = (bh, pl.cdiv(tq, bq))
    return pl.pallas_call(
        functools.partial(_flash_colbias_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * tq * tk),
    )(q, k, v, bias)


def flash_attention_colbias(q: jnp.ndarray, k: jnp.ndarray,
                            v: jnp.ndarray, col_bias: jnp.ndarray,
                            scale: Optional[float] = None,
                            block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """Flash attention over [B, Tq|Tk, H, D] with an additive per-column
    logits bias [Tk] (shared across batch/heads/queries — the
    memory-bank slot mask).  Primarily a serving kernel (the image/SAM2
    memory paths are inference surfaces), but it carries a
    recompute-via-XLA ``custom_vjp`` so a future attempt to
    differentiate through the memory path falls back to the exact XLA
    backward instead of dying inside pallas_call."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _colbias_diff(q, k, v, col_bias.reshape(-1), float(scale),
                         block_q)


def _colbias_xla(q, k, v, col_bias, scale):
    """XLA reference for the colbias flavor ([B, T, H, D] layout)."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + col_bias.astype(jnp.float32)[None, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _colbias_diff(q, k, v, col_bias, scale, block_q):
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def to_bhtd(x, t):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    out = _flash_bhtd_colbias(to_bhtd(q, tq), to_bhtd(k, tk),
                              to_bhtd(v, tk),
                              col_bias.reshape(1, tk).astype(jnp.float32),
                              float(scale), block_q)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)


def _colbias_fwd(q, k, v, col_bias, scale, block_q):
    return _colbias_diff(q, k, v, col_bias, scale, block_q), \
        (q, k, v, col_bias)


def _colbias_bwd(scale, block_q, res, g):
    q, k, v, col_bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_, b_: _colbias_xla(
        q_, k_, v_, b_, scale), q, k, v, col_bias)
    return vjp(g)


_colbias_diff.defvjp(_colbias_fwd, _colbias_bwd)


def _pick_block(tq: int, target: int) -> int:
    """Largest multiple-of-128 block <= target covering tq evenly-ish."""
    if tq <= target:
        return tq
    n = pl.cdiv(tq, target)
    return min(tq, pl.cdiv(tq, n * 128) * 128)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_bhtd(q, k, v, scale: float, block_q: int):
    """q [BH, Tq, D], k/v [BH, Tk, D] -> [BH, Tq, D]."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    # VMEM-aware q-block cap: the kernel holds k/v blocks plus ~2 fp32
    # [bq, tk] passes (shifted logits + exp) — long-K / wide-d / fp32
    # shapes (SAM2 memory self-attn: tk=4096, d=256) blew the default
    # scoped-vmem budget at the flat 704 default (compile-time OOM,
    # 2026-08-20)
    item = q.dtype.itemsize
    fixed = 2 * tk * d * item                    # k + v resident
    per_row = 8 * tk + 8 * d                     # s/p fp32 + q/o rows
    max_bq = max(128, (40 * 1024 * 1024 - fixed) // per_row // 128 * 128)
    bq = _pick_block(tq, min(block_q, max_bq))

    grid = (bh, pl.cdiv(tq, bq))
    flops = 4 * bh * tq * tk * d
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=bh * tq * tk),
    )(q, k, v)


def _xla_reference(q, k, v, scale):
    """Plain-XLA attention (the vdn.ops.attention math) used as the
    recompute target for the backward pass."""
    dtype = q.dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """Attention over [B, T, H, D] (same contract as the XLA path in
    vdn.ops.attention).

    Differentiable: the registered VJP is the Pallas full-K backward
    kernel (``_flash_bwd_bhtd``) — dk/dv accumulate across the sequential
    q-block grid axis in VMEM-resident fp32 blocks, so the fp32 [B,H,T,T]
    logits never touch HBM in either direction (gradient-parity vs the
    XLA attention in tests/test_flash_attention.py)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def to_bhtd(x, t):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    out = _flash_bhtd(to_bhtd(q, tq), to_bhtd(k, tk), to_bhtd(v, tk),
                      float(scale), block_q)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, g_ref, out_ref,
                      dq_ref, dk_ref, dv_ref,
                      *, scale: float, tq: int, bq: int):
    """Full-K flash backward.  One grid step handles one q block against
    the whole K/V row; dk/dv accumulate across the (sequential) q-block
    grid axis into fp32 output blocks that stay resident in VMEM.

    Math (out = P v, P = softmax(q k^T * scale)):
      dv = P^T g
      dP = g v^T;  ds = P * (dP - delta),  delta = rowsum(dP * P)
      dq = ds k * scale;  dk = ds^T q * scale

    VPU economy (the [bq, tk] passes dominate; MXU does the rest):
      * delta == rowsum(g * out) (FlashAttention-2 identity) — computed
        from the saved forward output on the tiny [bq, d] block, deleting
        the [bq, tk] dP*P multiply + cross-lane rowsum;
      * 1/l is folded into per-row rescales of the [bq, d] operands
        (g/l for dv, q/l for dk, the dq row-rescale) instead of
        dividing the [bq, tk] matrix.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]                                          # [bq, d]
    k = k_ref[0]                                          # [tk, d]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)                      # [bq, d]

    # base-2 softmax recompute: scale*log2e folds into the tiny [bq, d]
    # q block; exp2(s2 - max(s2)) == exp(s - max(s)) exactly (log2e > 0)
    s = jax.lax.dot_general(
        q * jnp.asarray(scale * _LOG2E, q.dtype), k,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bq, tk]
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)                                   # unnormalized
    # rows past tq are block padding (undefined values): zero every
    # operand that feeds a cross-row reduction — a padded NaN times a
    # zeroed ds row is still NaN
    rows = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], 1), 0)
    valid = rows + i * bq < tq
    p = jnp.where(valid, p, 0.0)
    g = jnp.where(valid, g, 0.0)
    q = jnp.where(valid, q, jnp.zeros_like(q))
    # padded rows' g*out may be inf/NaN garbage: select, don't multiply
    delta = jnp.where(valid, jnp.sum(
        g * out_ref[0].astype(jnp.float32), axis=1, keepdims=True), 0.0)
    l = jnp.sum(p, axis=1, keepdims=True)                 # [bq, 1]
    inv_l = 1.0 / jnp.maximum(l, 1e-30)

    dv_ref[0] += jax.lax.dot_general(
        p, g * inv_l, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [tk, d]
    dp = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [bq, tk]
    t = p * (dp - delta)                                  # [bq, tk] f32
    tc = t.astype(q.dtype)
    dq_ref[0] = (jax.lax.dot_general(
        tc, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
        * (inv_l * scale)).astype(dq_ref.dtype)
    dk_ref[0] += jax.lax.dot_general(
        tc, (q * inv_l).astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale       # [tk, d]


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def _flash_bwd_bhtd(q, k, v, g, out, scale: float, block_q: int):
    """Gradients of `_flash_bhtd` w.r.t. (q, k, v); g/out [BH, Tq, D]."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    bq = _pick_block(tq, block_q)
    grid = (bh, pl.cdiv(tq, bq))
    flops = 10 * bh * tq * tk * d
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, tq=tq, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, tk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (q.size + k.size + v.size)
            * q.dtype.itemsize,
            transcendentals=bh * tq * tk),
    )(q, k, v, g, out)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_grads(q, k, v, g, out, scale: float, block_q: int):
    """(dq, dk, dv) for the [B, T, H, D] contract via the backward kernel."""
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def to_bhtd(x, t):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    def from_bhtd(x, t):
        return x.reshape(b, h, t, d).transpose(0, 2, 1, 3)

    dq, dk, dv = _flash_bwd_bhtd(
        to_bhtd(q, tq), to_bhtd(k, tk), to_bhtd(v, tk), to_bhtd(g, tq),
        to_bhtd(out, tq), float(scale), block_q)
    return from_bhtd(dq, tq), from_bhtd(dk, tk), from_bhtd(dv, tk)


def _flash_fwd(q, k, v, scale, block_q):
    out = flash_attention(q, k, v, scale, block_q)
    # checkpoint_name so a remat policy (save_only_these_names, see
    # vdn/nn/vit.py REMAT_POLICY) can keep the forward output across the
    # backward: the VJP needs `out` (FlashAttention-2 delta) and with it
    # saved the whole forward kernel is dead code in the remat recompute.
    out = _checkpoint_name(out, "flash_out")
    return out, (q, k, v, out)


def _flash_bwd(scale, block_q, res, g):
    q, k, v, out = res
    s = q.shape[-1] ** -0.5 if scale is None else scale
    return _flash_grads(q, k, v, g, out, s, block_q)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _flash_cols_kernel(q_ref, k_ref, v_ref, o_ref, *lse_ref, scale: float,
                       heads_per_block: int, d: int):
    # blocks are 128-wide column slices of the [B, T, 3C] fused qkv tensor
    # (= heads_per_block heads of width d side by side): q [1, bq, hb*d],
    # k/v [1, tk, hb*d], o [1, bq, hb*d].  With the optional lse_ref
    # (training forward), each head's row log-sum-exp (base 2: m +
    # log2(l)) is written as a [bq, hb] column block so the backward can
    # recompute the *normalized* softmax without the [bq, tk] cross-lane
    # max/sum reductions (FlashAttention-2 statistics reuse).
    q2 = q_ref[0]                                        # [bq, hb*d]
    k2 = k_ref[0]                                        # [tk, hb*d]
    v2 = v_ref[0]
    sls = [slice(hh * d, (hh + 1) * d)
           for hh in range(heads_per_block)]
    # scale (x log2e for the base-2 softmax, see _softmax_rows) folds
    # into the tiny [bq, d] q slice — no [bq, tk] scale pass
    c2 = jnp.asarray(scale * _LOG2E, q2.dtype)
    if _PIPELINE_HEADS:
        # issue every head's QK dot before any softmax consumes one: the
        # MXU runs head j+1's dot while the VPU does head j's exp (the
        # dots are independent; in-order issue with async MXU execution
        # gives the overlap only if nothing VPU-bound sits between them)
        ss = [jax.lax.dot_general(
            q2[:, sl] * c2, k2[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) for sl in sls]
    else:
        ss = None
    tk = v2.shape[0]
    outs, lses = [], []
    for hh, sl in enumerate(sls):
        s = ss[hh] if ss is not None else jax.lax.dot_general(
            q2[:, sl] * c2, k2[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, tk] f32
        m = jnp.max(s, axis=1, keepdims=True)
        t = s - m
        if _BF16_EXP and v2.dtype == jnp.bfloat16:
            p = jnp.exp2(t.astype(jnp.bfloat16))
        else:
            p = jnp.exp2(t).astype(v2.dtype)
        # row sum rides the AV matmul as a ones column (see _softmax_rows)
        vx = jnp.concatenate(
            [v2[:, sl], jnp.ones((tk, 1), v2.dtype)], axis=1)
        pv = jax.lax.dot_general(
            p, vx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, d+1]
        l = pv[:, d:d + 1]
        outs.append(pv[:, :d] / l)
        if lse_ref:
            lses.append(m + jnp.log2(l))                 # [bq, 1] f32
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)
    if lse_ref:
        lse_ref[0][0, 0] = jnp.concatenate(lses, axis=1).T  # [hb, bq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_fused_qkv(qkv: jnp.ndarray, scale: Optional[float] = None,
                              block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """Self-attention straight off the fused projection, zero staging.
    Differentiable via custom_vjp — the backward splits q/k/v views and
    runs the same Pallas full-K backward kernel as ``flash_attention``.

    qkv [B, T, 3, H, D] -> out [B, T, H, D].  The tensor is viewed as
    [B, T, 3C] and the q/k/v operands are 128-wide *column block views*
    (two 64-wide heads per grid step), so neither the three [B,T,H,D]
    slices nor the [B,H,T,D] relayouts of the `flash_attention` path are
    ever materialized in HBM (~4 bandwidth-bound copies of ~90 MB per
    vitl-window layer), and the output lands directly in [B,T,C] where
    the following out-projection consumes it.  Same full-K softmax math
    as `_flash_kernel`, one lane-slice dot per head."""
    b, t, three, h, d = qkv.shape
    assert three == 3
    if scale is None:
        scale = d ** -0.5
    # pack heads into 128-lane-multiple column blocks (TPU block shape
    # constraint).  More heads per grid step deepens the per-head software
    # pipeline (head j's VPU softmax overlaps head j+1's MXU dot);
    # VDN_FLASH_HEADS_PER_BLOCK overrides for sweeps.
    hb = pick_heads_per_block(h, d)
    if not hb:
        # odd head config: fall back to the staged-transpose kernel
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        return flash_attention(q, k, v, scale,
                               block_q).reshape(b, t, h, d)
    out = _flash_cols_call(qkv, float(scale), block_q, hb, save_lse=False)
    return out.reshape(b, t, h, d)


def _flash_cols_call(qkv, scale: float, block_q: int, hb: int,
                     save_lse: bool):
    """pallas_call builder for the column-block forward.  save_lse=True
    (training forward) adds a [B, n_colblocks, hb, T] fp32 log-sum-exp
    output and returns (out2 [B,T,C], lse); False returns out2 alone."""
    b, t, three, h, d = qkv.shape
    c = h * d
    qkv2 = qkv.reshape(b, t, 3 * c)
    n_colblocks = h // hb
    bq = _pick_block(t, block_q)
    grid = (b, n_colblocks, pl.cdiv(t, bq))
    w = hb * d
    flops = 4 * b * h * t * t * d
    out_specs = [pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g))]
    out_shape = [jax.ShapeDtypeStruct((b, t, c), qkv.dtype)]
    if save_lse:
        # lse is [B, n_colblocks, hb, T]: T must be the minor (lane) axis
        # — a [.., T, hb] layout pads hb=2 to 128 lanes (64x HBM blow-up,
        # 86 MB/layer, OOMed the b2t8 train step), and a [B, T, H] layout
        # would need lane-dim blocks slicing H in non-128 multiples,
        # which Mosaic rejects.  The [bq,1]<->[1,bq] transposes this
        # costs in the kernels are ~bq elements each.
        out_specs.append(
            pl.BlockSpec((1, 1, hb, bq), lambda b, g, i: (b, g, 0, i)))
        out_shape.append(
            jax.ShapeDtypeStruct((b, n_colblocks, hb, t), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_flash_cols_kernel, scale=scale,
                          heads_per_block=hb, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, t, w),
                         lambda b, g, i, _n=n_colblocks: (b, 0, _n + g)),
            pl.BlockSpec((1, t, w),
                         lambda b, g, i, _n=n_colblocks: (b, 0, 2 * _n + g)),
        ],
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shape if save_lse else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(qkv.size + qkv.size // 3) * qkv.dtype.itemsize,
            transcendentals=b * h * t * t),
    )(qkv2, qkv2, qkv2)
    return res


def _flash_bwd_cols_kernel(qkv_q, qkv_k, qkv_v, g_ref, out_ref, lse_ref,
                           dq_ref, dk_ref, dv_ref,
                           *, scale: float, heads_per_block: int, d: int,
                           tq: int, bq: int):
    """Column-block flash backward: operands are 128-wide column views of
    the fused [B, T, 3C] qkv tensor and the [B, T, C] cotangent/output —
    the same zero-staging layout as `_flash_cols_kernel`, so none of the
    [B,T,H,D] slices or [B*H,T,D] relayouts of `_flash_grads` are ever
    materialized (the staged path cost ~11 bandwidth-bound HBM copies per
    encoder layer in the train step).  FlashAttention-2 statistics reuse:
    the forward's per-row base-2 log-sum-exp (lse_ref) turns the softmax
    recompute into one exp2 — the *normalized* p = exp2(s - lse) comes out
    directly, deleting the [bq, tk] cross-lane max and sum reductions and
    all 1/l rescales of the previous revision.  delta = rowsum(g * out)
    from the saved forward output; dk/dv accumulate across the sequential
    q-block grid axis in VMEM-resident fp32 column blocks.  The dv/dp
    dots run with bf16 operands (p is <= 1 and fed the AV dot in bf16 on
    the forward anyway; accumulation stays fp32)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q2 = qkv_q[0]                                        # [bq, w]
    k2 = qkv_k[0]                                        # [tk, w]
    v2 = qkv_v[0]
    g2 = g_ref[0]
    o2 = out_ref[0]
    lse2 = lse_ref[0, 0]                                 # [hb, bq] f32
    # rows past tq are block padding (undefined): zero every operand that
    # feeds a cross-row reduction (a padded NaN times a zeroed row is
    # still NaN, so select, don't multiply)
    rows = jax.lax.broadcasted_iota(jnp.int32, (q2.shape[0], 1), 0)
    valid = rows + i * bq < tq
    c2 = jnp.asarray(scale * _LOG2E, q2.dtype)
    dqs, dks, dvs = [], [], []
    for hh in range(heads_per_block):
        sl = slice(hh * d, (hh + 1) * d)
        q = jnp.where(valid, q2[:, sl], jnp.zeros_like(q2[:, sl]))
        k = k2[:, sl]
        v = v2[:, sl]
        g = jnp.where(valid, g2[:, sl].astype(jnp.float32), 0.0)
        gc = g.astype(q2.dtype)
        s = jax.lax.dot_general(
            q * c2, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [bq, tk] f32
        # padded rows: q is zeroed (s = 0) and lse is selected to 0, so
        # p = exp2(0) = 1 — finite — and the zeroed g/delta null every
        # contribution.  Masking the [bq, 1] lse instead of the [bq, tk]
        # p deletes a full cross-block VPU select pass.
        lse = jnp.where(valid, lse2[hh:hh + 1, :].T, 0.0)  # [bq, 1]
        delta = jnp.where(valid, jnp.sum(
            g * o2[:, sl].astype(jnp.float32), axis=1, keepdims=True), 0.0)
        if _BF16_EXP and q2.dtype == jnp.bfloat16:
            # all [bq, tk] elementwise math in bf16 (half-width VPU
            # passes): the exponent rounding argument is the forward's
            # (_softmax_rows) — large-|s-lse| rows have tiny p where the
            # relative error lands; dS = p*(dp-delta) inherits bf16
            # noise ~0.4% relative, the same scale as the bf16 rounding
            # of tc/gc the exact path already applies before its dots.
            pc = jnp.exp2((s - lse).astype(jnp.bfloat16))
            dp = jax.lax.dot_general(
                gc, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [bq, tk]
            tc = pc * (dp - delta).astype(jnp.bfloat16)
        else:
            p = jnp.exp2(s - lse)                        # normalized
            pc = p.astype(q2.dtype)
            dp = jax.lax.dot_general(
                gc, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # [bq, tk]
            tc = (p * (dp - delta)).astype(q2.dtype)
        dvs.append(jax.lax.dot_general(
            pc, gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # [tk, d]
        dqs.append(jax.lax.dot_general(
            tc, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)
        dks.append(jax.lax.dot_general(
            tc, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale)  # [tk, d]
    dq_ref[0] = jnp.concatenate(dqs, axis=1).astype(dq_ref.dtype)
    dk_ref[0] += jnp.concatenate(dks, axis=1)
    dv_ref[0] += jnp.concatenate(dvs, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "hb", "h", "d"))
def _flash_bwd_cols(qkv2, g2, out2, lse2, scale: float, block_q: int,
                    hb: int, h: int, d: int):
    """qkv2 [B, T, 3C], g2/out2 [B, T, C], lse2 [B, n_colblocks, hb, T]
    fp32 (forward row log-sum-exp, base 2) -> (dq2, dk2, dv2) [B, T, C]
    (dk2/dv2 fp32 accumulators; caller casts and concatenates).

    VDN_FLASH_BWD_BLOCK_Q overrides the q-block for the BACKWARD only —
    the fwd/bwd optima do NOT coincide: the backward's sequential dk/dv
    accumulation revisits cost ~12 ms/step at vitl b2t8, so a full-T
    q-block wins whenever the fp32 [t, t] logits pair fits VMEM
    (in-model slope A/B 2026-08-21: full-T 632.5 ms vs 644.8 at the
    fwd-tuned 768 vs 645.4 at 512)."""
    b, t, _ = qkv2.shape
    n = h // hb
    w = hb * d
    bq_env = int(_os.environ.get("VDN_FLASH_BWD_BLOCK_Q", "0"))
    if bq_env:
        bq = _pick_block(t, bq_env)
    elif 8 * t * t <= 48 * 1024 * 1024:
        bq = t                                   # full T: one q visit
    else:
        bq = _pick_block(t, block_q)
    grid = (b, n, pl.cdiv(t, bq))
    flops = 10 * b * h * t * t * d
    return pl.pallas_call(
        functools.partial(_flash_bwd_cols_kernel, scale=scale,
                          heads_per_block=hb, d=d, tq=t, bq=bq),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, t, w),
                         lambda b, g, i, _n=n: (b, 0, _n + g)),
            pl.BlockSpec((1, t, w),
                         lambda b, g, i, _n=n: (b, 0, 2 * _n + g)),
            pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, 1, hb, bq), lambda b, g, i: (b, g, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, t, w), lambda b, g, i: (b, 0, g)),
            pl.BlockSpec((1, t, w), lambda b, g, i: (b, 0, g)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t, h * d), qkv2.dtype),
            jax.ShapeDtypeStruct((b, t, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, t, h * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(2 * qkv2.size + 4 * g2.size)
            * qkv2.dtype.itemsize,
            transcendentals=b * h * t * t),
    )(qkv2, qkv2, qkv2, g2, out2, lse2)


def pick_heads_per_block(h: int, d: int) -> int:
    """Head-group width for the column-block kernels; returns 0 when the
    (h, d) config cannot form 128-lane-multiple column blocks (callers
    fall back to the staged-transpose path)."""
    hb = int(_os.environ.get("VDN_FLASH_HEADS_PER_BLOCK", "0")) \
        or max(1, 128 // d)
    if h % hb or (d * hb) % 128:
        return 0
    return hb


def _fused_qkv_fwd(qkv, scale, block_q):
    b, t, three, h, d = qkv.shape
    s = d ** -0.5 if scale is None else scale
    hb = pick_heads_per_block(h, d)
    if not hb:
        out = flash_attention_fused_qkv(qkv, scale, block_q)
        out = _checkpoint_name(out, "flash_out")
        return out, (qkv, out, None)
    # training forward: the lse-emitting kernel variant, so the backward
    # recomputes the normalized softmax with one exp2 (no max/sum)
    out2, lse = _flash_cols_call(qkv, float(s), block_q, hb, save_lse=True)
    out = out2.reshape(b, t, h, d)
    out = _checkpoint_name(out, "flash_out")  # see _flash_fwd
    lse = _checkpoint_name(lse, "flash_lse")
    # NOTE: naming qkv 'qkv' (and adding it to REMAT_POLICY) would also
    # drop the qkv-projection matmul from the recompute (~0.9 ms/block),
    # but the 24 x 132 MB saved projections OOM the 16 GB HBM at the
    # vitl b2t8 train shape (measured 2026-08-18) — recompute stays.
    return out, (qkv, out, lse)


def _fused_qkv_bwd(scale, block_q, res, g):
    qkv, out, lse = res
    b, t, _, h, d = qkv.shape
    s = d ** -0.5 if scale is None else scale
    hb = pick_heads_per_block(h, d)
    if not hb:
        # odd head config: the staged-transpose backward
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dq, dk, dv = _flash_grads(q, k, v, g, out, s, block_q)
        return (jnp.stack([dq, dk, dv], axis=2),)
    c = h * d
    dq2, dk2, dv2 = _flash_bwd_cols(
        qkv.reshape(b, t, 3 * c), g.reshape(b, t, c), out.reshape(b, t, c),
        lse, float(s), block_q, hb, h, d)
    dqkv = jnp.concatenate(
        [dq2, dk2.astype(qkv.dtype), dv2.astype(qkv.dtype)], axis=-1)
    return (dqkv.reshape(b, t, 3, h, d),)


flash_attention_fused_qkv.defvjp(_fused_qkv_fwd, _fused_qkv_bwd)


# ---------------- int8 serving forward (no VJP) ----------------
#
# Under the int8 serving mode the encoder's weight matmuls already run
# on the 394-TOPS int8 MXU path (vdn/ops/pallas/int8.py), leaving the
# bf16 flash kernel as the largest single encoder item.  This variant
# quantizes the attention *data* matmuls in VMEM:
#
# - QK^T: q per-ROW dynamic scales (aq [bq,1] broadcasts over the
#   logits' sublane axis for free), k per-head-block scalar after
#   CENTERING k across tokens — subtracting mean_j(k) changes every
#   logit row by a constant (q_i . k_mean), which softmax cancels
#   exactly, and it removes the channel-mean outliers that dominate
#   k's quantization range (the SageAttention trick).  A per-token k
#   scale would be finer but needs a [tk,1]->[1,tk] sublane->lane
#   transpose to broadcast over the logit columns; the scalar scale
#   needs none.
# - P@V: softmax probabilities have an EXACT static range ([0,1] with
#   row-max 1 by construction), so p quantizes with the fixed scale
#   127 — no reduction pass; v takes per-COLUMN scales ([1,d]
#   broadcasts over the output columns for free).  The row-sum ones
#   column rides along as a column of 1s (int8), and the 127s cancel
#   between numerator and denominator.
#
# Modes (VDN_FLASH_INT8, in-model A/B knob): "all", "qk", "pv",
# "0"/off -> bf16 kernel.  Serving-only: no VJP (the trainers never
# reach this path; jax.grad through it raises like the other int8
# kernels).  Numerics bounded vs the XLA reference in
# tests/test_flash_attention.py.
#
# A/B'd and LOST (2026-08-19, cached-window bench, int8_static model):
# bf16 flash 139.6 fps, int8 pv 135.3, int8 all 128.5.  Unlike the
# weight matmuls (K=1024..4096, full int8 MXU tiles -> 1.7-2x), the
# attention data dots don't profit: QK^T contracts d=64 (half the MXU
# depth in EITHER precision, so int8 halves nothing) over lane-sliced
# operands, the AV output is d+1=65 lanes (half-tile), and the
# quantize/round/cast VPU passes over the [bq,tk] probabilities are
# pure additions.  Default OFF — the kernel, tests, and knob stay for
# re-testing on hardware with a wider int8 advantage.
_INT8_FLASH_MODE = _os.environ.get("VDN_FLASH_INT8", "0")


def _flash_cols_int8_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                            heads_per_block: int, d: int, mode: str):
    q2 = q_ref[0]                                        # [bq, hb*d]
    k2 = k_ref[0]                                        # [tk, hb*d]
    v2 = v_ref[0]
    tk = k2.shape[0]
    c2f = jnp.asarray(scale * _LOG2E, jnp.float32)
    outs = []
    for hh in range(heads_per_block):
        sl = slice(hh * d, (hh + 1) * d)
        qh, kh, vh = q2[:, sl], k2[:, sl], v2[:, sl]
        if mode in ("qk", "all"):
            qf = qh.astype(jnp.float32)
            kf = kh.astype(jnp.float32)
            # exact softmax-shift invariance: s_ij - q_i.k_mean
            kf = kf - jnp.mean(kf, axis=0, keepdims=True)
            aq = jnp.maximum(jnp.max(jnp.abs(qf), axis=1, keepdims=True),
                             1e-30) * (1.0 / 127.0)      # [bq, 1]
            ak = jnp.maximum(jnp.max(jnp.abs(kf)), 1e-30) * (1.0 / 127.0)
            qi = jnp.round(qf * (1.0 / aq)).astype(jnp.int8)
            ki = jnp.round(kf * (1.0 / ak)).astype(jnp.int8)
            si = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            s = si.astype(jnp.float32) * (aq * (ak * c2f))  # [bq, tk]
        else:
            s = jax.lax.dot_general(
                qh * jnp.asarray(scale * _LOG2E, qh.dtype), kh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=1, keepdims=True)
        if mode in ("pv", "all"):
            vf = vh.astype(jnp.float32)
            # exact affine invariance of the softmax average:
            # sum_j p_j (v_j - mu) / sum_j p_j + mu == sum p v / sum p —
            # centering v removes the channel means from the quantized
            # range at zero error cost (mirror of the k-centering)
            mu = jnp.mean(vf, axis=0, keepdims=True)     # [1, d]
            vf = vf - mu
            av = jnp.maximum(jnp.max(jnp.abs(vf), axis=0, keepdims=True),
                             1e-30) * (1.0 / 127.0)      # [1, d]
            vi = jnp.round(vf * (1.0 / av)).astype(jnp.int8)
            vx = jnp.concatenate(
                [vi, jnp.full((tk, 1), 1, jnp.int8)], axis=1)
            # 127*p folded into the exponential: exp2(t + log2 127) —
            # one VPU pass instead of exp2 + multiply
            pi = jnp.round(jnp.exp2(s - (m - 6.988684686772166)))\
                .astype(jnp.int8)
            pv = jax.lax.dot_general(pi, vx, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            # out = (sum p_q v_q) * av / sum p_q + mu  (the 127s cancel;
            # the denominator is >= 127: every row's max prob quantizes
            # to exactly 127)
            outs.append(pv[:, :d].astype(jnp.float32) * av /
                        pv[:, d:d + 1].astype(jnp.float32) + mu)
        else:
            pb = jnp.exp2(s - m).astype(v2.dtype)
            vx = jnp.concatenate(
                [vh, jnp.ones((tk, 1), v2.dtype)], axis=1)
            pv = jax.lax.dot_general(pb, vx, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            outs.append(pv[:, :d] / pv[:, d:d + 1])
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _flash_int8_call(qkv, scale: float, block_q: int, hb: int, mode: str):
    """Column-block int8 forward: same blocking as _flash_cols_call
    (128-wide head-group column views of the fused [B,T,3C] tensor),
    serving-only (no lse output, no VJP)."""
    b, t, three, h, d = qkv.shape
    c = h * d
    qkv2 = qkv.reshape(b, t, 3 * c)
    n_colblocks = h // hb
    bq = _pick_block(t, block_q)
    grid = (b, n_colblocks, pl.cdiv(t, bq))
    w = hb * d
    return pl.pallas_call(
        functools.partial(_flash_cols_int8_kernel, scale=scale,
                          heads_per_block=hb, d=d, mode=mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
            pl.BlockSpec((1, t, w),
                         lambda b, g, i, _n=n_colblocks: (b, 0, _n + g)),
            pl.BlockSpec((1, t, w),
                         lambda b, g, i, _n=n_colblocks: (b, 0, 2 * _n + g)),
        ],
        out_specs=pl.BlockSpec((1, bq, w), lambda b, g, i: (b, i, g)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * d,
            bytes_accessed=(qkv.size + qkv.size // 3) * qkv.dtype.itemsize,
            transcendentals=b * h * t * t),
    )(qkv2, qkv2, qkv2)


def flash_attention_int8_fused_qkv(qkv: jnp.ndarray,
                                   scale: Optional[float] = None,
                                   block_q: int = DEFAULT_BLOCK_Q,
                                   mode: Optional[str] = None) -> jnp.ndarray:
    """int8-MXU flash attention off the fused projection (serving only).

    qkv [B, T, 3, H, D] -> out [B, T, H, D]; same contract as
    ``flash_attention_fused_qkv`` but the QK^T and/or P@V dots run
    int8xint8->int32 with in-VMEM dynamic quantization (see the section
    comment above for the scale scheme).  ``mode`` overrides
    VDN_FLASH_INT8 ("all"/"qk"/"pv"; anything else falls back to the
    bf16 kernel).  No VJP — the int8 serving flag never reaches the
    training path."""
    mode = _INT8_FLASH_MODE if mode is None else mode
    b, t, three, h, d = qkv.shape
    assert three == 3
    if scale is None:
        scale = d ** -0.5
    hb = pick_heads_per_block(h, d)
    if mode not in ("qk", "pv", "all") or not hb:
        return flash_attention_fused_qkv(qkv, scale, block_q)
    out2 = _flash_int8_call(qkv, float(scale), block_q, hb, mode)
    return out2.reshape(b, t, h, d)


def _flash_qkv_kernel(qkv_q, qkv_k, qkv_v, o_ref, *, scale: float, hb: int):
    # qkv_q [1, bq, 1, hb, d]; qkv_k/v [1, tk, 1, hb, d]; o [1, hb, bq, d]
    # Mosaic requires dot batch dims at position 0: head-major in VMEM
    q = jnp.swapaxes(qkv_q[0, :, 0], 0, 1)  # [hb, bq, d]
    k = jnp.swapaxes(qkv_k[0, :, 0], 0, 1)  # [hb, tk, d]
    v = jnp.swapaxes(qkv_v[0, :, 0], 0, 1)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale   # [hb, bq, tk]
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [hb, bq, d]
    o_ref[0] = (pv / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def flash_attention_qkv(qkv: jnp.ndarray, scale: Optional[float] = None,
                        block_q: int = DEFAULT_BLOCK_Q) -> jnp.ndarray:
    """Self-attention straight from the fused projection: qkv [B, T, 3, H, D]
    -> [B, H, T, D].  The kernel block-slices q/k/v per (batch, head-group)
    out of the fused tensor, so the three [B,T,H,D] -> [B*H,T,D] input HBM
    transposes are never staged (those cost ~2 ms/layer at vitl-518 window
    shapes); attention runs as head-batched MXU dots.  Head groups are 8
    wide (Pallas requires sublane-divisible block dims)."""
    b, t, three, h, d = qkv.shape
    assert three == 3
    if scale is None:
        scale = d ** -0.5
    # head-group width: sublane-divisible (8) or the full head dim
    hb = 8 if h % 8 == 0 and h > 8 else h
    bq = _pick_block(t, block_q)
    grid = (b, h // hb, pl.cdiv(t, bq))
    out = pl.pallas_call(
        functools.partial(_flash_qkv_kernel, scale=float(scale), hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1, hb, d), lambda b, g, i: (b, i, 0, g, 0)),
            pl.BlockSpec((1, t, 1, hb, d), lambda b, g, i: (b, 0, 1, g, 0)),
            pl.BlockSpec((1, t, 1, hb, d), lambda b, g, i: (b, 0, 2, g, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, bq, d), lambda b, g, i: (b, g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * t * t * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize,
            transcendentals=b * h * t * t),
    )(qkv, qkv, qkv)
    return out
