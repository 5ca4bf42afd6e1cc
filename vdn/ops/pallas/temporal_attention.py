"""Pallas fused temporal window attention (TPU) — the motion-module core.

The AnimateDiff-style temporal mixers (reference
video_depth_anything/motion_module/motion_module.py:216-326 and
attention.py:245-326) attend over a tiny frame axis (T<=32) independently
per spatial token.  Under XLA this shape is pathological on TPU: the
[BN, H, T, T] logits carry T=32 in the minor (lane) dim so every softmax
pass runs at 25% lane occupancy, the head split (C -> H x 32) forces
physical relayout copies, and the projection dots get transposes fused
into them at up to 26x over their FLOP cost (trace 2026-08-18: the four
mixers were 60 ms of a 426 ms vitl-518 window, ~7x their compute floor).

This kernel runs the whole attention block per grid step on a block of
spatial tokens: +APE -> q/k/v projections (MXU, full C contraction) ->
head-batched [T, dh] x [dh, T] dots -> fp32 softmax -> AV -> output
projection, all in VMEM.  The head relayouts still happen, but as VMEM
register shuffles instead of HBM round trips, and no [BN, H, T, T]
tensor ever touches HBM.

Differentiable via custom_vjp: the backward recomputes with the plain-XLA
reference math (``xla_temporal_attention_block``) — remat-style, like the
fused MLP kernel; the temporal head is frozen in the canonical v4
training recipe so only activation gradients flow through.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# spatial tokens per grid step, scaled down for wide channels so the
# q/k/v blocks stay comfortably inside VMEM
_BLOCK_TOKENS = int(_os.environ.get("VDN_TEMPORAL_BLOCK_TOKENS", "256"))


def _kernel(x_ref, pe_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, scale: float):
    p, t, c = x_ref.shape
    dh = c // heads
    dt = x_ref.dtype

    x = x_ref[...] + pe_ref[...]                       # [P, t, c]
    x2 = x.reshape(p * t, c)

    def proj(w_ref):
        return jax.lax.dot_general(
            x2, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)  # [P*t, c]

    q = proj(wq_ref)
    k = proj(wk_ref)
    v = proj(wv_ref)

    # per-head: lane-slice the fused projections (Mosaic rejects the
    # C -> (H, dh) lane-splitting reshape), batch the [t, dh] x [dh, t]
    # dots over the token block, and accumulate each head's slice of the
    # output projection — head h+1's MXU dots can overlap head h's VPU
    # softmax, and the [P, H, t, t] logits never leave VMEM
    acc = None
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = q[:, sl].reshape(p, t, dh)
        kh = k[:, sl].reshape(p, t, dh)
        vh = v[:, sl].reshape(p, t, dh)
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale    # [P, t, t] f32
        m = jnp.max(s, axis=2, keepdims=True)
        e = jnp.exp(s - m)
        probs = (e / jnp.sum(e, axis=2, keepdims=True)).astype(dt)
        pv = jax.lax.dot_general(
            probs, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)  # [P, t, dh]
        contrib = jax.lax.dot_general(
            pv.reshape(p * t, dh), wo_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # [P*t, c] f32
        acc = contrib if acc is None else acc + contrib
    out = acc.astype(dt) + bo_ref[...]
    o_ref[...] = out.reshape(p, t, c)


@functools.partial(jax.jit, static_argnames=("heads", "scale"))
def _fused_fwd_impl(x, pe, wq, wk, wv, wo, bo, heads: int, scale: float):
    bn, t, c = x.shape
    # scale the token block inversely with channel width: the live set is
    # ~11 block-sized tensors (x, q/k/v pre+post head-relayout, fp32
    # logits, pv, out) + double-buffered in/out + weights; c=1024 at 128
    # tokens overflowed the 128 MB VMEM by 13 MB
    blk = max(8, min(_BLOCK_TOKENS * 256 // max(c, 256), bn))
    grid = (pl.cdiv(bn, blk),)
    dt = x.dtype
    cast = lambda w: w.astype(dt)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bn, t, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=bn * t * c * (8 * c + 4 * t),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bn * heads * t * t),
    )(x, pe.reshape(1, t, c).astype(dt), cast(wq), cast(wk), cast(wv),
      cast(wo), bo.reshape(1, c).astype(dt))


def xla_temporal_attention_block(x, pe, wq, wk, wv, wo, bo, heads, scale):
    """Plain-XLA reference of the kernel math (same dtype discipline as
    vdn.nn.layers.Linear + vdn.ops.attention._xla_attention); used as the
    recompute target of the backward pass and by the parity test."""
    bn, t, c = x.shape
    dt = x.dtype
    dh = c // heads
    xp = x + pe[None].astype(dt)
    x2 = xp.reshape(bn * t, c)
    q = (x2 @ wq.astype(dt)).reshape(bn, t, heads, dh)
    k = (x2 @ wk.astype(dt)).reshape(bn, t, heads, dh)
    v = (x2 @ wv.astype(dt)).reshape(bn, t, heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(bn * t, c)
    out = out @ wo.astype(dt) + bo.astype(dt)
    return out.reshape(bn, t, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def temporal_attention_block(x, pe, wq, wk, wv, wo, bo,
                             heads: int, scale: float):
    """Fused q/k/v/attention/out-proj over [BN, T, C] (T = frame window).

    ``pe`` [T, C] is the APE slice added before the projections
    (reference motion_module.py:282-284).  Returns [BN, T, C] (caller
    adds the residual)."""
    return _fused_fwd_impl(x, pe, wq, wk, wv, wo, bo, heads, scale)


def _fwd(x, pe, wq, wk, wv, wo, bo, heads, scale):
    out = _fused_fwd_impl(x, pe, wq, wk, wv, wo, bo, heads, scale)
    return out, (x, pe, wq, wk, wv, wo, bo)


def _bwd(heads, scale, res, g):
    x, pe, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: xla_temporal_attention_block(*a, heads, scale),
        x, pe, wq, wk, wv, wo, bo)
    return vjp(g)


temporal_attention_block.defvjp(_fwd, _bwd)


@functools.lru_cache(maxsize=1)
def fused_temporal_enabled() -> bool:
    if _os.environ.get("VDN_DISABLE_FUSED_TEMPORAL", "0") != "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
