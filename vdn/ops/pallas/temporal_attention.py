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

Differentiable via custom_vjp.  The activation gradient dx — the only
cotangent that survives under the canonical v4 recipe, which freezes the
temporal head (reference scripts/train_v4.py:493-494) — is a second
Pallas kernel (``_bwd_kernel``) with the same VMEM-resident blocking as
the forward: the XLA autodiff of this tiny-T shape paid the exact
pathologies the forward kernel removes (25%-lane softmax passes, head
relayout copies fused into the grad dots at far over their FLOP cost —
~10 ms per attention block vs ~1 ms forward, train trace 2026-08-18).
Weight/PE cotangents still come from jax.vjp of the plain-XLA reference
math (``xla_temporal_attention_block``): they are dead code under the
frozen recipe (XLA DCEs the whole branch), and when the head is
unfrozen the duplicated shared chain is roughly offset by the dx dots
that go dead in the XLA branch instead.
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
    # tokens overflowed the 128 MB VMEM by 13 MB.  NOTE a t-aware variant
    # (4x larger blocks at the t=8 train shape) was A/B'd 2026-08-19 and
    # LOST: fwd 7.10 -> 7.96 ms, bwd 14.57 -> 16.93 ms per step — small
    # blocks pipeline the x DMA against the MXU better (same finding as
    # the fused-MLP 256-row sweep).
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


def _bwd_kernel(x_ref, pe_ref, g_ref, wq_ref, wk_ref, wv_ref, wo_ref,
                dx_ref, *, heads: int, scale: float):
    """dx of the fused temporal attention block, one token block per grid
    step.  Recomputes q/k/v/softmax in VMEM (same math as ``_kernel``),
    then runs the attention backward per head and folds dq/dk/dv through
    the projection transposes into one dx block — no [P, H, t, t] tensor
    or head relayout ever reaches HBM."""
    p, t, c = x_ref.shape
    dh = c // heads
    dt = x_ref.dtype

    x = x_ref[...] + pe_ref[...]                       # [P, t, c]
    x2 = x.reshape(p * t, c)
    g2 = g_ref[...].reshape(p * t, c)

    def proj(w_ref):
        return jax.lax.dot_general(
            x2, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)  # [P*t, c]

    q = proj(wq_ref)
    k = proj(wk_ref)
    v = proj(wv_ref)

    dqs, dks, dvs = [], [], []
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
        probs = e / jnp.sum(e, axis=2, keepdims=True)      # f32
        pd = probs.astype(dt)
        # d o_h: out = sum_h o_h @ wo[sl, :] + bo
        doh = jax.lax.dot_general(
            g2, wo_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt) \
            .reshape(p, t, dh)                             # [P, t, dh]
        dvs.append(jax.lax.dot_general(
            pd, doh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
            .astype(dt).reshape(p * t, dh))                # [P*t, dh]
        dp = jax.lax.dot_general(
            doh, vh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)            # [P, t, t] f32
        delta = jnp.sum(dp * probs, axis=2, keepdims=True)
        ds = (probs * (dp - delta) * scale).astype(dt)     # [P, t, t]
        dqs.append(jax.lax.dot_general(
            ds, kh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
            .astype(dt).reshape(p * t, dh))
        dks.append(jax.lax.dot_general(
            ds, qh, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
            .astype(dt).reshape(p * t, dh))
    dq = jnp.concatenate(dqs, axis=1)                      # [P*t, c]
    dk = jnp.concatenate(dks, axis=1)
    dv = jnp.concatenate(dvs, axis=1)

    def unproj(dy, w_ref):  # dy @ w^T
        return jax.lax.dot_general(
            dy, w_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [P*t, c] f32

    dx2 = unproj(dq, wq_ref) + unproj(dk, wk_ref) + unproj(dv, wv_ref)
    dx_ref[...] = dx2.astype(dt).reshape(p, t, c)


@functools.partial(jax.jit, static_argnames=("heads", "scale"))
def _fused_bwd_dx_impl(x, pe, g, wq, wk, wv, wo, heads: int, scale: float):
    bn, t, c = x.shape
    # live set is ~2x the forward kernel's (q/k/v + dq/dk/dv + two
    # [P, t, t] f32 logits-sized tensors): halve the token block
    # (t-aware 4x-larger blocks lost the A/B — see _fused_fwd_impl)
    blk = max(8, min(_BLOCK_TOKENS * 128 // max(c, 256), bn))
    grid = (pl.cdiv(bn, blk),)
    dt = x.dtype
    cast = lambda w: w.astype(dt)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bn, t, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=bn * t * c * (14 * c + 10 * t),
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=bn * heads * t * t),
    )(x, pe.reshape(1, t, c).astype(dt), g.astype(dt), cast(wq), cast(wk),
      cast(wv), cast(wo))


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
    if fused_temporal_enabled():
        # dx from the Pallas kernel; weight/PE cotangents from the XLA
        # reference vjp (dead code when the temporal head is frozen —
        # the canonical recipe — so XLA DCEs that whole branch; its dx
        # output is discarded, DCE-ing the XLA dx dots in exchange)
        dx = _fused_bwd_dx_impl(x, pe, g, wq, wk, wv, wo, heads, scale)
        _, vjp = jax.vjp(
            lambda *a: xla_temporal_attention_block(x, *a, heads, scale),
            pe, wq, wk, wv, wo, bo)
        dpe, dwq, dwk, dwv, dwo, dbo = vjp(g)
        return dx, dpe, dwq, dwk, dwv, dwo, dbo
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
