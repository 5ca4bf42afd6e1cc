"""Pallas blockwise ring-attention step (context parallel, TPU).

The XLA ring in vdn.parallel.context.ring_attention is exact and
autodiff-friendly, but each ring step materializes the full local logits
[B, H, Tq, Tk_local] plus the exp/correction intermediates in HBM — at
long clips (T>=64) that regrows the memory-bound softmax traffic flash
attention removed from the encoder (SURVEY §5's promised blockwise ring;
target shape reference
video_depth_anything/motion_module/motion_module.py:253).

This kernel fuses ONE online-softmax block update into a single pass:
read q, k/v block, (o, m, l) carry once, write the updated carry once —
logits never touch HBM.  The ring itself stays a lax.scan of
kernel + ppermute: XLA schedules the collective-permute of step i+1's
K/V concurrently with step i's kernel (async collectives), which is the
compute/communication overlap a fully in-kernel RDMA ring would
hand-roll; on this rig (1 real chip) an in-kernel ring cannot be
executed or profiled, so the testable decomposition wins.

Temporal-attention shapes are tiny in T and D ([B*H*W tokens, T frames,
D<=128]) and the op is bandwidth-bound; the products are G-batched MXU
dots over a small row block (a VPU broadcast-reduce was tried first but
its [G,Tq,Tk,D] rank-4 intermediate blows past VMEM at T>=64).

Training path: ring_attention_pallas carries a custom_vjp whose backward
re-runs the plain-XLA ring under jax.vjp (pallas_call has no autodiff —
see CLAUDE.md kernel policy; same recompute pattern as
vdn/ops/pallas/mlp.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_G = 8  # batch*head rows per grid step


def _ring_step_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                      o_out, m_out, l_out, *, scale: float):
    q = q_ref[...]                                # [G, Tq, D]
    k = k_ref[...]                                # [G, Tk, D]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [G, Tq, Tk] f32
    m_old = m_ref[...]                            # [G, Tq]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])             # [G, Tq, Tk]
    corr = jnp.exp(m_old - m_new)                 # [G, Tq]
    l_out[...] = l_ref[...] * corr + jnp.sum(p, axis=-1)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[...],
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # [G, Tq, D]
    o_out[...] = o_ref[...] * corr[..., None] + pv
    m_out[...] = m_new


@functools.partial(jax.jit, static_argnames=("scale", "block_g"))
def ring_step(q, k, v, o, m, l, scale: float,
              block_g: int = DEFAULT_BLOCK_G):
    """One fused online-softmax update of (o, m, l) with a K/V block.

    q [BH, Tq, D] (compute dtype); k/v [BH, Tk, D]; o [BH, Tq, D] f32;
    m/l [BH, Tq] f32.  Returns the updated (o, m, l)."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    g = min(block_g, bh)
    grid = (pl.cdiv(bh, g),)
    spec3 = lambda t_, d_: pl.BlockSpec((g, t_, d_), lambda i: (i, 0, 0))
    spec2 = pl.BlockSpec((g, tq), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(_ring_step_kernel, scale=scale),
        grid=grid,
        in_specs=[spec3(tq, d), spec3(tk, d), spec3(tk, d),
                  spec3(tq, d), spec2, spec2],
        out_specs=[spec3(tq, d), spec2, spec2],
        out_shape=[jax.ShapeDtypeStruct((bh, tq, d), jnp.float32),
                   jax.ShapeDtypeStruct((bh, tq), jnp.float32),
                   jax.ShapeDtypeStruct((bh, tq), jnp.float32)],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(q, k, v, o, m, l)


def _ring_pallas_impl(q, k, v, axis_name: str, scale: float):
    """q/k/v [B, T_local, H, D]; K/V rotate around axis_name."""
    p = jax.lax.axis_size(axis_name)
    b, tq, h, d = q.shape
    tk = k.shape[1]
    bh = b * h
    qr = q.transpose(0, 2, 1, 3).reshape(bh, tq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(bh, tk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(bh, tk, d)

    # carries derived from q so they inherit its varying-manual-axes type
    # under shard_map (cf. vdn/parallel/context.py:ring_attention)
    o0 = qr.astype(jnp.float32) * 0.0
    m0 = o0[:, :, 0] - 1e30
    l0 = o0[:, :, 0]

    perm = [(i, (i + 1) % p) for i in range(p)]

    def step(carry, _):
        o, m, l, k_cur, v_cur = carry
        # XLA schedules the permute for step i+1 concurrently with the
        # fused block kernel for step i (async collective-permute)
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        o, m, l = ring_step(qr, k_cur, v_cur, o, m, l, scale)
        return (o, m, l, k_next, v_next), None

    (o, m, l, _, _), _ = jax.lax.scan(step, (o0, m0, l0, kr, vr),
                                      None, length=p)
    out = (o / l[..., None]).astype(q.dtype)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def ring_attention_pallas(q, k, v, axis_name: str,
                          scale: Optional[float] = None):
    """Drop-in for vdn.parallel.context.ring_attention (same signature
    semantics: q/k/v [B, T_local, H, D] sharded over axis_name)."""
    return _ring_pallas_impl(q, k, v, axis_name,
                             scale or q.shape[-1] ** -0.5)


def _fwd(q, k, v, axis_name, scale):
    out = _ring_pallas_impl(q, k, v, axis_name,
                            scale or q.shape[-1] ** -0.5)
    return out, (q, k, v)


def _bwd(axis_name, scale, res, g):
    # recompute via the differentiable XLA ring (collectives differentiate)
    from vdn.parallel.context import ring_attention
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: ring_attention(q, k, v, axis_name, scale), q, k, v)
    return vjp(g)


ring_attention_pallas.defvjp(_fwd, _bwd)
