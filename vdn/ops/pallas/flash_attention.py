"""Pallas flash attention (TPU) — the ViT encoder hot path.

Replaces the reference's xformers memory-efficient attention
(reference depth_anything_v2/dinov2_layers/attention.py:64-81) with a
blockwise streaming-softmax kernel: logits never materialize in HBM
(the XLA einsum path would stage a [B, H, T, T] fp32 tensor — ~3.8 GB for a
32-frame vitl window), and the running max/sum rescaling keeps softmax in
fp32 while inputs stay bf16 on the MXU.

Layout: inputs [B, T, H, D] (library convention) are transposed/reshaped to
[B*H, T, D] on entry; T is padded to the q/k block size and D to the 128-lane
width, with -inf masking of padded key columns inside the kernel.  Grid is
(batch*heads, q-blocks, k-blocks) with the k axis sequential so the
accumulator scratch carries across k steps.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                  scale: float, kv_len: int, block_k: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [bk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # [bq, bk]

    # mask padded key columns
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]                            # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                           # [bq, bk] f32
    correction = jnp.exp(m_prev - m_new)             # [bq, 1]
    l_new = correction * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [bq, d]
    acc_ref[:] = acc_ref[:] * correction + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_bhtd(q, k, v, scale: float, block_q: int, block_k: int):
    """q [BH, Tq, D], k/v [BH, Tk, D] -> [BH, Tq, D]."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    d_pad = max(128, int(np.ceil(d / 128)) * 128)
    tq_pad = int(np.ceil(tq / block_q)) * block_q
    tk_pad = int(np.ceil(tk / block_k)) * block_k
    qp = _pad_to(_pad_to(q, tq_pad, 1), d_pad, 2)
    kp = _pad_to(_pad_to(k, tk_pad, 1), d_pad, 2)
    vp = _pad_to(_pad_to(v, tk_pad, 1), d_pad, 2)

    grid = (bh, tq_pad // block_q, tk_pad // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=tk,
                          block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad),
                               lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_pad), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq_pad * tk_pad * d_pad,
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * tq_pad * tk_pad),
    )(qp, kp, vp)
    return out[:, :tq, :d]


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K) -> jnp.ndarray:
    """Attention over [B, T, H, D] (same contract as the XLA path in
    vdn.ops.attention)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def to_bhtd(x, t):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    out = _flash_bhtd(to_bhtd(q, tq), to_bhtd(k, tk), to_bhtd(v, tk),
                      float(scale), block_q, block_k)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
