"""Pallas fused chunk-window attention (TPU) — the streaming decode core.

The stream pipeline's batched decode (vdn/pipelines/stream.py
``step_batched``) gives every frame of a k-frame chunk its own 32-entry
window assembled from [ring buffer (CAP) ‖ in-chunk entries (k)] via a
host-built one-hot column map (reference policy
video_depth_anything/video_depth_stream.py:133-158).  Under XLA this
shape pays materialized head-split / concat relayout copies and
low-lane-occupancy softmax passes (~25 ms of a 110 ms 8-frame chunk,
trace 2026-08-20) — the same pathology class the fused clip kernel
(vdn/ops/pallas/temporal_attention.py) removes for the windowed path.

One grid step = one block of P spatial tokens, entirely in VMEM:
+APE(w-1) on queries -> q/k/v projections (MXU, full-C contraction;
ring and in-chunk columns projected once, position-free) -> per-head
per-frame window gather (one-hot matmul) + q.pe_k corrections -> fp32
softmax over the 32 window positions -> probability scatter -> AV dots
+ probs.pe_v correction -> output projection accumulated across heads.
The APE linearity trick matches vdn/nn/motion.py _chunk_window exactly:
K(col at pos p) = to_k(raw) + to_k(pe[p]).

Serving-only: no VJP (the training path never reaches streaming
decode); parity vs the XLA algebra is tests/test_chunk_window_kernel.py
and transitively the per-frame scan via
test_streaming_chunked_matches_per_frame.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_TOKENS = int(_os.environ.get("VDN_CHUNK_WINDOW_BLOCK_TOKENS",
                                    "256"))


def _kernel(x_ref, buf_ref, oh_ref, pe_q_ref, pek_ref, pev_ref,
            wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
            *, heads: int, scale: float):
    p, kf, c = x_ref.shape
    cap = buf_ref.shape[1]
    w = pek_ref.shape[0]
    dh = c // heads
    dt = x_ref.dtype

    x = x_ref[...]                                     # [P, k, C]
    ring = buf_ref[...]                                # [P, cap, C]
    xq2 = (x + pe_q_ref[...]).reshape(p * kf, c)       # query + APE(w-1)
    x2 = x.reshape(p * kf, c)
    r2 = ring.reshape(p * cap, c)

    def proj(y2, w_ref):
        return jax.lax.dot_general(
            y2, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    q2 = proj(xq2, wq_ref)
    kr2, kn2 = proj(r2, wk_ref), proj(x2, wk_ref)
    vr2, vn2 = proj(r2, wv_ref), proj(x2, wv_ref)

    # per-frame one-hot maps broadcast to the token block ONCE (shared
    # across heads) — everything below is 2D or batched-3D dot_general
    # and slice-born unit dims (Mosaic rejects unsqueezing reshapes)
    oh_b = [jnp.broadcast_to(oh_ref[j][None], (p, w, cap + kf))
            for j in range(kf)]

    acc = None
    for hh in range(heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh = q2[:, sl].reshape(p, kf, dh)
        krh = kr2[:, sl].reshape(p, cap, dh)
        knh = kn2[:, sl].reshape(p, kf, dh)
        vrh = vr2[:, sl].reshape(p, cap, dh)
        vnh = vn2[:, sl].reshape(p, kf, dh)
        pekh = pek_ref[:, sl]                          # [W, dh]
        pevh_b = jnp.broadcast_to(pev_ref[:, sl][None], (p, w, dh))

        s_r = jax.lax.dot_general(                     # [P, k, cap] f32
            qh, krh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s_n = jax.lax.dot_general(                     # [P, k, k] f32
            qh, knh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        qpe = jax.lax.dot_general(                     # [P, k, W] f32
            qh, pekh, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        outh = None
        batch0 = lambda a, b, cd: jax.lax.dot_general(
            a, b, (((2,), (cd,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        for j in range(kf):
            # frame j's window logits: gather its cap+k column scores
            # through the one-hot map, add the APE correction
            s_j = jnp.concatenate(
                [s_r[:, j:j + 1], s_n[:, j:j + 1]], axis=2)  # [P,1,c2]
            lw = batch0(s_j, oh_b[j], 2) + qpe[:, j:j + 1]   # [P,1,W]
            lw = lw * scale
            m = jnp.max(lw, axis=2, keepdims=True)
            e = jnp.exp(lw - m)
            pw = e / jnp.sum(e, axis=2, keepdims=True)       # [P,1,W] f32
            pcols = batch0(pw, oh_b[j], 1).astype(dt)        # [P,1,c2]
            o_j = batch0(pcols[:, :, :cap], vrh, 1) \
                + batch0(pcols[:, :, cap:], vnh, 1) \
                + batch0(pw.astype(dt), pevh_b, 1)           # [P,1,dh]
            o_j = o_j.astype(dt)
            outh = o_j if outh is None else jnp.concatenate(
                [outh, o_j], axis=1)                         # [P,j+1,dh]

        contrib = jax.lax.dot_general(                 # [P*k, C] f32
            outh.reshape(p * kf, dh), wo_ref[sl, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = contrib if acc is None else acc + contrib
    out = acc.astype(dt) + bo_ref[...]
    o_ref[...] = out.reshape(p, kf, c)


@functools.partial(jax.jit, static_argnames=("heads", "scale"))
def _chunk_window_impl(x, buf, onehot, pe, wq, wk, wv, wo, bo,
                       heads: int, scale: float):
    n, kf, c = x.shape
    cap = buf.shape[1]
    w = pe.shape[0]
    dt = x.dtype
    cast = lambda a: a.astype(dt)
    # APE projections hoisted (tiny [W, C] x [C, C] dots, done once)
    pe_k = jnp.matmul(pe.astype(dt), wk.astype(dt))
    pe_v = jnp.matmul(pe.astype(dt), wv.astype(dt))
    pe_q = jnp.broadcast_to(pe[w - 1].astype(dt), (1, kf, c))

    blk = max(8, min(_BLOCK_TOKENS * 256 // max(c, 256), n))
    grid = (pl.cdiv(n, blk),)
    fixed2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk, kf, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((blk, cap, c), lambda i: (i, 0, 0)),
            pl.BlockSpec(onehot.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec((1, kf, c), lambda i: (0, 0, 0)),
            fixed2((w, c)), fixed2((w, c)),
            fixed2((c, c)), fixed2((c, c)), fixed2((c, c)),
            fixed2((c, c)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, kf, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, kf, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (2 * cap + 3 * kf) * c * c,
            bytes_accessed=(2 * n * kf * c + n * cap * c) * dt.itemsize,
            transcendentals=n * kf * w),
    )(x, buf.astype(dt), onehot.astype(jnp.float32), pe_q,
      pe_k, pe_v, cast(wq), cast(wk), cast(wv), cast(wo),
      bo.astype(dt).reshape(1, c))


def chunk_window_attention(x, buf, onehot, pe, wq, wk, wv, wo, bo,
                           heads: int, scale: float):
    """x [N, k, C] block inputs, buf [N, CAP, C] ring, onehot
    [k, W, CAP+k] window column map, pe [W, C] APE table ->
    out [N, k, C] (pre-residual attention-block output)."""
    return _chunk_window_impl(x, buf, onehot, pe, wq, wk, wv, wo, bo,
                              heads, float(scale))


def chunk_window_enabled(n: int, c: int, cap: int, kf: int) -> bool:
    """A/B'd 2026-08-20 and LOST — default OFF (VDN_CHUNK_WINDOW_KERNEL=1
    re-enables).  The 8-frame vitl chunk went 110.5 -> 123.4 ms module
    wall: the per-(head, frame) inner structure unrolls into 64 chains
    of tiny [P,1,*] batched dots that are MXU-latency-bound, costing
    ~29 ms more than the XLA relayout glue they delete (data formatting
    did collapse 10.5 -> 0.9 ms, confirming the motivation; the win is
    eaten by kernel issue latency).  A j-batched window gather needs a
    lane-merging [P, k, cap+k] -> [P, k*(cap+k)] view Mosaic rejects;
    left as the known follow-up.  cap/kf must be sublane multiples
    (Mosaic rejects the [P*cap, dh] -> [P, cap, dh] view otherwise)."""
    if _os.environ.get("VDN_CHUNK_WINDOW_KERNEL", "0") == "0":
        return False
    from vdn.ops.attention import _on_tpu
    ok = (n >= 1024 and c % 128 == 0 and cap % 8 == 0 and kf % 8 == 0
          and _on_tpu())
    if not ok:
        # NOTE the shipped stream pipeline uses CAPACITY=43 (cap % 8 != 0),
        # so the flag silently no-oping there was a real trap — say so.
        import warnings
        warnings.warn(
            "VDN_CHUNK_WINDOW_KERNEL=1 set but the shape gate rejects "
            f"(n={n}, c={c}, cap={cap}, kf={kf}; needs n>=1024, c%128==0, "
            "cap%8==0, kf%8==0, TPU) — falling back to the XLA "
            "chunk-window path", stacklevel=2)
    return ok
