"""Pallas fused W-resize + lane-packed fp32-island head (TPU).

The DPT output head ends in ``resize(bilinear, align_corners) ->
conv3x3(C->32) -> ReLU -> conv1x1(32->1) -> act`` at full output
resolution (reference dpt_temporal.py:108-110, depth_anything_v2/
dpt.py:140-151).  Even with the banded-matmul resize kernels and the
lane-packed island conv (vdn/ops/packed_conv.py), the [N, 518, 518, C]
W-resized feature makes a full HBM round trip between the two ops —
~2.2 GB per vitl 32-frame window; the pair measured ~20.5 ms of a
386 ms window (trace 2026-08-18).

This kernel keeps the resized rows in VMEM, straight-line (no loops,
no masks).  Per (image, row-tile of TH output rows):
  1. The H-axis resize happens OUTSIDE (the relayout-free rows kernel
     already runs it at memory speed) but into a padded plan: row 0 is
     an all-zero-weight row (the 3x3 conv's top zero padding) and the
     buffer extends to tiles*TH+2 rows of zeros (bottom padding + tile
     overrun guard), so the kernel can slice [TH+2, W_in, C] blocks
     with a plain dynamic slice.
  2. W-resize of the whole block as ONE dot_general: the ``pack``
     strided slabs ``Rw[p::pack]`` stack into a [pack*(G+2), W_in]
     matrix contracted with the block's W axis, so group g's lane block
     holds output columns pack*g..pack*g+pack-1 with no strided
     gathers; the slabs carry one zero border row per side, which
     doubles as the conv's column zero-padding.
  3. The packed 3x3 conv as 3*(pack+1) whole-tile matmuls: output
     column pack*g+p_out taps resized column pack*g + (p_out+dx-1);
     bucketing by s = p_out+dx-1 (shift a = s//pack, phase b = s%pack)
     lets every (dx, p_out) pair with the same s share one dense
     [C, 128] weight block, and — because the shift is a *row offset in
     the packed slab* — each bucket is one [(G+2)*TH, C] x [C, 128]
     matmul.  Buckets accumulate into one accumulator per shift offset
     (0/1/2), resolved by three shifted slice-adds at the end.
  4. Bias + ReLU + block-diagonal 1x1 collapse + final activation,
     emitting only the packed depth [pack, TH, G] — the C-channel
     resized feature never leaves HBM... never *enters* HBM.

Backward (the metric-depth trainer reaches this head) is a custom_vjp
recompute of the composite XLA reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = int(__import__("os").environ.get("VDN_ISLAND_TILE_ROWS", "48"))


class _Plan:
    """Hashable trace-time constant: stacked packed W-resize slabs
    [P*G2, W_in] (each slab's rows 0 and G+1.. are zero borders)."""
    __slots__ = ("arr", "g2", "_h")

    def __init__(self, w_out: int, w_in: int, pack: int):
        from vdn.ops.resize import _plan_axis
        idx, w = _plan_axis(w_out, w_in, "bilinear", True, None)
        dense = np.zeros((w_out, w_in), np.float32)
        o = np.arange(w_out)
        for tap in range(idx.shape[1]):
            np.add.at(dense, (o, idx[:, tap]), w[:, tap])
        g = -(-w_out // pack)
        g2 = -(-(g + 2) // 8) * 8  # sublane-tileable slab height
        slabs = np.zeros((pack, g2, w_in), np.float32)
        for p in range(pack):
            rows = dense[p::pack]
            slabs[p, 1:1 + rows.shape[0]] = rows
        self.arr = slabs.reshape(pack * g2, w_in)
        self.g2 = g2
        self._h = hash((w_out, w_in, pack))

    def __hash__(self):
        return self._h

    def __eq__(self, other):
        return isinstance(other, _Plan) and self.arr.shape == other.arr.shape \
            and np.array_equal(self.arr, other.arr)


def _bucket_weights(w1, pack: int):
    """w1 [3, 3, C, O] -> [3, pack+1, C, pack*O] bucket blocks (jnp,
    so the custom_vjp recompute backward can differentiate through)."""
    kh, kw, c, o = w1.shape
    n_s = pack + kw - 2  # s = p_out+dx-1 in [-1, pack+kw-3]
    out = jnp.zeros((kh, n_s + 1, c, pack * o), w1.dtype)
    for dy in range(kh):
        for dx in range(kw):
            for p_out in range(pack):
                s = p_out + dx - 1
                out = out.at[dy, s + 1, :,
                             p_out * o:(p_out + 1) * o].set(w1[dy, dx])
    return out


def _padded_h_resize(feat, h_out: int, hp: int):
    """Bilinear align-corners H-resize of [..., H, W, C] to ``h_out``
    rows, emitted into an ``hp``-row buffer: row 0 and rows h_out+1..
    are zeros (top/bottom conv padding + tile overrun guard), produced
    by zero-weight rows in the interpolation plan — no pad copy."""
    from vdn.ops.resize import _HashableArray, _plan_axis
    idx, w = _plan_axis(h_out, feat.shape[-3], "bilinear", True, None)
    taps = idx.shape[1]
    idx_p = np.concatenate(
        [idx[:1]] + [idx] + [idx[-1:]] * (hp - h_out - 1))
    w_p = np.concatenate(
        [np.zeros_like(w[:1]), w,
         np.zeros((hp - h_out - 1, taps), w.dtype)])
    import os
    if os.environ.get("VDN_PALLAS_RESIZE", "1") != "0" \
            and jax.default_backend() == "tpu":
        from vdn.ops.pallas import resize as presize
        if presize.supports_rows(feat.shape, feat.ndim - 3, idx_p, hp,
                                 feat.dtype):
            from vdn.ops.resize import _pallas_resize_h
            return _pallas_resize_h(
                feat, hp, (_HashableArray(idx_p), _HashableArray(w_p)))
    ax = feat.ndim - 3
    gathered = jnp.take(feat, jnp.asarray(idx_p.reshape(-1)), axis=ax)
    gathered = gathered.reshape(feat.shape[:ax] + (hp, taps)
                                + feat.shape[ax + 1:])
    wshape = [1] * gathered.ndim
    wshape[ax], wshape[ax + 1] = hp, taps
    wj = jnp.asarray(w_p).reshape(wshape).astype(gathered.dtype)
    return (gathered * wj).sum(axis=ax + 1)


def _kernel(x_ref, rw_ref, wb_ref, b1_ref, w2_ref, b2_ref, o_ref, u_scr,
            *, th: int, pack: int, gq: int, g2: int, sigmoid: bool,
            max_depth: float):
    n_s = wb_ref.shape[1]
    r0 = pl.program_id(1) * th
    dt = x_ref.dtype
    rw = rw_ref[...].astype(dt)                           # [P*G2, w_in]

    # per-row W-resize fill: one stacked slab matmul per row, contiguous
    # [P*G2, C] store (no masks — zero borders came in via the padded H
    # plan; a whole-tile dot_general on the [th+2, w_in, C] block was
    # measured SLOWER: the non-minor w_in contraction relayouts the block)
    for i in range(th + 2):  # static unroll: no loop-carry overhead
        up = jax.lax.dot_general(
            rw, x_ref[0, r0 + i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [P*G2, C]
        u_scr[i] = up.astype(dt)

    b1 = b1_ref[...].astype(jnp.float32).reshape(1, 1, -1)
    b2 = b2_ref[...].astype(jnp.float32).reshape(1, 1, -1)

    # bucket matmuls over the whole row tile, grouped by shift offset
    # off = 1 + (si-1)//pack in {0, 1, 2}; conv column zero-padding via
    # the slab border rows
    po = wb_ref.shape[3]
    accs = [jnp.zeros((th, g2, po), jnp.float32) for _ in range(3)]
    for dy in range(3):
        for si in range(n_s):
            a, b = (si - 1) // pack, (si - 1) % pack
            w_blk = wb_ref[dy, si].astype(dt)             # [C, pack*O]
            src = u_scr[dy:dy + th, b * g2:(b + 1) * g2]  # [th, G2, C]
            accs[1 + a] += jax.lax.dot_general(
                src, w_blk, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [th, G2, P*O]
    acc = (accs[0][:, 0:gq] + accs[1][:, 1:1 + gq]
           + accs[2][:, 2:2 + gq])                        # [th, gq, P*O]
    y = jnp.maximum(acc + b1, 0.0).astype(dt)
    z = jax.lax.dot_general(
        y, w2_ref[...].astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2          # [th, gq, 128]
    if sigmoid:
        z = jax.nn.sigmoid(z) * max_depth
    else:
        z = jnp.maximum(z, 0.0)
    o_ref[0] = z[:, :, :pack].transpose(2, 0, 1)          # [P, th, gq]


@functools.partial(jax.jit,
                   static_argnames=("w_out", "plan", "sigmoid", "max_depth"))
def _fused_w_resize_island(xh, w1, b1, w2, b2, w_out: int, plan,
                           sigmoid: bool, max_depth: float):
    """xh [N, tiles*TH+2, W_in, C] (already H-resized via the padded
    plan; h_out = the real output height) -> [N, h_out, W_out, 1] fp32
    = act(conv1x1(relu(conv3x3(W-resize(xh)))))."""
    n, hp, w_in, c = xh.shape
    o = w1.shape[-1]
    pack = 128 // o
    gq = -(-w_out // pack)
    dt = xh.dtype

    g2 = plan.g2
    wb = _bucket_weights(w1, pack)                     # [3, P+1, C, P*O]
    w2b = jnp.zeros((pack * o, 128), w2.dtype)
    for p in range(pack):
        w2b = w2b.at[p * o:(p + 1) * o, p:p + 1].set(w2)
    b1p = jnp.tile(b1, pack).reshape(1, pack * o)
    b2p = jnp.zeros((1, 128), jnp.float32).at[0, :pack].set(
        jnp.broadcast_to(b2.astype(jnp.float32), (pack,)))

    th = min(_TH, hp - 2)
    tiles = (hp - 2) // th
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, pack=pack, gq=gq, g2=g2,
                          sigmoid=sigmoid, max_depth=float(max_depth)),
        grid=(n, tiles),
        in_specs=[
            pl.BlockSpec((1, hp, w_in, c), lambda ni, r: (ni, 0, 0, 0)),
            pl.BlockSpec((pack * g2, w_in), lambda ni, r: (0, 0)),
            pl.BlockSpec(wb.shape, lambda ni, r: (0, 0, 0, 0)),
            pl.BlockSpec((1, pack * o), lambda ni, r: (0, 0)),
            pl.BlockSpec((pack * o, 128), lambda ni, r: (0, 0)),
            pl.BlockSpec((1, 128), lambda ni, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pack, th, gq), lambda ni, r: (ni, 0, r, 0)),
        out_shape=jax.ShapeDtypeStruct((n, pack, tiles * th, gq),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((th + 2, pack * g2, c), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hp * (w_out * w_in * c
                                + w_out * 9 * c * o + w_out * o),
            bytes_accessed=(xh.size + n * hp * w_out) * 4,
            transcendentals=0),
    )(xh, jnp.asarray(plan.arr), wb.astype(dt), b1p, w2b, b2p)
    # [N, P, tiles*TH, G] -> [N, tiles*TH, G*P] -> crop
    out = out.transpose(0, 2, 3, 1).reshape(n, tiles * th, gq * pack)
    return out[:, :, :w_out, None]


def _composite_reference(feat, w1, b1, w2, b2, out_hw, sigmoid, max_depth):
    """The unfused path this kernel replaces (recompute-backward target)."""
    from vdn.ops.packed_conv import packed_island_head
    from vdn.ops.resize import resize2d
    act = (lambda v: jax.nn.sigmoid(v) * max_depth) if sigmoid \
        else jax.nn.relu
    up = resize2d(feat, out_hw, "bilinear", align_corners=True)
    return packed_island_head(up, w1, b1, w2, b2, act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_resize_island(feat, w1, b1, w2, b2, out_hw,
                        sigmoid: bool = False, max_depth: float = 1.0):
    """feat [N, h, w, C] -> act(conv1x1(relu(conv3x3(resize(feat, out_hw)))))
    without materializing the resized C-channel feature in HBM.

    w1 [3, 3, C, O] with 128 % O == 0; w2 [O, 1]; b1 [O]; b2 [1].
    ``sigmoid`` selects the metric-depth head activation
    (sigmoid * max_depth), else ReLU."""
    h_out, w_out = int(out_hw[0]), int(out_hw[1])
    th = min(_TH, h_out)
    tiles = -(-h_out // th)
    xh = _padded_h_resize(feat, h_out, tiles * th + 2)
    plan = _Plan(w_out, feat.shape[-2], 128 // w1.shape[-1])
    out = _fused_w_resize_island(xh, w1, b1, w2, b2, w_out, plan,
                                 bool(sigmoid), float(max_depth))
    return out[:, :h_out]


def _fri_fwd(feat, w1, b1, w2, b2, out_hw, sigmoid, max_depth):
    out = fused_resize_island(feat, w1, b1, w2, b2, out_hw, sigmoid,
                              max_depth)
    return out, (feat, w1, b1, w2, b2)


def _fri_bwd(out_hw, sigmoid, max_depth, res, g):
    feat, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _composite_reference(*a, out_hw, sigmoid, max_depth),
        feat, w1, b1, w2, b2)
    return vjp(g)


# A vjp-residual variant (composite forward under differentiation, so
# the island forward runs once instead of Pallas-fwd + full XLA
# recompute, ~8 ms/step) was tried 2026-08-20 and REVERTED: keeping the
# [N, 518, 518, C] resized feature + fp32 conv1 output live as saved
# activations (+~1.6 GB) stalls/OOMs the vitl b2t8 train step — the
# recompute backward is the memory-correct trade under remat pressure.
fused_resize_island.defvjp(_fri_fwd, _fri_bwd)


def fused_resize_island_enabled(c: int, o: int, feat=None,
                                out_hw=None) -> bool:
    import os
    if os.environ.get("VDN_DISABLE_FUSED_ISLAND"):
        return False
    if 128 % o != 0 or 128 // o < 2 or c % 128 != 0:
        return False
    if feat is not None and out_hw is not None:
        # the kernel holds the whole H-resized [hp, w_in, C] image in
        # VMEM per grid step (double-buffered): fits for the bf16
        # serving path at 518px (~40 MB x2) but OOMs the 128 MB VMEM
        # under fp32 compute (~80 MB x2) — fp32 callers (drift report,
        # --compute-dtype fp32) take the packed-island fallback
        hp = int(out_hw[0]) + 2
        window = 2 * hp * feat.shape[-2] * c * feat.dtype.itemsize
        if window > 110 * 1024 * 1024:
            return False
    from vdn.ops.attention import _on_tpu
    return _on_tpu()
