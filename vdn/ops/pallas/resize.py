"""Pallas TPU kernel for 1-D interpolation along the middle axis of [N, R, M].

Round-1 profiling showed XLA lowering the `jnp.take`-based torch-exact
resize (vdn/ops/resize.py) to serialized `while` loops of row-wise
dynamic-update-slices — ~22% of the clip window's device time at 518px.

This kernel recasts each separable-resize axis as a dense matmul on rows:

    out[n, o, m] = sum_r W[o, r] * x[n, r, m]

where W is the (mostly-banded, trace-time numpy) interpolation matrix.
The full [BN, R_in, M] row block rides the Pallas pipeline and is fetched
from HBM exactly once per image (its block index only changes with n, so
it is reused across all output tiles); each grid step applies one
[TILE_OUT, R_in] weight slab on the MXU.  Works for bilinear / bicubic /
nearest, any tap count, both spatial axes (H: M = W*C, W: M = C), and any
R_in that fits VMEM — no dynamic slicing, so no Mosaic alignment limits.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_TILE_OUT = 128  # output rows per grid step


def _dense_weights(idx: np.ndarray, w: np.ndarray, in_size: int,
                   tile_out: int) -> np.ndarray:
    """[n_tiles, tile_out, in_size] dense per-tile interpolation slabs."""
    out_size = idx.shape[0]
    n_tiles = -(-out_size // tile_out)
    weights = np.zeros((n_tiles, tile_out, in_size), np.float32)
    o = np.arange(out_size)
    for tap in range(idx.shape[1]):
        np.add.at(weights, (o // tile_out, o % tile_out, idx[:, tap]),
                  w[:, tap])
    return weights


def _resize_kernel(w_ref, x_ref, o_ref, *, bn: int):
    w = w_ref[0].astype(x_ref.dtype)  # [TH, R_in]
    # fp32 inputs need HIGHEST or the MXU rounds through bf16 (~1e-3 err)
    prec = (jax.lax.Precision.HIGHEST
            if x_ref.dtype == jnp.float32 else None)
    for i in range(bn):
        o_ref[i] = jax.lax.dot_general(
            w, x_ref[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec).astype(o_ref.dtype)


# VMEM budget for the pipelined blocks (double-buffered by Pallas)
_VMEM_BUDGET = 48 * 1024 * 1024


def _pick_blocks(n: int, r_in: int, m: int, th: int, itemsize: int):
    """(bn, mc): images per step and M-chunk, sized to the VMEM budget.
    bn need not divide n — the grid ceil-divides and Pallas drops
    out-of-bounds rows (each n row is independent)."""
    def fits(bn, mc):
        return 2 * (bn * r_in * mc + bn * th * mc
                    + th * r_in) * itemsize <= _VMEM_BUDGET

    if m < 128:
        # sub-lane-width M (the K/V ring gather at dh=32 packs 2*dh=64
        # lanes): one under-utilized chunk — still worlds better than
        # XLA's serialized-loop lowering of the one-hot einsum
        mc = m
    else:
        lanes = m // 128
        mc = 128
        for d in range(lanes, 0, -1):  # largest divisor <= 4096 that fits
            if lanes % d == 0 and 128 * d <= 4096 and fits(1, 128 * d):
                mc = 128 * d
                break
    bn = 1
    while bn * 2 <= 8 and bn * 2 <= n and fits(bn * 2, mc):
        bn *= 2
    return bn, mc


@functools.partial(jax.jit, static_argnames=("out_size", "plan_key"))
def _resize_mid_axis_impl(x, weights, out_size: int, plan_key):
    n, r_in, m = x.shape
    n_tiles, th, _ = weights.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    bn, mc = _pick_blocks(n, r_in, m, th, itemsize)

    # grid order (n, m-chunks, tiles): the x block index is constant over
    # the innermost tile axis, so each image chunk is DMA'd once.
    grid = (pl.cdiv(n, bn), m // mc, n_tiles)
    kernel = functools.partial(_resize_kernel, bn=bn)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, r_in), lambda i, j, t: (t, 0, 0)),
            pl.BlockSpec((bn, r_in, mc), lambda i, j, t: (i, 0, j)),
        ],
        out_specs=pl.BlockSpec((bn, th, mc), lambda i, j, t: (i, t, j)),
        out_shape=jax.ShapeDtypeStruct((n, out_size, m), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n_tiles * th * r_in * m,
            bytes_accessed=(n * r_in * m + n * out_size * m) * itemsize,
            transcendentals=0),
    )(weights.astype(x.dtype), x)


def resize_mid_axis(x: jnp.ndarray, idx: np.ndarray, w: np.ndarray,
                    out_size: int) -> jnp.ndarray:
    """x [N, R_in, M] -> [N, out_size, M] with out[.,o,.] = sum_t
    w[o,t] * x[., idx[o,t], .]."""
    weights = _dense_weights(np.asarray(idx), np.asarray(w), x.shape[1],
                             min(_TILE_OUT, out_size))
    # plan_key makes the jit cache key reflect the (static) plan contents
    plan_key = (x.shape[1], out_size, weights.shape[0],
                hash(weights.tobytes()) & 0xFFFFFFFF)
    return _resize_mid_axis_impl(x, jnp.asarray(weights), out_size,
                                 plan_key)


def _rows_kernel(x_ref, o_ref, *, plan):
    """Static-unrolled tap blend over the OUTER row dim.

    x block [1, R_in, TW, C]; rows live on an untiled dim, so x_ref[0, i]
    is a VMEM address offset — no relayout, unlike putting R on sublanes
    for a matmul.  ``plan`` is a trace-time tuple of (row -> ((idx, w),
    ...)) entries baked in as immediates."""
    for o, taps in enumerate(plan):
        (i0, w0), *rest = taps
        acc = x_ref[0, i0].astype(jnp.float32) * w0
        for i, w in rest:
            acc += x_ref[0, i].astype(jnp.float32) * w
        o_ref[0, o] = acc.astype(o_ref.dtype)


# compile-time guard: the kernel body unrolls out_size * taps statements
_ROWS_MAX_OUT = 1024


@functools.partial(jax.jit, static_argnames=("out_size", "plan"))
def _resize_rows_impl(x, out_size: int, plan):
    n, r_in, wdim, c = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    # chunk W so the [R_in, TW, C] input block (+ the output block,
    # double-buffered) fits the VMEM budget
    # tw (2nd-to-last block dim) must be a multiple of 8 or the full W
    tw = wdim
    while tw > 8 and 2 * (r_in + out_size) * tw * c * itemsize \
            > _VMEM_BUDGET:
        tw = -(-tw // 16) * 8
    grid = (n, pl.cdiv(wdim, tw))
    return pl.pallas_call(
        functools.partial(_rows_kernel, plan=plan),
        grid=grid,
        in_specs=[pl.BlockSpec((1, r_in, tw, c), lambda i, j: (i, 0, j, 0))],
        out_specs=pl.BlockSpec((1, out_size, tw, c),
                               lambda i, j: (i, 0, j, 0)),
        out_shape=jax.ShapeDtypeStruct((n, out_size, wdim, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * out_size * wdim * c * max(
                len(t) for t in plan),
            bytes_accessed=(n * r_in + n * out_size) * wdim * c * itemsize,
            transcendentals=0),
    )(x)


def resize_rows(x: jnp.ndarray, idx: np.ndarray, w: np.ndarray,
                out_size: int) -> jnp.ndarray:
    """x [N, R_in, W, C] -> [N, out_size, W, C]: per-row tap blend on the
    H (outer) axis, keeping NHWC layout so neither pass of a separable
    resize needs the ~6 ms/window inter-pass relayout the flattened
    [N, R, M] matmul kernel forces (trace 2026-08-17: reshape.307)."""
    idx = np.asarray(idx)
    w = np.asarray(w)
    plan = []
    for o in range(out_size):
        taps = {}
        for t in range(idx.shape[1]):
            if w[o, t] != 0.0:
                i = int(idx[o, t])
                taps[i] = taps.get(i, 0.0) + float(w[o, t])
        if not taps:  # degenerate all-zero row (clipped border)
            taps = {int(idx[o, 0]): 0.0}
        plan.append(tuple(sorted(taps.items())))
    return _resize_rows_impl(x, out_size, tuple(plan))


def supports_rows(x_shape: Tuple[int, ...], axis: int, idx: np.ndarray,
                  out_size: int, dtype) -> bool:
    """Whether resize_rows handles this (H-axis, NHWC) resize."""
    if len(x_shape) < 3 or axis != len(x_shape) - 3:
        return False
    if out_size > _ROWS_MAX_OUT or idx.shape[1] > 4:
        return False
    wdim, c = x_shape[-2], x_shape[-1]
    if c % 128 != 0 or wdim < 8:
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # smallest chunk (tw=8) must fit
    return 2 * (x_shape[axis] + out_size) * 8 * c * itemsize <= _VMEM_BUDGET


def select_rows(x: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """x [N, R, M] x (traced) weights [S, R] -> [N, S, M].

    Row mixing with runtime weights — used for the streaming KV-cache
    window gather, where XLA lowers both take() and the one-hot einsum to
    serialized loops (~27 ms/frame at vitl-518; this kernel is
    bandwidth-bound ~1 ms).  Same kernel as the resize, with the weight
    slab a runtime input."""
    n, r, m = x.shape
    s = weights.shape[0]
    return _resize_mid_axis_impl(x, weights[None].astype(x.dtype), s,
                                 ("select_rows", n, r, m, s))


def supports(x_shape: Tuple[int, ...], axis: int, idx: np.ndarray,
             dtype) -> bool:
    """Whether the Pallas path handles this resize efficiently/at all."""
    if len(x_shape) < 3 or axis < 1:
        return False
    m = int(np.prod(x_shape[axis + 1:], dtype=np.int64))
    n = int(np.prod(x_shape[:axis], dtype=np.int64))
    if n == 0 or m < 128 or m % 128 != 0:
        return False
    in_size = x_shape[axis]
    # smallest possible config must fit the VMEM budget
    itemsize = jnp.dtype(dtype).itemsize
    return 2 * (in_size * 128 + 8 * 128 + 8 * in_size) * itemsize \
        <= _VMEM_BUDGET
