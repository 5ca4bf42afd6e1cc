"""Pallas fused LayerNorm -> MLP -> LayerScale -> residual (TPU).

The ViT block tail ``x + ls2 * fc2(gelu(fc1(LN(x))))`` is the encoder's
second hot region after attention.  Under plain XLA the fc2 matmul fusion
absorbs the exact-GELU producer and the *next* LayerNorm's reduction as
epilogues (HLO: convert_reduce_fusion), re-evaluating erf for every output
column tile — the fc2 step ran at ~36% of the fc1 step's MXU rate
(5.15 ms vs 1.87 ms per vitl 32-frame window layer, trace 2026-08-16).

This kernel streams row blocks of x through VMEM and does the whole tail in
one pass: LN statistics on the VPU, both matmuls on the MXU with W1/W2
resident in VMEM, GELU evaluated exactly once, residual added in-register.
HBM traffic is one read + one write of x (plus the weights once).

Numerics match the unfused path: LN in fp32 (vdn.nn.layers.LayerNorm),
matmuls accumulate fp32 and round to the compute dtype between stages,
GELU exact (erf) in fp32.

Differentiable via custom_vjp: the backward is a hand-written VJP that
recomputes the intermediates (remat-style) with each expensive stage
(LN output, gelu, gelu') materialized once behind optimization_barrier
— without the barriers XLA re-fuses the erf chain into every grad
matmul's output tiling.  Only the forward is a Pallas kernel.

Reference equivalence: DINOv2 Block.forward ffn residual
(reference depth_anything_v2/dinov2_layers/block.py:84-111, mlp.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of x per grid step.  256 won the in-model slope-timed sweep at the
# vitl window shape (72.9 vs 69.7 fps for 512; 128/512/768/1024 all lose
# — small blocks pipeline the x DMA against the MXU better while W1/W2
# stay resident).  Env knobs (VDN_MLP_BLOCK_ROWS / VDN_MLP_F_CHUNKS) for
# tuning sweeps: tools/tune_kernels.sh; tune IN-MODEL only — isolated
# microbenches disagree with in-model ordering on this rig.
import os as _os
# 344 = ceil(1370/4) rounded to sublanes: 4 blocks tile a 1370-token
# frame with 0.4% pad on the frame-major 3D grid (in-model sweep
# 2026-08-20: 344/344 -> 644.0 ms/step vs 256/256 657.5, 280/280
# 645.0, 456 fwd 663.7, 464/688 bwd 656.8/658.8)
_BLOCK_ROWS = int(_os.environ.get("VDN_MLP_BLOCK_ROWS", "344"))
_F_CHUNKS = int(_os.environ.get("VDN_MLP_F_CHUNKS", "4"))


def _erf_f32(x):
    """fp32 erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf primitive; this rational+exp form uses only
    VPU-supported ops and its error is far below bf16 resolution.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x):
    # x * 0.5 * (1 + erf(x / sqrt(2))) in fp32, matching
    # jax.nn.gelu(approximate=False) to ~1.5e-7
    return x * 0.5 * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


# bf16 compute paths use the tanh-form GELU: max abs error vs exact is
# 4.7e-4 (the bf16 ROUNDING of exact gelu is 0.031 — 66x larger), and
# the derivative reuses the tanh (sech^2 = 1 - tanh^2), so the backward
# needs ONE transcendental chain instead of erf + exp.  VDN_EXACT_GELU=1
# forces the erf form everywhere (A/B + paranoia knob); fp32 compute
# always uses exact erf so the CPU-mesh parity suites are untouched.
_EXACT_GELU = _os.environ.get("VDN_EXACT_GELU", "0") != "0"
_GELU_A = math.sqrt(2.0 / math.pi)
_GELU_B = 0.044715


def _use_fast_gelu(dt) -> bool:
    return not _EXACT_GELU and dt == jnp.bfloat16


def _tanh_u_f32(x):
    # tanh(a * (x + b x^3)) via exp2: one transcendental + one reciprocal
    u = _GELU_A * (x + _GELU_B * x * x * x)
    # tanh(u) = 1 - 2 / (exp2(2u * log2e) + 1)
    e = jnp.exp2(u * (2.0 * 1.4426950408889634))
    return 1.0 - 2.0 / (e + 1.0)


def _gelu_fast_f32(x):
    return 0.5 * x * (1.0 + _tanh_u_f32(x))


def _gelu_f32(x, dt):
    return _gelu_fast_f32(x) if _use_fast_gelu(dt) else _gelu_exact_f32(x)


def _dgelu_f32(x, dt):
    """gelu'(x) in fp32 (and gelu(x) as a byproduct: returns (gelu, dgelu))."""
    if _use_fast_gelu(dt):
        th = _tanh_u_f32(x)
        g = 0.5 * x * (1.0 + th)
        dg = 0.5 * (1.0 + th) \
            + 0.5 * x * (1.0 - th * th) * _GELU_A \
            * (1.0 + 3.0 * _GELU_B * x * x)
        return g, dg
    phi = jnp.exp(-0.5 * x * x) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + _erf_f32(x * (2.0 ** -0.5)))
    return x * cdf, cdf + x * phi


def _ln_mlp_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   g_ref, o_ref, *, eps: float, f_chunks: int):
    x = x_ref[:]                                     # [bn, C] compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[:].astype(jnp.float32) + lb_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)

    # chunk the hidden dim: chunk j's GELU (VPU) has no dependency on
    # chunk j+1's fc1 dot (MXU), so Mosaic can overlap the two units —
    # a monolithic dot1 -> gelu -> dot2 chain serializes them
    f = w1_ref.shape[1]
    fc = f // f_chunks
    o = None
    for j in range(f_chunks):
        sl = slice(j * fc, (j + 1) * fc)
        h = jax.lax.dot_general(
            y, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bn, fc] fp32
        # round to compute dtype between stages like the unfused path
        h = (h.astype(x.dtype)
             + b1_ref[:, sl].astype(x.dtype)).astype(jnp.float32)
        h = _gelu_f32(h, x.dtype).astype(x.dtype)
        pj = jax.lax.dot_general(
            h, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bn, C] fp32
        o = pj if o is None else o + pj
    o = o.astype(x.dtype) + b2_ref[:].astype(x.dtype)
    o_ref[:] = x + o * g_ref[:].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _ln_mlp_pallas(x2d, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                   eps: float):
    """2D [N, C] entry (tests / flat callers)."""
    n, c = x2d.shape
    f = w1.shape[1]
    dt = x2d.dtype
    # weights ride VMEM in the compute dtype (half the DMA for bf16)
    w1, w2 = w1.astype(dt), w2.astype(dt)
    bn = min(n, _BLOCK_ROWS)
    grid = (pl.cdiv(n, bn),)
    f_chunks = _F_CHUNKS if f % _F_CHUNKS == 0 else 1
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, f_chunks=f_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x2d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # v5e defaults to a 16MB scoped-vmem budget; the resident
            # W1/W2 (bf16, 16 MB) + fp32 hidden block need more
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * c * f,
            bytes_accessed=(2 * n * c + 2 * c * f) * x2d.dtype.itemsize,
            transcendentals=n * f),
    )(x2d, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2), row(gamma))


@functools.partial(jax.jit, static_argnames=("eps",))
def _ln_mlp_pallas3(x3d, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                    eps: float):
    """3D-native [B, N, C] forward: grid (B, N-blocks), the leading dim
    squeezed out of each block (BlockSpec None dim), so the kernel body
    is the 2D one.  Exists because N=1370 is not sublane-aligned: the
    [B, N, C] <-> [B*N, C] reshapes around the 2D kernel are REAL
    relayout copies (~0.12-0.18 ms each, 6 per encoder layer in the
    b2t8 train trace 2026-08-20 — the same pathology the int8 kernels
    fixed with frame-major grids, vdn/ops/pallas/int8.py)."""
    b, n, c = x3d.shape
    f = w1.shape[1]
    dt = x3d.dtype
    w1, w2 = w1.astype(dt), w2.astype(dt)
    bn = min(n, _BLOCK_ROWS)
    grid = (b, pl.cdiv(n, bn))
    f_chunks = _F_CHUNKS if f % _F_CHUNKS == 0 else 1
    row = lambda a: a.reshape(1, -1)
    fixed = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps, f_chunks=f_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bn, c), lambda bi, i: (bi, i, 0)),
            fixed((1, c)), fixed((1, c)), fixed((c, f)), fixed((1, f)),
            fixed((f, c)), fixed((1, c)), fixed((1, c)),
        ],
        out_specs=pl.BlockSpec((None, bn, c), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * c * f,
            bytes_accessed=(2 * b * n * c + 2 * c * f) * dt.itemsize,
            transcendentals=b * n * f),
    )(x3d, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2),
      row(gamma))


_BWD_BLOCK_ROWS = int(_os.environ.get("VDN_MLP_BWD_BLOCK_ROWS", "344"))  # see _BLOCK_ROWS note


def _mlp_bwd_dx_kernel(x_ref, g_ref, ls_ref, lb_ref, w1_ref, w1t_ref,
                       b1_ref, w2t_ref, gam_ref,
                       dx_ref, y_ref, h_ref, dhp_ref, dls_ref, dlb_ref,
                       db1_ref, *, eps: float, f_chunks: int, n_total: int,
                       row_axis: int = 0):
    """One row block of the MLP-tail backward.

    Recomputes LN -> fc1 -> gelu in VMEM (remat), forms dh = go @ W2^T,
    dhpre = dh * gelu'(hpre), dy = dhpre @ W1^T and the LayerNorm
    backward, and emits everything the XLA-side dW dots still need
    (y, h, dhpre) plus the cross-row bias/scale reductions accumulated
    across the sequential grid.  This replaces three XLA dot fusions
    whose dual [n, f] outputs and erf epilogues ran at ~50-76% MXU in
    the train trace (fusion.68 / .911 / .2494, 4.0 ms/block vs the
    2.8 ms dense ideal).
    """
    # row_axis: which grid axis is the row-block axis (1 on the 3D
    # frame-major grid, 0 on the flat 2D grid); leading axes only join
    # the first-step predicate for the cross-block reductions
    i = pl.program_id(row_axis)
    first = i == 0
    for ax in range(row_axis):
        first = jnp.logical_and(first, pl.program_id(ax) == 0)
    f32 = jnp.float32
    x = x_ref[:]
    g2 = g_ref[:]
    dt = x.dtype
    bn, c = x.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0) + i * bn
    valid = rows < n_total                              # [bn, 1]

    # --- LN forward recompute (fp32 stats, exactly the fwd kernel) ---
    xf = x.astype(f32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(jnp.square(xc), axis=1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = xc * inv
    ls_f = ls_ref[:].astype(f32)
    y = (xh * ls_f + lb_ref[:].astype(f32)).astype(dt)
    y_ref[:] = y
    go = g2 * gam_ref[:].astype(dt)

    f = w1_ref.shape[1]
    fc = f // f_chunks
    dy = None
    for j in range(f_chunks):
        sl = slice(j * fc, (j + 1) * fc)
        hacc = jax.lax.dot_general(
            y, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        h_dt = hacc.astype(dt) + b1_ref[:, sl].astype(dt)
        hf = h_dt.astype(f32)
        gelu_h, dgelu_h = _dgelu_f32(hf, dt)
        h_ref[:, sl] = gelu_h.astype(dt)
        dh = jax.lax.dot_general(
            go, w2t_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        # round like the unfused path's bf16 dot output, then upcast
        dh = dh.astype(dt).astype(f32)
        dhp = (dh * dgelu_h).astype(dt)
        dhp_ref[:, sl] = dhp
        db1c = jnp.sum(jnp.where(valid, dhp.astype(f32), 0.0), axis=0,
                       keepdims=True)

        @pl.when(first)
        def _init():
            db1_ref[:, sl] = db1c

        @pl.when(jnp.logical_not(first))
        def _acc():
            db1_ref[:, sl] += db1c

        pj = jax.lax.dot_general(
            dhp, w1t_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        dy = pj if dy is None else dy + pj

    dyf = dy.astype(dt).astype(f32)                     # one bf16 round
    dyv = jnp.where(valid, dyf, 0.0)
    dls_p = jnp.sum(dyv * jnp.where(valid, xh, 0.0), axis=0, keepdims=True)
    dlb_p = jnp.sum(dyv, axis=0, keepdims=True)

    @pl.when(first)
    def _init_ln():
        dls_ref[:] = dls_p
        dlb_ref[:] = dlb_p

    @pl.when(jnp.logical_not(first))
    def _acc_ln():
        dls_ref[:] += dls_p
        dlb_ref[:] += dlb_p

    # LayerNorm backward (fp32, matching the unfused chain)
    dxh = dyf * ls_f
    dxc = dxh * inv
    dvar = jnp.sum(dxh * xc, axis=1, keepdims=True) * (-0.5) * inv * inv \
        * inv
    dxc = dxc + (2.0 / c) * xc * dvar
    dxf = dxc - jnp.mean(dxc, axis=1, keepdims=True)
    dx_ref[:] = g2 + dxf.astype(dt)


@functools.partial(jax.jit, static_argnames=("eps",))
def _mlp_bwd_dx_pallas(x2d, g2d, ln_scale, ln_bias, w1, b1, w2, gamma,
                       eps: float):
    """Fused backward-dx: returns (dx, y, h, dhpre, dls, dlb, db1)."""
    n, c = x2d.shape
    f = w1.shape[1]
    dt = x2d.dtype
    w1_dt = w1.astype(dt)
    w2_dt = w2.astype(dt)
    bn = min(n, _BWD_BLOCK_ROWS)
    grid = (pl.cdiv(n, bn),)
    f_chunks = _F_CHUNKS if f % _F_CHUNKS == 0 else 1
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(_mlp_bwd_dx_kernel, eps=eps,
                               f_chunks=f_chunks, n_total=n)
    fixed = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))
    rowblk = lambda width: pl.BlockSpec((bn, width), lambda i: (i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rowblk(c), rowblk(c), fixed((1, c)), fixed((1, c)),
            fixed((c, f)), fixed((f, c)), fixed((1, f)), fixed((c, f)),
            fixed((1, c)),
        ],
        out_specs=[
            rowblk(c), rowblk(c), rowblk(f), rowblk(f),
            fixed((1, c)), fixed((1, c)), fixed((1, f)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), dt),
            jax.ShapeDtypeStruct((n, c), dt),
            jax.ShapeDtypeStruct((n, f), dt),
            jax.ShapeDtypeStruct((n, f), dt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # sequential grid: the dls/dlb/db1 outputs accumulate across
            # row blocks
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * f,
            bytes_accessed=(3 * n * c + 2 * n * f + 3 * c * f)
            * x2d.dtype.itemsize,
            transcendentals=2 * n * f),
    )(x2d, g2d, row(ln_scale), row(ln_bias), w1_dt, w1_dt.T, row(b1),
      w2_dt.T, row(gamma))
    return outs


@functools.partial(jax.jit, static_argnames=("eps",))
def _mlp_bwd_dx_pallas3(x3d, g3d, ln_scale, ln_bias, w1, b1, w2, gamma,
                        eps: float):
    """3D-native [B, N, C] backward-dx (see _ln_mlp_pallas3 — avoids the
    tile-misaligned [B, N, C] <-> [B*N, C] relayout copies around the 2D
    kernel).  Returns (dx, y, h, dhpre, dls, dlb, db1) with the row
    tensors in [B, N, *] layout for the XLA-side multi-dim dW dots."""
    b, n, c = x3d.shape
    f = w1.shape[1]
    dt = x3d.dtype
    w1_dt = w1.astype(dt)
    w2_dt = w2.astype(dt)
    bn = min(n, _BWD_BLOCK_ROWS)
    grid = (b, pl.cdiv(n, bn))
    f_chunks = _F_CHUNKS if f % _F_CHUNKS == 0 else 1
    row = lambda a: a.reshape(1, -1)
    kernel = functools.partial(_mlp_bwd_dx_kernel, eps=eps,
                               f_chunks=f_chunks, n_total=n, row_axis=1)
    fixed = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0, 0))
    rowblk = lambda width: pl.BlockSpec((None, bn, width),
                                        lambda bi, i: (bi, i, 0))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            rowblk(c), rowblk(c), fixed((1, c)), fixed((1, c)),
            fixed((c, f)), fixed((f, c)), fixed((1, f)), fixed((c, f)),
            fixed((1, c)),
        ],
        out_specs=[
            rowblk(c), rowblk(c), rowblk(f), rowblk(f),
            fixed((1, c)), fixed((1, c)), fixed((1, f)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), dt),
            jax.ShapeDtypeStruct((b, n, c), dt),
            jax.ShapeDtypeStruct((b, n, f), dt),
            jax.ShapeDtypeStruct((b, n, f), dt),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # sequential grid: dls/dlb/db1 accumulate across all blocks
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * n * c * f,
            bytes_accessed=(3 * b * n * c + 2 * b * n * f + 3 * c * f)
            * dt.itemsize,
            transcendentals=2 * b * n * f),
    )(x3d, g3d, row(ln_scale), row(ln_bias), w1_dt, w1_dt.T, row(b1),
      w2_dt.T, row(gamma))
    return outs


def fused_mlp_bwd_enabled(rows: int) -> bool:
    """Pallas backward-dx kernel gate (TPU hot path only; the XLA
    hand-written VJP below remains the CPU / small-shape / reference
    path).  VDN_DISABLE_FUSED_MLP_BWD=1 forces the XLA path."""
    if _os.environ.get("VDN_DISABLE_FUSED_MLP_BWD"):
        return False
    from vdn.ops.attention import _on_tpu
    return rows >= 2048 and _on_tpu()


def fused_mlp_enabled(rows: int) -> bool:
    """Use the fused kernel on TPU for large token counts (the encoder
    hot path); small/CPU cases keep the reference jnp path.
    VDN_DISABLE_FUSED_MLP=1 forces the XLA path (for A/B sweeps)."""
    if _os.environ.get("VDN_DISABLE_FUSED_MLP"):
        return False
    from vdn.ops.attention import _on_tpu
    # VDN_MLP_MIN_ROWS: A/B knob for the small-batch cutoff.  Default
    # 1024: the single-image memory-bank step (rows=1369, previously
    # under the 2048 cutoff on the XLA path) slope-timed 21.28 -> 20.55
    # ms/frame at vitl@518 with the kernels on (2026-08-21).
    return rows >= int(_os.environ.get("VDN_MLP_MIN_ROWS", "1024")) \
        and _on_tpu()


def _reference_tail(x2d, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                    eps: float):
    """The unfused jnp equivalent (used by the VJP and as CPU fallback)."""
    dt = x2d.dtype
    xf = x2d.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(dt)
    h = jnp.matmul(y, w1.astype(dt)) + b1.astype(dt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(dt)
    o = jnp.matmul(h, w2.astype(dt)) + b2.astype(dt)
    return x2d + o * gamma.astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_ln_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                          eps: float = 1e-6):
    """x [..., C] -> x + gamma * fc2(gelu(fc1(LN(x)))), fused on TPU.

    3D+ inputs run the frame-major 3D grid (no [B, N, C] <-> [B*N, C]
    relayout — N=1370 is not sublane-aligned, so those reshapes are
    real copies); 2D inputs keep the flat grid."""
    shape = x.shape
    if x.ndim >= 3:
        out = _ln_mlp_pallas3(x.reshape(-1, shape[-2], shape[-1]),
                              ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                              eps)
    else:
        out = _ln_mlp_pallas(x.reshape(-1, shape[-1]), ln_scale, ln_bias,
                             w1, b1, w2, b2, gamma, eps)
    return out.reshape(shape)


def _fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps):
    out = fused_ln_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2,
                                gamma, eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _bwd(eps, res, g):
    # Hand-written VJP with remat-style recompute.  The earlier
    # jax.vjp(_reference_tail) backward let XLA fuse the exact-GELU
    # recompute INTO the grad matmuls: each per-block backward fusion
    # re-evaluated the 54-op erf chain on the [N, F] hidden per output
    # tile (the same epilogue pathology the forward kernel exists to
    # avoid — confirmed in the optimized train-step HLO: 24 conv fusions
    # each embedding the full erfc series, 2 full-size exp ops per
    # block).  Here every expensive intermediate (LN output, gelu(h),
    # gelu'(h)) is materialized exactly once behind an
    # optimization_barrier, so the six backward matmuls run as clean
    # MXU convs.  Math identical to jax.vjp of _reference_tail
    # (dtype-for-dtype, including the bf16 rounding of dW under a bf16
    # compute dtype); regression-tested against it in
    # tests/test_fused_mlp.py.
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma = res
    shape = x.shape
    c = shape[-1]
    dt = x.dtype
    f32 = jnp.float32
    x2 = x.reshape(-1, c)
    g2 = g.reshape(-1, c)
    if fused_mlp_bwd_enabled(x2.shape[0]):
        return _bwd_via_kernel(eps, res, g)
    w1_dt, w2_dt = w1.astype(dt), w2.astype(dt)

    # --- forward recompute (each stage materialized once) ---
    xf = x2.astype(f32)
    mean = xf.mean(-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(jnp.square(xc), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = xc * inv                                          # [n, c] f32
    y = (xh * ln_scale.astype(f32)
         + ln_bias.astype(f32)).astype(dt)                 # LN out, bf16
    y = jax.lax.optimization_barrier(y)
    hpre = jnp.matmul(y, w1_dt) + b1.astype(dt)
    hf = hpre.astype(f32)
    h = jax.lax.optimization_barrier(
        jax.nn.gelu(hf, approximate=False).astype(dt))

    # --- backward ---
    # dgamma = sum_n g2 * o needs the fc2 output o — recomputing it is a
    # full [n,f]x[f,c] matmul whose only consumer is a [c] vector (0.98
    # ms/block in the vitl train trace).  Reassociate instead: with
    # S = h^T @ g2 (needed anyway: dW2 = S * gamma column-scaled) and
    # t = colsum(g2),   dgamma = colsum_f(W2 * S) + b2 * t   exactly
    # (o = h@W2 + b2 substituted and the n/f sums swapped) — the fc2
    # recompute disappears and dW2's operand go is replaced by g2.
    go = g2 * gamma.astype(dt)
    gam_f = gamma.astype(f32)
    t = jnp.sum(g2.astype(f32), axis=0)
    s_mat = jnp.matmul(h.T, g2).astype(f32)                # [f, c]
    dw2 = (s_mat * gam_f).astype(w2.dtype)
    dgamma = (jnp.sum(w2.astype(f32) * s_mat, axis=0)
              + b2.astype(f32) * t).astype(gamma.dtype)
    db2 = (gam_f * t).astype(b2.dtype)
    dh = jnp.matmul(go, w2_dt.T)
    # gelu'(z) = Phi(z) + z * phi(z); the f32 multiply-then-round order
    # matches autodiff of _reference_tail exactly.  The barrier on dhpre
    # materializes the whole erf/exp chain once — its three matmul
    # consumers read the bf16 result instead of re-deriving it per tile.
    phi = jnp.exp(-0.5 * hf * hf) * (1.0 / math.sqrt(2.0 * math.pi))
    cdf = 0.5 * (1.0 + jax.lax.erf(hf * (2.0 ** -0.5)))
    dhpre = jax.lax.optimization_barrier(
        (dh.astype(f32) * (cdf + hf * phi)).astype(dt))
    db1 = jnp.sum(dhpre, axis=0).astype(b1.dtype)
    dw1 = jnp.matmul(y.T, dhpre).astype(w1.dtype)
    dy = jnp.matmul(dhpre, w1_dt.T)

    # LayerNorm backward (f32, matching autodiff of the explicit chain)
    dyf = dy.astype(f32)
    dls = jnp.sum(dyf * xh, axis=0).astype(ln_scale.dtype)
    dlb = jnp.sum(dyf, axis=0).astype(ln_bias.dtype)
    dxh = dyf * ln_scale.astype(f32)
    dxc = dxh * inv
    dvar = jnp.sum(dxh * xc, -1, keepdims=True) * (-0.5) * inv * inv * inv
    dxc = dxc + (2.0 / c) * xc * dvar
    dxf = dxc - jnp.mean(dxc, -1, keepdims=True)
    dx = (g2 + dxf.astype(dt)).reshape(shape)
    return dx, dls, dlb, dw1, db1, dw2, db2, dgamma


def _bwd_via_kernel(eps, res, g):
    """Kernel-path backward: _mlp_bwd_dx_pallas for dx/y/h/dhpre and the
    LN/bias reductions, XLA dots only for dW1/dW2 (+ the reassociated
    dgamma — see the note in the XLA path).  3D+ inputs keep the
    frame-major layout end-to-end: the kernel runs the 3D grid and the
    dW dots contract over BOTH leading dims (dot_general handles the
    multi-dim contraction without a materialized reshape — the 2D path's
    [B, N, *] <-> [B*N, *] reshapes are real relayout copies)."""
    x, ln_scale, ln_bias, w1, b1, w2, b2, gamma = res
    shape = x.shape
    c = shape[-1]
    f32 = jnp.float32
    if x.ndim >= 3:
        x3 = x.reshape(-1, shape[-2], c)
        g3 = g.reshape(-1, shape[-2], c)
        dx3, y, h, dhpre, dls, dlb, db1 = _mlp_bwd_dx_pallas3(
            x3, g3, ln_scale, ln_bias, w1, b1, w2, gamma, eps)
        cdims = ((0, 1), (0, 1))
        dotT = lambda a, b_: jax.lax.dot_general(  # a^T @ b over (B, N)
            a, b_, (cdims, ((), ())))
        t = jnp.sum(g3.astype(f32), axis=(0, 1))
        s_mat = dotT(h, g3).astype(f32)                    # [f, c]
        dw1 = dotT(y, dhpre).astype(w1.dtype)              # [c, f]
        dx_out = dx3.reshape(shape)
    else:
        x2 = x.reshape(-1, c)
        g2 = g.reshape(-1, c)
        dx2, y, h, dhpre, dls, dlb, db1 = _mlp_bwd_dx_pallas(
            x2, g2, ln_scale, ln_bias, w1, b1, w2, gamma, eps)
        t = jnp.sum(g2.astype(f32), axis=0)
        s_mat = jnp.matmul(h.T, g2).astype(f32)            # [f, c]
        dw1 = jnp.matmul(y.T, dhpre).astype(w1.dtype)
        dx_out = dx2.reshape(shape)
    gam_f = gamma.astype(f32)
    dw2 = (s_mat * gam_f).astype(w2.dtype)
    dgamma = (jnp.sum(w2.astype(f32) * s_mat, axis=0)
              + b2.astype(f32) * t).astype(gamma.dtype)
    db2 = (gam_f * t).astype(b2.dtype)
    return (dx_out,
            dls.reshape(-1).astype(ln_scale.dtype),
            dlb.reshape(-1).astype(ln_bias.dtype),
            dw1, db1.reshape(-1).astype(b1.dtype), dw2, db2, dgamma)


fused_ln_mlp_residual.defvjp(_fwd, _bwd)
