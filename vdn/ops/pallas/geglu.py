"""Pallas fused LayerNorm -> GEGLU feed-forward -> residual (TPU).

The motion-module FF tail ``x + net_2(hidden * gelu(gate))`` with
``(hidden, gate) = split(net_0(LN(x)))`` (reference
motion_module/attention.py FeedForward/GEGLU) hits the same XLA
pathology the encoder MLP did: the net_2 matmul fusion absorbs the
exact-erf GEGLU producer AND the following proj_out dot, re-evaluating
erf for every output column tile — the fused op ran at ~47% of its dot
FLOPs (4.95 ms vs 2.33 ms floor for the C=1024 mixer, trace 2026-08-18).

Same design as vdn/ops/pallas/mlp.py: row blocks streamed through VMEM,
weights resident, the inner dim chunked so chunk j's GELU (VPU) overlaps
chunk j+1's net_0 dot (MXU), GELU evaluated exactly once.  Backward is
the remat-style recompute of the plain jnp tail (custom_vjp).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.mlp import _dgelu_f32, _gelu_exact_f32, _gelu_f32

_BLOCK_ROWS = int(_os.environ.get("VDN_GEGLU_BLOCK_ROWS", "256"))
_F_CHUNKS = int(_os.environ.get("VDN_GEGLU_F_CHUNKS", "4"))


def _geglu_kernel(x_ref, ls_ref, lb_ref, w0_ref, b0_ref, w2_ref, b2_ref,
                  o_ref, *, eps: float, f_chunks: int):
    x = x_ref[:]                                     # [bn, C] compute dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * ls_ref[:].astype(jnp.float32) + lb_ref[:].astype(jnp.float32)
    y = y.astype(x.dtype)

    f = w2_ref.shape[0]                              # inner dim
    fc = f // f_chunks
    o = None
    for j in range(f_chunks):
        sl = slice(j * fc, (j + 1) * fc)
        slg = slice(f + j * fc, f + (j + 1) * fc)    # gate columns
        hid = jax.lax.dot_general(
            y, w0_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hid = (hid.astype(x.dtype) + b0_ref[:, sl].astype(x.dtype))
        gate = jax.lax.dot_general(
            y, w0_ref[:, slg], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        gate = (gate.astype(x.dtype)
                + b0_ref[:, slg].astype(x.dtype)).astype(jnp.float32)
        # bf16 compute uses the tanh-form GELU (see vdn/ops/pallas/mlp.py)
        h = (hid.astype(jnp.float32) * _gelu_f32(gate, x.dtype)).astype(
            x.dtype)
        pj = jax.lax.dot_general(
            h, w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [bn, C] fp32
        o = pj if o is None else o + pj
    o_ref[:] = x + o.astype(x.dtype) + b2_ref[:].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("eps",))
def _geglu_pallas(x2d, ln_scale, ln_bias, w0, b0, w2, b2, eps: float):
    n, c = x2d.shape
    f = w2.shape[0]
    dt = x2d.dtype
    w0, w2 = w0.astype(dt), w2.astype(dt)
    bn = min(n, _BLOCK_ROWS)
    grid = (pl.cdiv(n, bn),)
    f_chunks = _F_CHUNKS if f % _F_CHUNKS == 0 else 1
    row = lambda a: a.reshape(1, -1)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, eps=eps, f_chunks=f_chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((c, 2 * f), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * f), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * c * f,
            bytes_accessed=(2 * n * c + 3 * c * f) * dt.itemsize,
            transcendentals=n * f),
    )(x2d, row(ln_scale), row(ln_bias), w0, row(b0), w2, row(b2))


def _reference_tail(x2d, ln_scale, ln_bias, w0, b0, w2, b2, eps: float):
    """Unfused jnp equivalent (VJP recompute target + CPU fallback);
    mirrors LayerNorm -> GEGLU -> Linear from vdn.nn.motion."""
    dt = x2d.dtype
    xf = x2d.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), -1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_scale.astype(jnp.float32)
         + ln_bias.astype(jnp.float32)).astype(dt)
    g = jnp.matmul(y, w0.astype(dt)) + b0.astype(dt)
    f = w2.shape[0]
    hid, gate = g[:, :f], g[:, f:]
    h = (hid.astype(jnp.float32)
         * _gelu_exact_f32(gate.astype(jnp.float32))).astype(dt)
    o = jnp.matmul(h, w2.astype(dt)) + b2.astype(dt)
    return x2d + o


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_ln_geglu_residual(x, ln_scale, ln_bias, w0, b0, w2, b2,
                            eps: float = 1e-6):
    """x [..., C] -> x + net_2(GEGLU(net_0(LN(x)))), fused on TPU."""
    shape = x.shape
    out = _geglu_pallas(x.reshape(-1, shape[-1]), ln_scale, ln_bias,
                        w0, b0, w2, b2, eps)
    return out.reshape(shape)


def _fwd(x, ln_scale, ln_bias, w0, b0, w2, b2, eps):
    out = fused_ln_geglu_residual(x, ln_scale, ln_bias, w0, b0, w2, b2, eps)
    return out, (x, ln_scale, ln_bias, w0, b0, w2, b2)


def _bwd(eps, res, g):
    # Hand-written VJP, same rationale as vdn/ops/pallas/mlp.py::_bwd:
    # under jax.vjp(_reference_tail) XLA re-fused the exact-GELU
    # recompute into every grad matmul's output tiling; here the LN
    # output, gelu(gate) product and the dg0 cotangent materialize once
    # behind optimization_barrier.  Math tracks autodiff of
    # _reference_tail dtype-for-dtype (tests/test_geglu_kernel.py).
    x, ln_scale, ln_bias, w0, b0, w2, b2 = res
    shape = x.shape
    c = shape[-1]
    dt = x.dtype
    f32 = jnp.float32
    x2 = x.reshape(-1, c)
    g2 = g.reshape(-1, c)
    w0_dt, w2_dt = w0.astype(dt), w2.astype(dt)
    f = w2.shape[0]

    # --- forward recompute (each stage materialized once) ---
    xf = x2.astype(f32)
    mean = xf.mean(-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(jnp.square(xc), -1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = xc * inv                                          # [n, c] f32
    y = (xh * ln_scale.astype(f32)
         + ln_bias.astype(f32)).astype(dt)
    y = jax.lax.optimization_barrier(y)
    g0 = jnp.matmul(y, w0_dt) + b0.astype(dt)              # [n, 2f]
    hid, gate = g0[:, :f], g0[:, f:]
    hid_f = hid.astype(f32)
    gate_f = gate.astype(f32)
    # matches the forward kernel's gelu flavor (fast tanh form on bf16)
    ge, dge = _dgelu_f32(gate_f, dt)
    h = jax.lax.optimization_barrier((hid_f * ge).astype(dt))
    # (no fc2-forward recompute needed: with no layer scale there is no
    # dgamma, and nothing else consumes o)

    # --- backward ---
    db2 = jnp.sum(g2, axis=0).astype(b2.dtype)
    dw2 = jnp.matmul(h.T, g2).astype(w2.dtype)
    dh = jnp.matmul(g2, w2_dt.T).astype(f32)
    dhid = (dh * ge).astype(dt)
    # gelu'(z): multiply-then-round order matches autodiff of
    # _reference_tail (exact erf flavor; tanh-form derivative on bf16)
    dgate = (dh * hid_f * dge).astype(dt)
    dg0 = jax.lax.optimization_barrier(
        jnp.concatenate([dhid, dgate], axis=1))
    db0 = jnp.sum(dg0, axis=0).astype(b0.dtype)
    dw0 = jnp.matmul(y.T, dg0).astype(w0.dtype)
    dy = jnp.matmul(dg0, w0_dt.T)

    dyf = dy.astype(f32)
    dls = jnp.sum(dyf * xh, axis=0).astype(ln_scale.dtype)
    dlb = jnp.sum(dyf, axis=0).astype(ln_bias.dtype)
    dxh = dyf * ln_scale.astype(f32)
    dxc = dxh * inv
    dvar = jnp.sum(dxh * xc, -1, keepdims=True) * (-0.5) * inv * inv * inv
    dxc = dxc + (2.0 / c) * xc * dvar
    dxf = dxc - jnp.mean(dxc, -1, keepdims=True)
    dx = (g2 + dxf.astype(dt)).reshape(shape)
    return dx, dls, dlb, dw0, db0, dw2, db2


fused_ln_geglu_residual.defvjp(_fwd, _bwd)


def fused_geglu_enabled() -> bool:
    if _os.environ.get("VDN_DISABLE_FUSED_GEGLU"):
        return False
    from vdn.ops.attention import _on_tpu
    return _on_tpu()
