"""Does XLA lower int8 convolutions to the int8 MXU path on this chip?

Slope-times a 3x3 conv at a DPT-refinenet-like shape in bf16 vs
int8xint8->int32 (see bench.py for the tunnel-proof methodology: K
iterations chained inside one lax.while_loop, two-point slope).  If the
int8 conv runs ~2x the bf16 one, quantizing the DPT head conv stack is
worth building; if XLA falls back to an upcast, it isn't.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [
    # (B*T, H, W, Cin, Cout) — the actual vitl@518 DPT-head conv shapes
    (32, 296, 296, 256, 128),   # output_conv1
    (32, 148, 148, 256, 256),   # layer1_rn / refinenet1 RCU convs
    (32, 74, 74, 256, 256),     # refinenet2 RCU convs
    (32, 37, 37, 256, 256),     # refinenet3 RCU convs
]
K_SMALL, K_LARGE, REPS = 2, 10, 4


def slope(run, *args):
    def best(k):
        t = float("inf")
        for _ in range(REPS):
            s = time.perf_counter()
            float(run(*args, jnp.int32(k)))
            t = min(t, time.perf_counter() - s)
        return t

    float(run(*args, jnp.int32(1)))  # compile
    return (best(K_LARGE) - best(K_SMALL)) / (K_LARGE - K_SMALL)


def conv(x, w, dtype):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype)


def make_bf16(shape):
    b, h, w_, cin, cout = shape
    x0 = jax.random.normal(jax.random.PRNGKey(0), (b, h, w_, cin),
                           jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.bfloat16) * 0.05

    @jax.jit
    def run(x, w, k):
        def body(c_):
            i, x, acc = c_
            y = conv(x, w, None)
            bump = jnp.tanh(jnp.mean(y).astype(jnp.float32)) * 1e-3
            extra = jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True)
            x = (x.astype(jnp.float32) * (1.0 + bump)
                 + 1e-3 * extra).astype(x.dtype)
            return i + 1, x, acc + bump

        _, _, acc = jax.lax.while_loop(lambda c_: c_[0] < k, body,
                                       (jnp.int32(0), x, jnp.float32(0.0)))
        return acc

    return run, (x0, w)


def make_int8_chain(shape):
    """The REAL serving chain: bf16 input -> per-frame quantize ->
    int8 conv -> dequant to bf16 (vdn/ops/int8_conv.py)."""
    from vdn.ops.int8_conv import int8_conv
    b, h, w_, cin, cout = shape
    x0 = jax.random.normal(jax.random.PRNGKey(0), (b, h, w_, cin),
                           jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                          jnp.float32) * 0.05

    @jax.jit
    def run(x, w, k):
        def body(c_):
            i, x, acc = c_
            y = int8_conv(x, w, (1, 1), [(1, 1), (1, 1)])
            bump = jnp.tanh(jnp.mean(y).astype(jnp.float32)) * 1e-3
            extra = jnp.mean(y.astype(jnp.float32), axis=-1, keepdims=True)
            x = (x.astype(jnp.float32) * (1.0 + bump)
                 + 1e-3 * extra).astype(x.dtype)
            return i + 1, x, acc + bump

        _, _, acc = jax.lax.while_loop(lambda c_: c_[0] < k, body,
                                       (jnp.int32(0), x, jnp.float32(0.0)))
        return acc

    return run, (x0, w)


def main():
    for shape in SHAPES:
        run_bf, args_bf = make_bf16(shape)
        t_bf = slope(run_bf, *args_bf)
        run_i8, args_i8 = make_int8_chain(shape)
        t_i8 = slope(run_i8, *args_i8)
        b, h, w_, cin, cout = shape
        flops = 2 * b * h * w_ * cin * cout * 9
        print(f"{shape}: bf16 {t_bf*1e3:7.2f} ms ({flops/t_bf/1e12:5.1f} TF/s)"
              f"   int8-chain {t_i8*1e3:7.2f} ms ({flops/t_i8/1e12:5.1f} TOP/s)"
              f"   speedup {t_bf/t_i8:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
