"""Probe XLA int8-conv lowering variants (pre-quantized operands, pure
conv time): direct vs Cin-split vs Cout-split vs NHWC->NCHW etc.

XLA's int8 conv reaches 87% of the 394-TOPS int8 peak at C=64 but only
~43-55% at C=256 (tools/bench_int8_conv.py); this sweep checks whether
operand splitting recovers the efficiency before we commit to a Pallas
conv kernel.  Slope methodology per bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SHAPES = [
    (32, 148, 148, 256, 256),
    (32, 296, 296, 256, 128),
]
K_SMALL, K_LARGE, REPS = 2, 10, 4


def slope(run, *args):
    def best(k):
        t = float("inf")
        for _ in range(REPS):
            s = time.perf_counter()
            float(run(*args, jnp.int32(k)))   # scalar fetch = sync point
            t = min(t, time.perf_counter() - s)
        return t

    float(run(*args, jnp.int32(1)))
    return (best(K_LARGE) - best(K_SMALL)) / (K_LARGE - K_SMALL)


def conv_i8(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def chain(run_body, x0, w):
    @jax.jit
    def run(x, w, k):
        def body(c_):
            i, x, acc = c_
            y = run_body(x, w)
            # fold a y-dependent int8 bump back into x (data dependence)
            bump = (jnp.sum(y, dtype=jnp.int32) % 2).astype(jnp.int8)
            x = x.at[0, 0, 0, 0].add(bump)
            return i + 1, x, acc + bump.astype(jnp.float32)

        _, _, acc = jax.lax.while_loop(lambda c_: c_[0] < k, body,
                                       (jnp.int32(0), x, jnp.float32(0.0)))
        return acc

    return run


def main():
    for (b, h, w_, cin, cout) in SHAPES:
        x0 = jax.random.randint(jax.random.PRNGKey(0), (b, h, w_, cin),
                                -127, 127, jnp.int8)
        wt = jax.random.randint(jax.random.PRNGKey(1), (3, 3, cin, cout),
                                -127, 127, jnp.int8)
        flops = 2 * b * h * w_ * cin * cout * 9

        def report(name, body):
            t = slope(chain(body, x0, wt), x0, wt)
            print(f"({b},{h},{w_},{cin}->{cout}) {name:14s} "
                  f"{t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TOP/s", flush=True)

        report("direct", conv_i8)
        report("cin-split2", lambda x, w: (
            conv_i8(x[..., :cin // 2], w[:, :, :cin // 2])
            + conv_i8(x[..., cin // 2:], w[:, :, cin // 2:])))
        report("cin-split4", lambda x, w: sum(
            conv_i8(x[..., i * cin // 4:(i + 1) * cin // 4],
                    w[:, :, i * cin // 4:(i + 1) * cin // 4])
            for i in range(4)))
        report("cout-split2", lambda x, w: jnp.concatenate(
            [conv_i8(x, w[..., :cout // 2]),
             conv_i8(x, w[..., cout // 2:])], axis=-1))
        report("taps9-dots", lambda x, w: sum(
            jax.lax.conv_general_dilated(
                x, w[dy:dy + 1, dx:dx + 1], (1, 1),
                [(1 - dy, dy - 1), (1 - dx, dx - 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            for dy in range(3) for dx in range(3)))


if __name__ == "__main__":
    main()
