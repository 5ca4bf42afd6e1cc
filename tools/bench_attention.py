"""Microbenchmark: flash kernel vs XLA einsum attention at ViT shapes.

Slope-timed inside one lax.while_loop executable — host-side loop timing
is invalid on this rig (block_until_ready doesn't wait and the runtime
dedups/overlaps repeated dispatches; see bench.py's docstring).  Prefer
in-model sweeps (tools/tune_kernels.sh) for tuning decisions; this tool
is for quick kernel-vs-XLA comparisons and numerics checks only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, args, ks=(1, 6)):
    """Per-call seconds via the two-point in-executable slope (the only
    timing method that holds up over the axon tunnel)."""

    @jax.jit
    def run(args, k):
        def body(c):
            i, args, acc = c
            out = fn(*args)
            bump = jnp.tanh(jnp.mean(out).astype(jnp.float32)) * 1e-3
            args = (args[0] * (1.0 + bump).astype(args[0].dtype),
                    *args[1:])
            return i + 1, args, acc + bump

        _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < k, body, (jnp.int32(0), args, jnp.float32(0)))
        return acc

    float(run(args, jnp.int32(1)))  # compile + warm

    def best(k):
        v = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(args, jnp.int32(k)))
            v = min(v, time.perf_counter() - t0)
        return v

    return (best(ks[1]) - best(ks[0])) / (ks[1] - ks[0])


def main():
    from vdn.ops.attention import _xla_attention
    from vdn.ops.pallas.flash_attention import flash_attention

    b, t, h, d = 32, 1370, 16, 64  # vitl 518px 32-frame window
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, t, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, t, h, d), jnp.bfloat16)
    scale = d ** -0.5

    xla = lambda q, k, v: _xla_attention(q, k, v, scale)  # noqa: E731
    fl = lambda q, k, v: flash_attention(q, k, v, scale)  # noqa: E731

    t_xla = bench(xla, (q, k, v))
    t_flash = bench(fl, (q, k, v))
    flops = 4 * b * h * t * t * d
    print(f"xla:   {t_xla*1e3:8.2f} ms  {flops/t_xla/1e12:6.1f} TF/s")
    print(f"flash: {t_flash*1e3:8.2f} ms  {flops/t_flash/1e12:6.1f} TF/s")
    print(f"speedup: {t_xla/t_flash:.2f}x  "
          f"(per 24-layer window: {24*(t_xla-t_flash)*1e3:.0f} ms saved)")

    # numerics check at the real shape
    import numpy as np
    o1 = np.asarray(jax.jit(xla)(q, k, v), np.float32)
    o2 = np.asarray(jax.jit(fl)(q, k, v), np.float32)
    print("max_abs_diff:", float(np.abs(o1 - o2).max()))


if __name__ == "__main__":
    main()
