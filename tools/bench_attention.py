"""Microbenchmark: flash kernel vs XLA einsum attention at ViT shapes.

Chains inputs through outputs to defeat axon dispatch dedup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    q = args[0]
    start = time.perf_counter()
    for _ in range(n):
        out = fn(q, *args[1:])
        q = q.at[0, 0, 0, 0].add(out.reshape(-1)[0] * 1e-6)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


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

    xla = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
    fl = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))

    t_xla = bench(xla, (q, k, v))
    t_flash = bench(fl, (q, k, v))
    flops = 4 * b * h * t * t * d
    print(f"xla:   {t_xla*1e3:8.2f} ms  {flops/t_xla/1e12:6.1f} TF/s")
    print(f"flash: {t_flash*1e3:8.2f} ms  {flops/t_flash/1e12:6.1f} TF/s")
    print(f"speedup: {t_xla/t_flash:.2f}x  "
          f"(per 24-layer window: {24*(t_xla-t_flash)*1e3:.0f} ms saved)")

    # numerics check at the real shape
    import numpy as np
    o1 = np.asarray(xla(q, k, v), np.float32)
    o2 = np.asarray(fl(q, k, v), np.float32)
    print("max_abs_diff:", float(np.abs(o1 - o2).max()))


if __name__ == "__main__":
    main()
