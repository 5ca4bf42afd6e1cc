"""A/B: XLA ring attention vs the fused Pallas ring step at long-clip
temporal-attention shapes (T>=64; motion-module layout
[B*H*W tokens, T frames, heads, head_dim]).

On this rig only ONE real chip exists, so the ring degenerates to a
single step (p=1, self-permute): what this measures honestly is the
per-step compute path — the XLA einsum/exp/correction chain (which
materializes [B,H,Tq,Tk] logits in HBM) vs the fused Pallas block
kernel (logits stay in VMEM).  Multi-chip ICI overlap cannot be
measured here; the step kernel is the per-device term of the ring.

Timing: in-executable chained lax.while_loop, two-point slope
(see bench.py docstring for why host-side timing lies on this rig).

Usage: python tools/bench_ring.py [T] [N] [heads] [dim]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vdn.parallel.mesh import SEQ_AXIS, make_mesh


def slope_time(fn, args, k_small=3, k_large=12, reps=3):
    @jax.jit
    def run(args, k):
        def body(c):
            i, args, acc = c
            out = fn(*args)
            bump = jnp.tanh(jnp.mean(out)) * 1e-3
            q = args[0] * (1.0 + bump)
            return i + 1, (q,) + args[1:], acc + bump

        _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < k, body, (jnp.int32(0), args,
                                       jnp.float32(0.0)))
        return acc

    float(run(args, jnp.int32(1)))  # compile + warm

    def best(k):
        t = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(args, jnp.int32(k)))
            t = min(t, time.perf_counter() - t0)
        return t

    return (best(k_large) - best(k_small)) / (k_large - k_small)


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1369
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    d = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    mesh = make_mesh(data=1, seq=1, model=1,
                     devices=jax.devices()[:1])
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((n, t, h, d)), jnp.bfloat16)

    from vdn.parallel.context import ring_attention
    from vdn.ops.pallas.ring_attention import ring_attention_pallas

    results = {}
    for name, impl in (("ring_xla", ring_attention),
                       ("ring_pallas", ring_attention_pallas)):
        fn = shard_map(lambda q, k, v, impl=impl:
                       impl(q, k, v, SEQ_AXIS),
                       mesh=mesh, in_specs=(P(None, SEQ_AXIS),) * 3,
                       out_specs=P(None, SEQ_AXIS), check_vma=False)
        with mesh:
            # agreement check before timing
            out = np.asarray(fn(q, k, v), np.float32)
            sec = slope_time(fn, (q, k, v))
        results[name] = (sec, out)
        print(f"{name}: {sec * 1e3:.3f} ms  "
              f"[N={n} T={t} H={h} D={d} bf16]")

    diff = np.abs(results["ring_xla"][1] - results["ring_pallas"][1]).max()
    print(f"max|xla - pallas| = {diff:.2e}")
    speed = results["ring_xla"][0] / results["ring_pallas"][0]
    print(f"pallas step speedup vs xla step: {speed:.2f}x")


if __name__ == "__main__":
    main()
