"""Profile the flagship clip forward on the real TPU chip.

Splits wall time into encoder vs temporal-DPT head, prints an XLA
cost-analysis FLOP estimate and derived MFU, and (with --trace) captures a
jax.profiler trace to profiles/ for op-level breakdown.

Timing methodology per repo memory: chain every iteration's input through
the previous output so the axon runtime cannot dedup identical dispatches.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

V5E_BF16_PEAK = 197e12  # v5e peak bf16 FLOP/s


def timed(fn, x, n=5, chain=None):
    out = fn(x)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n):
        out = fn(x)
        x = chain(x, out) if chain is not None else x
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=518)
    ap.add_argument("--encoder", default="vitl")
    args = ap.parse_args()

    from vdn.models.video_depth_anything import build_video_depth_anything

    model = build_video_depth_anything(args.encoder,
                                       compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(rng, jnp.zeros((1, 2, 56, 56, 3),
                                                jnp.float32))
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, args.frames, args.size, args.size, 3),
                          jnp.float32)

    def chain(x, out):
        leaf = jax.tree.leaves(out)[0]
        bump = leaf.reshape(-1)[0].astype(x.dtype) * 1e-6
        return x.at[0, 0, 0, 0, 0].add(bump)

    fwd = jax.jit(model.apply)
    enc = jax.jit(lambda p, x: model.apply(
        p, x, method=model.forward_features))

    lowered = fwd.lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")

    t_full = timed(lambda x: fwd(params, x), x, chain=chain)
    t_enc = timed(lambda x: enc(params, x), x, chain=chain)

    fps = args.frames / t_full
    report = {
        "full_ms": round(t_full * 1e3, 2),
        "encoder_ms": round(t_enc * 1e3, 2),
        "head_ms": round((t_full - t_enc) * 1e3, 2),
        "fps": round(fps, 2),
        "xla_flops_per_window": flops,
        "tflops_per_sec": round(flops / t_full / 1e12, 1),
        "mfu_vs_v5e_bf16_peak": round(flops / t_full / V5E_BF16_PEAK, 3),
    }
    print("PROFILE " + json.dumps(report))

    if args.trace:
        import os
        trace_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "profiles", "clip")
        with jax.profiler.trace(trace_dir):
            out = fwd(params, x)
            x = chain(x, out)
            out = fwd(params, x)
            jax.block_until_ready(out)
        print("TRACE_DIR " + trace_dir)


if __name__ == "__main__":
    main()
