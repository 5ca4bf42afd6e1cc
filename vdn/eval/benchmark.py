"""FPS/TPF benchmark harnesses (reference sam2/benchmark.py:20-92 and the
TPF printout of scripts/evaluate_v4.py:229-236), with chained inputs so the
runtime cannot dedup repeated dispatches (see bench.py)."""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["benchmark_fn", "benchmark_video_model"]


def benchmark_fn(fn: Callable, args, n_warmup: int = 2, n_iters: int = 5,
                 perturb: Callable = None) -> Dict[str, float]:
    """Times fn(*args); `perturb(args, out)` must return new args derived
    from the previous output to defeat dispatch dedup."""
    out = None
    for _ in range(n_warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
        if perturb is not None:
            args = perturb(args, out)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return {"sec_per_iter": elapsed / n_iters, "iters": n_iters}


def benchmark_video_model(model, params, frames: int = 32, size: int = 518,
                          n_iters: int = 5) -> Dict[str, float]:
    """Frames/sec of the clip forward on the current default device."""
    x = jax.random.normal(jax.random.PRNGKey(0),
                          (1, frames, size, size, 3), jnp.float32)
    fwd = jax.jit(model.apply)

    def perturb(args, out):
        p, x = args
        x = jax.lax.dynamic_update_slice(
            x, out[:, :1, :1, :1, None] * 1e-6, (0, 0, 0, 0, 0))
        return (p, x)

    stats = benchmark_fn(fwd, (params, x), perturb=perturb,
                         n_iters=n_iters)
    fps = frames / stats["sec_per_iter"]
    return {"frames_per_sec": fps,
            "tpf_msec": stats["sec_per_iter"] / frames * 1000}
