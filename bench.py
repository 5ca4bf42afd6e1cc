"""Flagship benchmark: vitl 518px 32-frame video-depth throughput on 1 chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the Video-Depth-Anything paper reports ~9.1 frames/sec
for VDA-L at 518px on a single A100 (the reference repo itself publishes no
numbers — see BASELINE.md); vs_baseline = our_fps / 9.1.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

A100_BASELINE_FPS = 9.1
FRAMES = 32
SIZE = 518


def main():
    if "--profile" in sys.argv:
        # capture a jax.profiler trace alongside the timing (analyzed with
        # tools/parse_trace.py); see tools/profile_clip.py for the full
        # op-level workflow
        import subprocess
        subprocess.run([sys.executable, "tools/profile_clip.py", "--trace"],
                       check=True)
        return
    from vdn.models.video_depth_anything import build_video_depth_anything

    model = build_video_depth_anything("vitl", compute_dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 2, 56, 56, 3), jnp.float32)
    params = jax.jit(model.init)(rng, init_x)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, FRAMES, SIZE, SIZE, 3), jnp.float32)

    fwd = jax.jit(model.apply)
    # warmup/compile
    fwd(params, x).block_until_ready()

    # chain iterations through the output so the runtime cannot dedup or
    # overlap identical executions (the axon tunnel was observed returning
    # bogus sub-ms timings for repeated identical dispatches)
    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(params, x)
        x = jax.lax.dynamic_update_slice(
            x, out[:, :1, :1, :1, None] * 1e-6, (0, 0, 0, 0, 0))
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    fps = FRAMES * n_iters / elapsed
    print(json.dumps({
        "metric": "video_depth_vitl_518_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
