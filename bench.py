"""Flagship benchmark: vitl 518px 32-frame video-depth throughput on 1 chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline denominator: the Video-Depth-Anything paper reports ~9.1 frames/sec
for VDA-L at 518px on a single A100 (the reference repo itself publishes no
numbers — see BASELINE.md); vs_baseline = our_fps / 9.1.

Timing methodology (tunnel-proof, two-point while_loop slope):

The axon TPU tunnel in this rig makes naive host-side timing WORTHLESS in
both directions: ``block_until_ready`` returns without waiting (8 chained
8k^3 matmuls "complete" in 0.2 ms), repeated dispatches of the same
executable are deduplicated even when inputs differ only slightly, and
device->host fetches crawl at ~20 MB/s.  Round-1/2 numbers measured with a
host-side chained loop (60.6, 113.4 fps) were inflated by runtime overlap:
the jax.profiler module wall shows one 32-frame vitl window takes 459 ms
on the chip — a hard physical bound the loop numbers violate.

This bench instead runs K windows inside ONE jitted ``lax.while_loop``
(with a traced trip count so both measurement points share one
executable), chaining
each window's input on the previous window's output *inside the
executable* (the runtime cannot dedup or reorder steps it cannot see), and
times K=K_SMALL vs K=K_LARGE with a scalar-output fetch forcing
completion.  The slope (T_large - T_small) / (K_LARGE - K_SMALL) cancels
the constant dispatch + fetch + tunnel overhead exactly; the result
matches the profiler's per-window module wall.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the flagship window modules take minutes of
# XLA:TPU compile over the tunnel; cache them so re-runs (driver rounds,
# A/B sweeps) pay only execution.  VDN_BENCH_JAX_CACHE=0 disables.
_cache = os.environ.get(
    "VDN_BENCH_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

A100_BASELINE_FPS = 9.1
FRAMES = 32
SIZE = 518
K_SMALL, K_LARGE = 2, 12
REPS = 5


def _make_runner(model):
    """One executable running k chained windows (k is a TRACED trip count,
    so both measurement points share one compile); returns a scalar."""

    @jax.jit
    def run(params, x, k):
        def cond(c):
            return c[0] < k

        def body(c):
            i, x, acc = c
            out = model.apply(params, x)
            # fold the output back into every input pixel so step i+1
            # depends on ALL of step i's work (no dead-code elimination,
            # no intra-executable reordering)
            bump = jnp.tanh(jnp.mean(out)) * 1e-3
            return i + 1, x * (1.0 + bump), acc + jnp.mean(out)

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x, jnp.float32(0.0)))
        return acc

    return run


def _make_cached_runner(model):
    """Steady-state pipeline window: encode only the 22 NEW frames,
    gather the 10 KEYFRAMES seed features from the previous window's
    encoder output on device (vdn/pipelines/infer_video.py
    make_cached_window_fns — the default inference path; outputs
    identical to re-encoding).  Each iteration's features feed the next
    window's gather, so the chain is a real data dependence."""
    from vdn.pipelines.infer_video import make_cached_window_fns
    _, cached = make_cached_window_fns(model)

    @jax.jit
    def run(params, x_new, feats, k):
        def cond(c):
            return c[0] < k

        def body(c):
            i, x, feats, acc = c
            depth, feats = cached(params, x, feats)
            bump = jnp.tanh(jnp.mean(depth)) * 1e-3
            # consume a feature leaf too so no output of the window is dead
            acc = acc + jnp.mean(depth) + 0.0 * jnp.mean(
                feats[-1][1].astype(jnp.float32))
            return i + 1, x * (1.0 + bump), feats, acc

        _, _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), x_new, feats, jnp.float32(0.0)))
        return acc

    return run


def _timed(run, *args, k: int) -> float:
    best = float("inf")
    for _ in range(REPS):
        start = time.perf_counter()
        float(run(*args, jnp.int32(k)))  # scalar fetch = the sync point
        best = min(best, time.perf_counter() - start)
    return best


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

    # --int8: the int8 serving mode — W8A8-dynamic encoder matmuls
    # (vdn/ops/pallas/int8.py) + calibrated-static head convs
    # (vdn/ops/int8_conv.py; the first window doubles as the PTQ
    # calibration pass, exactly as vdn.pipelines.infer_video serves).
    # --int8-dynamic keeps every scale dynamic (zero-calibration mode).
    # The headline metric stays bf16 (numerics-faithful to the
    # reference); the int8 number is reported with its own metric name.
    quantize = ("int8" if "--int8-dynamic" in sys.argv
                else "int8_static" if "--int8" in sys.argv else None)
    model = build_video_depth_anything("vitl", compute_dtype=jnp.bfloat16,
                                       quantize=quantize)
    rng = jax.random.PRNGKey(0)
    init_x = jnp.zeros((1, 2, 56, 56, 3), jnp.float32)
    params = jax.jit(model.init)(rng, init_x)

    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, FRAMES, SIZE, SIZE, 3), jnp.float32)

    # Default: the pipeline's steady-state window with the cross-window
    # encoder-feature cache (10 of the 32 frames' encoder features are
    # reused from the previous window exactly as vdn.pipelines.infer_video
    # does by default; each window still produces all 32 depth frames).
    # --no-cache measures the plain re-encode-everything window.
    def measure(run, *args) -> float:
        float(run(*args, jnp.int32(1)))  # warmup/compile
        t_small = _timed(run, *args, k=K_SMALL)
        t_large = _timed(run, *args, k=K_LARGE)
        per_window = (t_large - t_small) / (K_LARGE - K_SMALL)
        return FRAMES / per_window

    if "--no-cache" in sys.argv:
        fps = fps_uncached = measure(_make_runner(model), params, x)
    else:
        from vdn.pipelines.infer_video import (OVERLAP,
                                               make_cached_window_fns,
                                               make_calibrating_window_fn)
        if quantize == "int8_static":
            # first window = PTQ calibration (float + stat recording),
            # exactly as the pipeline serves
            _, feats, stats = make_calibrating_window_fn(model)(params, x)
            params = {**params, **stats}
        else:
            full_fn, _ = make_cached_window_fns(model)
            _, feats = full_fn(params, x)  # first window seeds the cache
        x_new = x[:, OVERLAP:]
        fps = measure(_make_cached_runner(model), params, x_new, feats)
        # apples-to-apples uncached number (re-encode all 32 frames) so
        # round-over-round ledger deltas stay self-describing
        fps_uncached = measure(_make_runner(model), params, x)

    metric = "video_depth_vitl_518_frames_per_sec_per_chip"
    if quantize:
        metric += "_int8"   # one stable metric name for both int8 modes
    if "--no-cache" in sys.argv:
        note = ("--no-cache: value = plain window (re-encodes all 32 "
                "frames); equals value_uncached")
    else:
        note = ("value = steady-state window w/ cross-window encoder cache"
                " (the default serving path); value_uncached re-encodes"
                " all 32 frames")
    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "value_uncached": round(fps_uncached, 3),
        "unit": "frames/sec",
        "note": note,
        "baseline": "vda_paper_a100_9.1_fps",
        "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
