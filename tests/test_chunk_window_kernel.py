"""Fused chunk-window kernel vs the XLA algebra in motion.py.

Interpret mode on CPU; the TPU hot path is exercised by
tools/bench_stream.py and the streaming pipeline parity tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from vdn.nn.motion import TemporalAttention
from vdn.ops.pallas.chunk_window import chunk_window_attention


def test_chunk_window_kernel_matches_xla_algebra():
    n, kf, c, cap, h, w = 70, 4, 128, 11, 8, 32
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, kf, c)), jnp.float32)
    buf = jnp.asarray(rng.standard_normal((n, cap, c)), jnp.float32)
    # full windows: live ring slots repeated, own entry last, frame 1+
    # reads earlier in-chunk columns
    sels = []
    for j in range(kf):
        sel = [(i % cap) for i in range(w - 1 - j)] \
            + [cap + i for i in range(j)] + [cap + j]
        sels.append(sel)
    onehot = jax.nn.one_hot(jnp.asarray(sels, jnp.int32), cap + kf,
                            dtype=jnp.float32)

    attn = TemporalAttention(c, heads=h, temporal_max_len=w)
    params = attn.init(jax.random.PRNGKey(0), x, kf, cache=(buf, onehot))
    ref, ref_entry = attn.apply(params, x, kf, cache=(buf, onehot))

    p = params["params"]
    with pltpu.force_tpu_interpret_mode():
        got = chunk_window_attention(
            x, buf, onehot,
            jnp.asarray(__import__(
                "vdn.nn.motion", fromlist=["sinusoidal_positional_encoding"]
            ).sinusoidal_positional_encoding(c, w)),
            p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"],
            p["to_out_0"]["kernel"], p["to_out_0"]["bias"],
            h, float((c // h) ** -0.5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
