"""DPT head numerics: bf16-compute drift bound for the output island.

The output island (`Scratch.output_conv2_0`) is an fp32-*accumulation*
island: under bf16 compute its operands (input feature and weights) are
rounded to bf16 and only the accumulator/activations are fp32 — a
deliberate deviation from the reference's fully-fp32 island
(reference dpt_temporal.py:108-110) documented in vdn/nn/dpt.py.  This
test bounds the bf16-vs-fp32 drift of that exact path so the production
bf16 configuration is covered, not just the fp32 parity path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vdn.nn.dpt import DPTHead


def _make_features(rng, b, n, c, dtype):
    return [(jnp.asarray(rng.standard_normal((b, n, c)), dtype), None)
            for _ in range(4)]


def test_output_island_bf16_drift():
    rng = np.random.default_rng(0)
    ph = pw = 8
    c = 64
    head = DPTHead(in_channels=c, features=32,
                   out_channels=(16, 32, 64, 64))
    feats32 = _make_features(rng, 1, ph * pw, c, jnp.float32)
    params = head.init(jax.random.PRNGKey(0), feats32, ph, pw)

    depth32, feat32 = head.apply(params, feats32, ph, pw)
    feats16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x is not None else None,
        feats32, is_leaf=lambda x: x is None)
    depth16, feat16 = head.apply(params, feats16, ph, pw)

    # island output must be fp32 in BOTH modes (the whole point of the
    # island is a full-precision final depth map)
    assert depth32.dtype == jnp.float32
    assert depth16.dtype == jnp.float32

    scale = float(jnp.max(jnp.abs(depth32))) + 1e-6
    drift = float(jnp.max(jnp.abs(depth16 - depth32))) / scale
    # bf16 operands bound the relative error around 2^-8 per rounding;
    # empirically the path sits well under 5e-2 normalized drift
    assert drift < 5e-2, f"bf16 island drift {drift:.4f} exceeds bound"
