"""Context-parallel (ring attention) forward == single-device forward.

Runs on the 8-device CPU mesh: the clip's frame axis shards over 'seq',
temporal attention rides the ring; the result must match the unsharded
model numerically (fp32 online softmax is exact up to reduction order).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from vdn.models.video_depth_anything import VideoDepthAnything
from vdn.parallel.context import (make_context_parallel_forward,
                                  ring_attention)
from vdn.parallel.mesh import SEQ_AXIS, make_mesh


def test_ring_attention_matches_full():
    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 32, 4, 16  # t shards 8 x 4
    q = rng.standard_normal((b, t, h, d)).astype(np.float32)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)

    from vdn.ops.attention import _xla_attention
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), d ** -0.5))

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, SEQ_AXIS),
        mesh=mesh,
        in_specs=(P(None, SEQ_AXIS), P(None, SEQ_AXIS), P(None, SEQ_AXIS)),
        out_specs=P(None, SEQ_AXIS), check_vma=False)
    with mesh:
        got = np.asarray(jax.jit(ring)(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pe", ["ape", "rope"])
def test_context_parallel_video_model_matches(pe):
    mesh = make_mesh(data=2, seq=4)
    cfg = dict(encoder="vits", features=32, out_channels=(32, 32, 64, 64),
               use_flash=False, pe=pe)
    single = VideoDepthAnything(**cfg)
    parallel = VideoDepthAnything(**cfg, seq_axis=SEQ_AXIS)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 56, 56, 3)).astype(np.float32)
    params = single.init(jax.random.PRNGKey(0), x[:1, :2])

    ref = np.asarray(single.apply(params, x))
    fwd = make_context_parallel_forward(parallel, mesh)
    with mesh:
        got = np.asarray(fwd(params, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
