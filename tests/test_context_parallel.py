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


def test_ulysses_matches_ring_and_full():
    from vdn.parallel.context import set_cp_mode, ulysses_attention
    mesh = make_mesh(data=1, seq=8)
    rng = np.random.default_rng(5)
    n, t, h, d = 16, 16, 2, 8
    q = rng.standard_normal((n, t, h, d)).astype(np.float32)
    k = rng.standard_normal((n, t, h, d)).astype(np.float32)
    v = rng.standard_normal((n, t, h, d)).astype(np.float32)
    from vdn.ops.attention import _xla_attention
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), d ** -0.5))
    uly = shard_map(
        lambda q, k, v: ulysses_attention(q, k, v, SEQ_AXIS),
        mesh=mesh,
        in_specs=(P(None, SEQ_AXIS),) * 3,
        out_specs=P(None, SEQ_AXIS), check_vma=False)
    with mesh:
        got = np.asarray(jax.jit(uly)(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    # full video model under alltoall mode matches single-device
    cfg = dict(encoder="vits", features=32, out_channels=(32, 32, 64, 64),
               use_flash=False)
    single = VideoDepthAnything(**cfg)
    parallel = VideoDepthAnything(**cfg, seq_axis=SEQ_AXIS)
    x = rng.standard_normal((1, 8, 56, 56, 3)).astype(np.float32)
    params = single.init(jax.random.PRNGKey(0), x[:, :2])
    ref_out = np.asarray(single.apply(params, x))
    mesh2 = make_mesh(data=2, seq=4)
    set_cp_mode("alltoall")
    try:
        fwd = make_context_parallel_forward(parallel, mesh2)
        with mesh2:
            got_out = np.asarray(fwd(params, np.tile(x, (2, 1, 1, 1, 1))))
    finally:
        set_cp_mode("ring")
    np.testing.assert_allclose(got_out[:1], ref_out, rtol=2e-4, atol=2e-4)


def test_vit_tensor_parallel_matches():
    from vdn.nn.vit import make_vit
    from vdn.parallel.sharding import shard_params, vit_tp_rules
    from vdn.parallel.mesh import MODEL_AXIS
    mesh = make_mesh(data=1, seq=1, model=8)
    model = make_vit("vits", use_flash=False)
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    with mesh:
        sharded = shard_params(params, mesh)
        got = np.asarray(jax.jit(model.apply)(sharded, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # the wide kernels must actually be sharded over the model axis
    qkv = sharded["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert len(qkv.sharding.device_set) == 8


def test_vitg_swiglu_tensor_parallel_matches():
    """The vitg family uses SwiGLU (w12/w3) — exercise those TP rules
    numerically on a small SwiGLU ViT over the 8-way model axis."""
    from vdn.nn.vit import DinoVisionTransformer
    from vdn.parallel.sharding import shard_params
    mesh = make_mesh(data=1, seq=1, model=8)
    model = DinoVisionTransformer(embed_dim=256, depth=2, num_heads=8,
                                  ffn="swiglufused", use_flash=False)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 56, 56, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))
    with mesh:
        sharded = shard_params(params, mesh)
        got = np.asarray(jax.jit(model.apply)(sharded, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    w12 = sharded["params"]["blocks_0"]["mlp"]["w12"]["kernel"]
    assert len(w12.sharding.device_set) == 8


def test_tp_coverage_assertion_on_vitg_tree():
    """Coverage guard: the REAL vitg (1.3B) param tree — via eval_shape,
    no materialization — has every wide matmul matched by a rule; a
    renamed layer trips the assertion instead of silently replicating."""
    from vdn.nn.vit import make_vit
    from vdn.parallel.sharding import assert_tp_coverage, vit_tp_rules

    model = make_vit("vitg", use_flash=False)
    params = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, 56, 56, 3), np.float32))
    # full vitg tree passes
    assert_tp_coverage(params)

    # simulate a rename of the matmul itself (rules match the kernel's
    # parent module name, so renaming w12 -> w12_fused falls through)
    blk = {k: dict(v) for k, v in params["params"]["blocks_0"].items()}
    blk["mlp"]["w12_fused"] = blk["mlp"].pop("w12")
    broken = {"params": {**params["params"], "blocks_0": blk}}
    rules = vit_tp_rules(broken)
    with pytest.raises(ValueError, match="replicated"):
        assert_tp_coverage(broken, rules)
