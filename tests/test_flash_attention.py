"""Flash attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vdn.ops.attention import _xla_attention
from vdn.ops.pallas import flash_attention as fa


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run the Pallas kernel in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


@pytest.mark.parametrize("tq,tk,d", [(300, 300, 64), (128, 512, 32),
                                     (257, 130, 64)])
def test_matches_xla_attention(tq, tk, d):
    rng = np.random.default_rng(0)
    shape_q = (2, tq, 3, d)
    shape_k = (2, tk, 3, d)
    q = rng.standard_normal(shape_q).astype(np.float32)
    k = rng.standard_normal(shape_k).astype(np.float32)
    v = rng.standard_normal(shape_k).astype(np.float32)
    scale = d ** -0.5
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale))
    got = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                        jnp.asarray(v), scale=scale,
                                        block_q=128))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t,h,d", [(300, 2, 64), (260, 4, 32),
                                   (290, 16, 64),
                                   (300, 3, 64), (130, 2, 32)])
def test_fused_qkv_bthd_matches_xla(t, h, d):
    # the zero-staging column-block variant used by the ViT encoder hot
    # path; (2,64)/(4,32)/(16,64) hit the cols kernel (h % (128//d) == 0),
    # (3,64)/(2,32) exercise the staged fallback
    rng = np.random.default_rng(2)
    qkv = rng.standard_normal((2, t, 3, h, d)).astype(np.float32)
    scale = d ** -0.5
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale))
    got = np.asarray(fa.flash_attention_fused_qkv(jnp.asarray(qkv),
                                                  block_q=128))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("t,h,d", [(300, 3, 64), (130, 2, 32)])
def test_qkv_fused_matches_xla(t, h, d):
    rng = np.random.default_rng(1)
    qkv = rng.standard_normal((2, t, 3, h, d)).astype(np.float32)
    scale = d ** -0.5
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale))
    got = np.asarray(fa.flash_attention_qkv(jnp.asarray(qkv), block_q=128))
    got = got.transpose(0, 2, 1, 3)  # kernel returns [B, H, T, D]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
