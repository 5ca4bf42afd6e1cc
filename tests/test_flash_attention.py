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
                                        jnp.asarray(v), scale, 128))
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
                                                  None, 128))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_bf16_exp_drift_bounded(monkeypatch):
    """The bf16-exp fast softmax (env-gated, default off; taken only when
    V is bf16 — see _softmax_rows) must stay within the rounding already
    implied by the bf16 AV matmul: vs an fp32 XLA softmax+matmul
    reference, the bf16 kernel's extra error over a plain bf16 XLA path
    must be the same order (<=2x), and absolute drift <=6e-3 for
    unit-normal inputs."""
    monkeypatch.setattr(fa, "_BF16_EXP", True)
    rng = np.random.default_rng(5)
    qkv32 = rng.standard_normal((2, 290, 3, 4, 32)).astype(np.float32)
    qkv16 = jnp.asarray(qkv32, jnp.bfloat16)
    q, k, v = qkv32[:, :, 0], qkv32[:, :, 1], qkv32[:, :, 2]
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), 32 ** -0.5))
    xla16 = np.asarray(_xla_attention(qkv16[:, :, 0], qkv16[:, :, 1],
                                      qkv16[:, :, 2], 32 ** -0.5),
                       np.float32)
    got = np.asarray(fa.flash_attention_fused_qkv(qkv16, None, 128),
                     np.float32)
    flash_err = np.abs(got - ref).max()
    xla_err = np.abs(xla16 - ref).max()
    assert flash_err <= max(2 * xla_err, 1e-3), (flash_err, xla_err)
    assert flash_err <= 6e-3


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


def test_flash_attention_grads_match_xla():
    """Training path: the custom_vjp backward (the Pallas full-K backward
    kernel) must produce the XLA path's gradients — round 2 shipped a
    kernel with NO vjp, which broke jax.grad through any flash-enabled
    encoder."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal((1, 192, 2, 32)).astype(np.float32)
    k = rng.standard_normal((1, 192, 2, 32)).astype(np.float32)
    v = rng.standard_normal((1, 192, 2, 32)).astype(np.float32)
    scale = 32 ** -0.5
    cot = rng.standard_normal(q.shape).astype(np.float32)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                          jnp.asarray(v), scale, 128)
                       * cot)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) * cot)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-5, atol=2e-5)


def test_fused_qkv_grads_match_xla():
    rng = np.random.default_rng(3)
    qkv = rng.standard_normal((1, 160, 3, 2, 64)).astype(np.float32)
    scale = 64 ** -0.5

    def loss_flash(qkv):
        return jnp.sum(jnp.square(
            fa.flash_attention_fused_qkv(qkv, scale, 128)))

    def loss_xla(qkv):
        return jnp.sum(jnp.square(_xla_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale)))

    got = jax.grad(loss_flash)(jnp.asarray(qkv))
    want = jax.grad(loss_xla)(jnp.asarray(qkv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_qkv_grads_multi_colblock_ragged_t():
    # b>1, two 128-wide column blocks (h=4, d=64), t not a multiple of the
    # sublane width: exercises the cols-backward kernel's padded-row
    # masking and the dk/dv accumulation across sequential q blocks
    rng = np.random.default_rng(5)
    qkv = rng.standard_normal((2, 150, 3, 4, 64)).astype(np.float32)
    scale = 64 ** -0.5

    def loss_flash(qkv):
        return jnp.sum(jnp.square(
            fa.flash_attention_fused_qkv(qkv, scale, 64)))

    def loss_xla(qkv):
        return jnp.sum(jnp.square(_xla_attention(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale)))

    got = jax.grad(loss_flash)(jnp.asarray(qkv))
    want = jax.grad(loss_xla)(jnp.asarray(qkv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_accum_conv_grad():
    """The fp32-accum island conv (bf16 in, fp32 out) must differentiate
    — XLA's built-in conv grad rejects the dtype mix; vdn routes it
    through a custom_vjp (vdn/nn/layers.py:_conv_nhwc_accum)."""
    from vdn.nn.layers import Conv2d

    conv = Conv2d(8, (3, 3), padding=1, accum_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 8, 8, 4)), jnp.bfloat16)
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        y = conv.apply(params, x)
        assert y.dtype == jnp.float32
        return jnp.sum(jnp.square(y))

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert gx.dtype == x.dtype
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree.leaves(gp))
    # finite-difference check on one kernel element (fp32 math)
    eps = 1e-2
    k0 = params["params"]["kernel"]
    bumped = jax.tree.map(lambda a: a, params)
    bumped["params"]["kernel"] = k0.at[0, 0, 0, 0].add(eps)
    fd = (float(loss(bumped, x)) - float(loss(params, x))) / eps
    np.testing.assert_allclose(
        float(np.asarray(gp["params"]["kernel"])[0, 0, 0, 0]), fd,
        rtol=0.1)


@pytest.mark.parametrize("mode", ["qk", "pv", "all"])
def test_int8_fused_qkv_close_to_xla(mode):
    """int8 serving flash (QK^T / P@V on the int8 MXU with in-VMEM
    dynamic quantization) stays within quantization noise of the fp32
    XLA attention.  K-centering makes the qk mode exactly
    softmax-shift-invariant, so the bound covers pure round-off."""
    rng = np.random.default_rng(7)
    t, h, d = 290, 4, 64
    qkv = rng.standard_normal((2, t, 3, h, d)).astype(np.float32)
    # channel-mean outliers on K and V (the case centering exists for)
    qkv[:, :, 1, :, 3] += 4.0
    qkv[:, :, 2, :, 5] += 3.0
    scale = d ** -0.5
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale))
    got = np.asarray(fa.flash_attention_int8_fused_qkv(
        jnp.asarray(qkv), None, 128, mode=mode))
    d_abs = np.abs(got - ref)
    rms = np.sqrt(np.mean(d_abs ** 2)) / np.std(ref)
    # measured (2026-08-19): qk 0.0028/0.033, pv 0.0049/0.078,
    # all 0.0056/0.070 (rms/std, max/std) — bounds at ~1.5x
    assert rms < 0.01, (mode, rms)
    assert d_abs.max() < 0.12 * np.std(ref), (mode, d_abs.max())


def test_int8_fused_qkv_mode_off_is_bf16_kernel():
    rng = np.random.default_rng(8)
    qkv = jnp.asarray(rng.standard_normal((1, 130, 3, 2, 64)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(fa.flash_attention_int8_fused_qkv(qkv, None, 128,
                                                     mode="0")),
        np.asarray(fa.flash_attention_fused_qkv(qkv, None, 128)))


def test_flash_colbias_matches_xla():
    """Column-bias flash flavor (memory-bank slot masks) vs the XLA
    path, -inf masked prefix included."""
    from jax.experimental.pallas import tpu as pltpu

    from vdn.ops.attention import _xla_attention
    from vdn.ops.pallas.flash_attention import flash_attention_colbias

    rng = np.random.default_rng(9)
    b, tq, tk, h, d = 1, 277, 6 * 277, 4, 64
    q = jnp.asarray(rng.standard_normal((b, tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tk, h, d)), jnp.float32)
    bias = jnp.where(jnp.arange(tk) < 2 * 277, -jnp.inf, 0.0)

    ref = _xla_attention(q, k, v, d ** -0.5,
                         bias[None, None, None, :])
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_colbias(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
