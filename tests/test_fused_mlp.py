"""Fused LN->MLP->LayerScale->residual Pallas kernel vs the unfused path.

Runs the kernel in Pallas interpret mode on the CPU mesh (the TPU hot path
is exercised by bench.py / the drift report).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vdn.ops.pallas.mlp import (_ln_mlp_pallas, _reference_tail,
                                fused_ln_mlp_residual)


def _args(n=640, c=256, f=1024, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((n, c)), jnp.float32),
        jnp.asarray(rng.standard_normal(c), jnp.float32),
        jnp.asarray(rng.standard_normal(c), jnp.float32),
        jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal((f, c)) * 0.05, jnp.float32),
        jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(c), jnp.float32),
    )


def test_fused_ln_mlp_forward_matches_reference():
    args = _args()
    ref = _reference_tail(*args, eps=1e-6)
    with pltpu.force_tpu_interpret_mode():
        out = _ln_mlp_pallas(*args, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fused_ln_mlp_partial_last_block():
    # n not a multiple of the 512-row block: out-of-bounds rows must be
    # dropped on store
    args = _args(n=700)
    ref = _reference_tail(*args, eps=1e-6)
    with pltpu.force_tpu_interpret_mode():
        out = _ln_mlp_pallas(*args, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_fused_ln_mlp_grads_match_reference():
    args = _args(n=320, c=128, f=512)

    def f_ref(*a):
        return (_reference_tail(*a, eps=1e-6) ** 2).sum()

    def f_fused(*a):
        with pltpu.force_tpu_interpret_mode():
            return (fused_ln_mlp_residual(*a, 1e-6) ** 2).sum()

    idx = tuple(range(8))
    gr = jax.grad(f_ref, argnums=idx)(*args)
    gf = jax.grad(f_fused, argnums=idx)(*args)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_handwritten_bwd_matches_autodiff_bf16():
    # the production compute dtype: the hand-written _bwd must track
    # jax.vjp of _reference_tail dtype-for-dtype (incl. bf16 dW rounding)
    args = _args(n=320, c=128, f=512, seed=3)
    args = (args[0].astype(jnp.bfloat16),) + args[1:]
    g = jnp.asarray(np.random.default_rng(9).standard_normal((320, 128)),
                    jnp.bfloat16)

    _, vjp = jax.vjp(lambda *a: _reference_tail(*a, eps=1e-6), *args)
    ref = vjp(g)

    from vdn.ops.pallas.mlp import _bwd
    got = _bwd(1e-6, args, g)
    # exactness is proven by the f32 test above; under bf16 the two
    # gelu'-chains differ by ~1 ulp before the bf16 round, and the
    # sum-reductions (db1/dls/...) random-walk that noise over the 320
    # rows — tolerances sized for that, tight enough to catch any
    # formula/dtype error (a wrong term shifts grads by O(1))
    for a, b in zip(ref, got):
        assert a.dtype == b.dtype
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=0.1, atol=0.5)


@pytest.mark.parametrize("n", [640, 700])  # 700: partial last row block
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_bwd_kernel_matches_xla_bwd(n, dtype):
    # the TPU train path uses _bwd_via_kernel (Pallas dx/y/h/dhpre +
    # XLA dW dots); it must track the hand-written XLA _bwd, whose own
    # correctness vs autodiff is proven above.  Partial-block case
    # checks the row masking of the dls/dlb/db1 accumulators.
    from vdn.ops.pallas.mlp import _bwd, _bwd_via_kernel

    args = _args(n=n, c=256, f=1024, seed=5)
    args = (args[0].astype(dtype),) + args[1:]
    g = jnp.asarray(np.random.default_rng(11).standard_normal((n, 256)),
                    dtype)
    ref = _bwd(1e-6, args, g)
    with pltpu.force_tpu_interpret_mode():
        got = _bwd_via_kernel(1e-6, args, g)
    # only erf/gelu' differ (A&S approx vs lax.erf, ~5e-7 pre-round) plus
    # blockwise f32 reduction reassociation.  The f32 case is the tight
    # formula check; under bf16 occasional 1-ulp dhpre/h flips at
    # rounding boundaries random-walk through the 640-row reductions
    # (same sizing rationale as test_handwritten_bwd_matches_autodiff_
    # bf16 — a wrong term shifts grads by O(10), far above this)
    tol = dict(rtol=5e-3, atol=5e-3) if dtype == jnp.float32 \
        else dict(rtol=5e-2, atol=1.0)
    for a, b in zip(ref, got):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32), **tol)


def test_erf_approximation_accuracy():
    # A&S 7.1.26: 1.5e-7 in exact arithmetic, ~5e-7 after f32 rounding —
    # far below bf16 resolution (~4e-3)
    from vdn.ops.pallas.mlp import _erf_f32
    x = jnp.linspace(-6.0, 6.0, 20001, dtype=jnp.float32)
    approx = _erf_f32(x)
    exact = jax.lax.erf(x)
    assert float(jnp.abs(approx - exact).max()) < 1e-6


def test_fast_gelu_accuracy():
    # bf16 compute uses the tanh-form GELU: max abs error vs exact is
    # 4.7e-4 (gelu) / 8.7e-4 (gelu') — both far below the 3.1e-2 bf16
    # ROUNDING error of exact gelu, so the bf16 activations are
    # indistinguishable from the erf form after the round
    from vdn.ops.pallas.mlp import _dgelu_f32, _gelu_fast_f32

    x = jnp.linspace(-8.0, 8.0, 40001, dtype=jnp.float32)
    exact = x * jax.scipy.stats.norm.cdf(x)
    assert float(jnp.abs(_gelu_fast_f32(x) - exact).max()) < 6e-4
    dexact = jax.vmap(jax.grad(lambda v: v * jax.scipy.stats.norm.cdf(v)))(x)
    g, dg = _dgelu_f32(x, jnp.bfloat16)
    assert float(jnp.abs(g - exact).max()) < 6e-4
    assert float(jnp.abs(dg - dexact).max()) < 1.2e-3
    # fp32 compute keeps the exact erf form
    g32, dg32 = _dgelu_f32(x, jnp.float32)
    assert float(jnp.abs(g32 - exact).max()) < 1e-6
    assert float(jnp.abs(dg32 - dexact).max()) < 2e-6


def test_fused_ln_mlp_forward_bf16_fast_gelu():
    # production path: bf16 compute + tanh-GELU kernel vs the bf16
    # exact-erf reference — difference bounded by the fast-gelu error
    # propagated through fc2 (well under the bf16 matmul rounding)
    args = _args()
    args = (args[0].astype(jnp.bfloat16),) + args[1:]
    ref = _reference_tail(*args, eps=1e-6)
    with pltpu.force_tpu_interpret_mode():
        out = _ln_mlp_pallas(*args, eps=1e-6)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0, atol=0.08)


def test_fused_ln_mlp_3d_matches_2d():
    """The frame-major 3D grid (B, N-blocks) — the encoder's layout,
    added to kill the tile-misaligned [B,N,C]<->[B*N,C] relayout copies
    — must match the flat 2D path in forward AND grads (fp32 exact
    modulo reduction order; N chosen sublane-misaligned like the real
    1370)."""
    b, n, c, f = 3, 170, 128, 512  # n % 8 != 0 on purpose
    flat = _args(n=b * n, c=c, f=f, seed=3)
    x3 = flat[0].reshape(b, n, c)
    args3 = (x3,) + flat[1:]

    def loss2(*a):
        with pltpu.force_tpu_interpret_mode():
            return (fused_ln_mlp_residual(*a, 1e-6) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out3 = fused_ln_mlp_residual(*args3, 1e-6)
        out2 = fused_ln_mlp_residual(*flat, 1e-6)
    np.testing.assert_allclose(np.asarray(out3).reshape(b * n, c),
                               np.asarray(out2), rtol=0, atol=2e-5)

    g3 = jax.grad(loss2, argnums=tuple(range(8)))(*args3)
    g2 = jax.grad(loss2, argnums=tuple(range(8)))(*flat)
    np.testing.assert_allclose(np.asarray(g3[0]).reshape(b * n, c),
                               np.asarray(g2[0]), rtol=2e-4, atol=2e-4)
    for a3, a2 in zip(g3[1:], g2[1:]):
        np.testing.assert_allclose(np.asarray(a3), np.asarray(a2),
                                   rtol=2e-4, atol=2e-4)


def test_fused_ln_mlp_3d_kernel_path_matches_2d_kernel_path():
    """Force the Pallas BACKWARD kernels (both grids) and compare: the
    3D bwd kernel + multi-dim dW dots vs the 2D bwd kernel."""
    import unittest.mock
    import os
    from vdn.ops.pallas import mlp as M

    b, n, c, f = 2, 1034, 128, 512
    flat = _args(n=b * n, c=c, f=f, seed=4)
    x3 = flat[0].reshape(b, n, c)

    def loss(*a):
        with pltpu.force_tpu_interpret_mode():
            return (fused_ln_mlp_residual(*a, 1e-6) ** 2).sum()

    with unittest.mock.patch.object(M, "fused_mlp_bwd_enabled",
                                    lambda rows: True), \
            pltpu.force_tpu_interpret_mode():
        g3 = jax.grad(loss, argnums=(0, 3, 5, 7))(x3, *flat[1:])
        g2 = jax.grad(loss, argnums=(0, 3, 5, 7))(*flat)
    np.testing.assert_allclose(np.asarray(g3[0]).reshape(b * n, c),
                               np.asarray(g2[0]), rtol=2e-4, atol=2e-4)
    for a3, a2 in zip(g3[1:], g2[1:]):
        np.testing.assert_allclose(np.asarray(a3), np.asarray(a2),
                                   rtol=2e-4, atol=2e-4)
