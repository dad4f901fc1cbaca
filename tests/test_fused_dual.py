"""Fused dual matmul kernel: (D @ x_hot, D^T @ x) in one pass over D
(experiments/probe_fused.py — the dense-half optimization of the hybrid
SpMM). Interpret-mode equality against the two separate XLA matmuls."""

import functools
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))


@pytest.mark.parametrize("bn,bk", [(256, 256), (128, 512), (512, 128)])
def test_fused_dual_matches_xla(bn, bk):
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.fused_dual import fused_dual

    rng = np.random.default_rng(1)
    n, k, h = 1024, 512, 128
    d = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    xh = jnp.asarray(rng.standard_normal((k, h)), jnp.float32)

    out, hot = jax.jit(
        functools.partial(fused_dual, bn=bn, bk=bk, interpret=True)
    )(d, x, xh)
    prec = jax.lax.Precision.HIGHEST
    ref_out = jnp.dot(d, xh, preferred_element_type=jnp.float32, precision=prec)
    ref_hot = jax.lax.dot_general(
        d, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hot), np.asarray(ref_hot), rtol=1e-5, atol=1e-4)


def test_fused_dual_gradients():
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.fused_dual import fused_dual

    rng = np.random.default_rng(2)
    n, k, h = 512, 256, 64  # h < 128 exercises the lane padding
    d = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    xh = jnp.asarray(rng.standard_normal((k, h)), jnp.float32)
    t_out = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    t_hot = jnp.asarray(rng.standard_normal((k, h)), jnp.float32)

    def f_fused(x, xh):
        out, hot = fused_dual(d, x, xh, bn=256, bk=128, interpret=True)
        return jnp.sum(out * t_out) + jnp.sum(hot * t_hot)

    def f_ref(x, xh):
        prec = jax.lax.Precision.HIGHEST
        out = jnp.dot(d, xh, preferred_element_type=jnp.float32, precision=prec)
        hot = jax.lax.dot_general(
            d, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.sum(out * t_out) + jnp.sum(hot * t_hot)

    gx_f, gxh_f = jax.grad(f_fused, argnums=(0, 1))(x, xh)
    gx_r, gxh_r = jax.grad(f_ref, argnums=(0, 1))(x, xh)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gxh_f), np.asarray(gxh_r), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("bn,bk", [(256, 256), (128, 512)])
def test_fused_dual_split_matches_f64_within_split2_band(bn, bk):
    """v2 split kernel (hi/lo bf16, 3 passes): must agree with the f64
    oracle to the split2 precision class (~2^-18 relative — the dropped
    lo*lo term), and its hotT layout/transpose must be exact."""
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.fused_dual import fused_dual_split, split_bf16

    rng = np.random.default_rng(4)
    n, k, h = 1024, 512, 100  # h < 128 exercises lane padding
    d = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal((n, h)).astype(np.float32)
    xh = rng.standard_normal((k, h)).astype(np.float32)
    dhi, dlo = split_bf16(jnp.asarray(d))

    out, hot = jax.jit(
        functools.partial(fused_dual_split, bn=bn, bk=bk, interpret=True)
    )(dhi, dlo, jnp.asarray(x), jnp.asarray(xh))
    ref_out = d.astype(np.float64) @ xh.astype(np.float64)
    ref_hot = d.astype(np.float64).T @ x.astype(np.float64)
    scale_o = np.abs(ref_out).max()
    scale_h = np.abs(ref_hot).max()
    assert np.abs(np.asarray(out) - ref_out).max() / scale_o < 2e-5
    assert np.abs(np.asarray(hot) - ref_hot).max() / scale_h < 2e-5


def test_fused_dual_split_gradients():
    import jax
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.fused_dual import fused_dual_split, split_bf16

    rng = np.random.default_rng(5)
    n, k, h = 512, 256, 64
    d = rng.standard_normal((n, k)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    xh = jnp.asarray(rng.standard_normal((k, h)), jnp.float32)
    t_out = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    t_hot = jnp.asarray(rng.standard_normal((k, h)), jnp.float32)
    dhi, dlo = split_bf16(jnp.asarray(d))

    def f_split(x, xh):
        out, hot = fused_dual_split(dhi, dlo, x, xh, bn=256, bk=128,
                                    interpret=True)
        return jnp.sum(out * t_out) + jnp.sum(hot * t_hot)

    gx_f, gxh_f = jax.grad(f_split, argnums=(0, 1))(x, xh)
    # analytic: g_x = D @ t_hot, g_xh = D^T @ t_out
    gx_r = d @ np.asarray(t_hot)
    gxh_r = d.T @ np.asarray(t_out)
    assert np.abs(np.asarray(gx_f) - gx_r).max() / np.abs(gx_r).max() < 2e-5
    assert np.abs(np.asarray(gxh_f) - gxh_r).max() / np.abs(gxh_r).max() < 2e-5


def test_fused_dual_tiny_k_falls_back():
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.fused_dual import fused_dual

    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)  # k < 128
    x = jnp.asarray(rng.standard_normal((256, 32)), jnp.float32)
    xh = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    out, hot = fused_dual(d, x, xh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(d @ xh), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hot), np.asarray(d.T @ x), rtol=1e-5, atol=1e-4)
