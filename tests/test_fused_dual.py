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
