"""Fused dual matmul: ``(D @ x_hot, D^T @ x)`` in ONE pass over ``D``.

The hybrid SpMM's dense half (ops/hybrid.py) needs both products of the
[N, K] hot block D against skinny [., H] operands every application. As two
XLA matmuls each streams D from HBM (~220 GB/s measured, no cross-matmul
fusion — experiments/chip_probe.py run_dense), and at bench scale D is the
step's dominant traffic (677 MB at N=41k, K=4096, f32). Both contractions
touch every D element exactly once, so a Pallas kernel computes them while
reading each D tile a single time:

    grid (N/BN, K/BK), k innermost
    out[bn]  += D[bn,bk] @ x_hot[bk]    # out block resident across the k row
    hot[bk]  += D[bn,bk]^T @ x[bn]      # full [K, H] output block resident
                                        # across the whole grid (constant
                                        # index map); accumulated through a
                                        # dynamic row slice at k_i * BK

Measured outcome (experiments/probe_fused.py on the v5e, N=41472 K=4096
H=128): the dual product is MXU-COMPUTE-bound, not bandwidth-bound — at
lane-padded H=128 the f32/HIGHEST intensity (H/2 = 64 flops/byte) lands
exactly on the chip's measured balance point (14.1 TFLOP/s / 220 GB/s),
and bf16/DEFAULT (H = 128 flops/byte vs balance 105) is past it. Reading
D once therefore gains only 1.07x (f32, best blocking bn=256 bk=K) and
~1.0x (bf16); the default blocking below is that best-measured geometry,
and ops/hybrid.py keeps the kernel off by default (`fused=None` ->
False). It remains correct and available for bandwidth-bound regimes
(higher compute:bandwidth chips). Backward is the SAME kernel with the
skinny operands swapped: d(out)=g_out, d(hot)=g_hot give
g_x = D @ g_hot and g_xh = D^T @ g_out, i.e. ``fused(D, g_out, g_hot)``.

Used on compiled TPU backends; CPU tests run it in interpret mode.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _pick_block(dim: int, preferred: int) -> int:
    """Largest power-of-two block <= preferred that divides ``dim``."""
    b = preferred
    while b > 128 and dim % b:
        b //= 2
    return b if dim % b == 0 else 0


def _kernel(d_ref, x_ref, xh_ref, out_ref, hot_ref, *, bk, prec):
    k_i = pl.program_id(1)

    d = d_ref[...]

    @pl.when(k_i == 0)
    def _init_out():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        d, xh_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when((pl.program_id(0) == 0) & (k_i == 0))
    def _init_hot():
        hot_ref[...] = jnp.zeros_like(hot_ref)

    upd = jax.lax.dot_general(
        d, x_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    sl = pl.ds(k_i * bk, bk)
    hot_ref[sl, :] = hot_ref[sl, :] + upd


def _call(d, x, xh, bn, bk, interpret):
    n, k = d.shape
    h = x.shape[1]
    prec = (
        jax.lax.Precision.HIGHEST
        if d.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    return pl.pallas_call(
        functools.partial(_kernel, bk=bk, prec=prec),
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bn, bk), lambda i, j: (i, j)),
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, h), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((k, h), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((k, h), jnp.float32),
        ],
        interpret=interpret,
    )(d, x, xh)


def _zero_cotangent(a):
    return (
        np.zeros(a.shape, jax.dtypes.float0)
        if not jnp.issubdtype(a.dtype, jnp.floating)
        else jnp.zeros_like(a)
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused(d, x, xh, bn, bk, interpret):
    return _call(d, x, xh, bn, bk, interpret)


def _fused_fwd(d, x, xh, bn, bk, interpret):
    return _call(d, x, xh, bn, bk, interpret), d


def _fused_bwd(bn, bk, interpret, d, g):
    g_out, g_hot = g
    # the same kernel with the skinny operands swapped (module docstring);
    # D is a constant adjacency block — its zero cotangent is DCE'd by XLA
    g_x, g_xh = _call(d, g_out.astype(d.dtype), g_hot.astype(d.dtype), bn, bk, interpret)
    return (_zero_cotangent(d), g_x, g_xh)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_dual(d, x, xh, *, bn=256, bk=4096, interpret=False):
    """``(D @ xh, D^T @ x)`` reading D once. Pads N and H up to block/lane
    multiples as needed (K must already be 128-aligned, which
    ops/hybrid.py's plan build guarantees); results are sliced back and
    always float32. Falls back to two XLA matmuls when no legal blocking
    exists (tiny shapes)."""
    n, k = d.shape
    h = x.shape[1]
    cd = d.dtype
    bk_ = _pick_block(k, bk)
    bn_ = _pick_block(n, bn) or bn
    h_pad = -(-h // 128) * 128
    n_pad = -(-n // bn_) * bn_
    if bk_ == 0 or k < 128:
        prec = (
            jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out = jnp.dot(d, xh, preferred_element_type=jnp.float32, precision=prec)
        hot = jax.lax.dot_general(
            d, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return out, hot

    x = x.astype(cd)
    xh = xh.astype(cd)
    if n_pad != n:
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)))
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    if h_pad != h:
        x = jnp.pad(x, ((0, 0), (0, h_pad - h)))
        xh = jnp.pad(xh, ((0, 0), (0, h_pad - h)))
    out, hot = _fused(d, x, xh, bn_, bk_, interpret)
    return out[:n, :h], hot[:, :h]
