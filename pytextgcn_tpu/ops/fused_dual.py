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


# ---------------------------------------------------------------- v2 kernels
#
# Round-5 rework of the dual product (VERDICT r4 item 1). Two changes:
#
# 1. TRANSPOSE-FREE LAYOUT. v1's ``D^T @ x`` contracts over D's dim 0
#    (``(((0,), (0,)), ...)``), which Mosaic lowers by transposing the
#    [bn, bk] D block in VMEM every grid step — the per-block cost that
#    made v1 "MXU-compute-bound" at ~14.7 TF/s f32 / 23.5 TF/s bf16
#    (module docstring above). v2 accumulates the hot product in [H, K]
#    layout instead: ``hotT += x^T @ D`` puts the transpose on the SMALL
#    [bn, H] x block, and the MXU sees natural contractions on both
#    products. One [H_pad, K] transpose outside the kernel (2 MB at
#    K=4096) restores the consumer layout.
#
# 2. EXPLICIT hi/lo bf16 SPLIT ('split2' f32 mode, ops/spmm_pallas.py).
#    XLA's f32 HIGHEST runs 3 bf16 passes from f32 VMEM operands at the
#    measured ~31 TF/s; splitting D and the skinny operands into
#    (hi, lo) bf16 pairs on the host/in XLA lets the same 3-pass product
#    (hi*hi + hi*lo + lo*hi, dropping the ~2^-18-relative lo*lo term)
#    run as DEFAULT-precision bf16 dots at the MXU's native bf16 rate
#    (probed 176 TF/s), with f32 accumulation throughout. D ships as two
#    bf16 arrays — same total HBM bytes as one f32 D, read ONCE.


def _kernel_t(d_ref, x_ref, xh_ref, out_ref, hotT_ref, *, bk, prec):
    """v1 semantics with the transpose-free [H, K] hot accumulator."""
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
        hotT_ref[...] = jnp.zeros_like(hotT_ref)

    upd = jax.lax.dot_general(  # (H, bk) = x^T @ D — transposes the SMALL block
        x_ref[...], d, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    sl = pl.ds(k_i * bk, bk)
    hotT_ref[:, sl] = hotT_ref[:, sl] + upd


def _kernel_split(dhi_ref, dlo_ref, xhi_ref, xlo_ref, xhhi_ref, xhlo_ref,
                  out_ref, hotT_ref, *, bk):
    """hi/lo bf16 3-pass dual product (split2-class f32: drops lo*lo)."""
    k_i = pl.program_id(1)
    dhi = dhi_ref[...]
    dlo = dlo_ref[...]
    dn = (((1,), (0,)), ((), ()))
    dt = (((0,), (0,)), ((), ()))
    P = jax.lax.Precision.DEFAULT
    f32 = jnp.float32

    @pl.when(k_i == 0)
    def _init_out():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += (
        jax.lax.dot_general(dhi, xhhi_ref[...], dn, preferred_element_type=f32,
                            precision=P)
        + jax.lax.dot_general(dhi, xhlo_ref[...], dn, preferred_element_type=f32,
                              precision=P)
        + jax.lax.dot_general(dlo, xhhi_ref[...], dn, preferred_element_type=f32,
                              precision=P)
    )

    @pl.when((pl.program_id(0) == 0) & (k_i == 0))
    def _init_hot():
        hotT_ref[...] = jnp.zeros_like(hotT_ref)

    upd = (
        jax.lax.dot_general(xhi_ref[...], dhi, dt, preferred_element_type=f32,
                            precision=P)
        + jax.lax.dot_general(xlo_ref[...], dhi, dt, preferred_element_type=f32,
                              precision=P)
        + jax.lax.dot_general(xhi_ref[...], dlo, dt, preferred_element_type=f32,
                              precision=P)
    )
    sl = pl.ds(k_i * bk, bk)
    hotT_ref[:, sl] = hotT_ref[:, sl] + upd


def split_bf16(a):
    """f32 -> (hi, lo) bf16 pair with ``hi + lo`` capturing ~16 significand
    bits (relative representation error ~2^-18, the split2 class).

    The rounding step MUST be ``lax.reduce_precision``: the naive
    ``a.astype(bf16).astype(f32)`` convert round-trip gets folded away by
    XLA on real TPU backends (measured: the lo half silently became zero
    and the chip probe saw 1.8e-3 error — one bf16 pass — instead of the
    2e-5 split2 band; interpret mode on CPU did NOT fold, which is why
    tests alone missed it). reduce_precision has explicit
    rounding semantics XLA cannot elide."""
    hi_f32 = jax.lax.reduce_precision(a, exponent_bits=8, mantissa_bits=7)
    hi = hi_f32.astype(jnp.bfloat16)  # exact: already bf16-representable
    lo = (a - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _call_t(d, x, xh, bn, bk, interpret):
    n, k = d.shape
    h = x.shape[1]
    prec = (
        jax.lax.Precision.HIGHEST
        if d.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out, hotT = pl.pallas_call(
        functools.partial(_kernel_t, bk=bk, prec=prec),
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bn, bk), lambda i, j: (i, j)),
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, h), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((h, k), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((h, k), jnp.float32),
        ],
        interpret=interpret,
    )(d, x, xh)
    return out, hotT.T


def _call_split(dhi, dlo, x, xh, bn, bk, interpret):
    n, k = dhi.shape
    h = x.shape[1]
    xhi, xlo = split_bf16(x)
    xhhi, xhlo = split_bf16(xh)
    out, hotT = pl.pallas_call(
        functools.partial(_kernel_split, bk=bk),
        grid=(n // bn, k // bk),
        in_specs=[
            pl.BlockSpec((bn, bk), lambda i, j: (i, j)),
            pl.BlockSpec((bn, bk), lambda i, j: (i, j)),
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, h), lambda i, j: (j, 0)),
            pl.BlockSpec((bk, h), lambda i, j: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, h), lambda i, j: (i, 0)),
            pl.BlockSpec((h, k), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h), jnp.float32),
            jax.ShapeDtypeStruct((h, k), jnp.float32),
        ],
        interpret=interpret,
    )(dhi, dlo, xhi, xlo, xhhi, xhlo)
    return out, hotT.T


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_t(d, x, xh, bn, bk, interpret):
    return _call_t(d, x, xh, bn, bk, interpret)


def _fused_t_fwd(d, x, xh, bn, bk, interpret):
    return _call_t(d, x, xh, bn, bk, interpret), d


def _fused_t_bwd(bn, bk, interpret, d, g):
    g_out, g_hot = g
    g_x, g_xh = _call_t(d, g_out.astype(d.dtype), g_hot.astype(d.dtype),
                        bn, bk, interpret)
    return (_zero_cotangent(d), g_x, g_xh)


_fused_t.defvjp(_fused_t_fwd, _fused_t_bwd)


def fused_dual_t(d, x, xh, *, bn=256, bk=2048, interpret=False):
    """v1 semantics through the transpose-free v2 layout (_kernel_t):
    same dtypes/precision policy as :func:`fused_dual`, hot accumulated
    as [H, K] in-kernel and transposed once outside."""
    n, k = d.shape
    h = x.shape[1]
    cd = d.dtype
    bk_ = _pick_block(k, bk)
    bn_ = _pick_block(n, bn) or bn
    h_pad = -(-h // 128) * 128
    n_pad = -(-n // bn_) * bn_
    if bk_ == 0 or k < 128:
        return fused_dual(d, x, xh, bn=bn, bk=bk, interpret=interpret)
    x = x.astype(cd)
    xh = xh.astype(cd)
    if n_pad != n:
        d = jnp.pad(d, ((0, n_pad - n), (0, 0)))
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    if h_pad != h:
        x = jnp.pad(x, ((0, 0), (0, h_pad - h)))
        xh = jnp.pad(xh, ((0, 0), (0, h_pad - h)))
    out, hot = _fused_t(d, x, xh, bn_, bk_, interpret)
    return out[:n, :h], hot[:, :h]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_split(dhi, dlo, x, xh, bn, bk, interpret):
    return _call_split(dhi, dlo, x, xh, bn, bk, interpret)


def _fused_split_fwd(dhi, dlo, x, xh, bn, bk, interpret):
    return _call_split(dhi, dlo, x, xh, bn, bk, interpret), (dhi, dlo)


def _fused_split_bwd(bn, bk, interpret, res, g):
    dhi, dlo = res
    g_out, g_hot = g
    # same kernel, skinny operands swapped: g_x = D @ g_hot, g_xh = D^T @ g_out
    g_x, g_xh = _call_split(dhi, dlo, g_out, g_hot, bn, bk, interpret)
    return (_zero_cotangent(dhi), _zero_cotangent(dlo), g_x, g_xh)


_fused_split.defvjp(_fused_split_fwd, _fused_split_bwd)


def fused_dual_split(dhi, dlo, x, xh, *, bn=256, bk=2048, interpret=False):
    """``(D @ xh, D^T @ x)`` with D = dhi + dlo (bf16 pair), reading the pair
    once, all MXU passes native bf16 with f32 accumulation (split2-class
    precision: ~2^-18 relative, same license as the residual's split2 mode).
    Pads N/H like :func:`fused_dual`; K must be 128-aligned and divisible by
    a legal bk (guaranteed by ops/hybrid.py's plan build for K >= 128).

    Default geometry 256x2048: the chip sweep winner 256x4096
    (docs/probe_dense_split_r5.log: 4.42 ms/app vs the XLA f32-HIGHEST
    dual's 6.09, 1.38x) fits VMEM standalone but blows the 16 MB scoped
    limit by 3 MB once the VJP's operand set double-buffers inside a real
    train step (bench r5a); 256x2048 is within 5% (4.64 ms/app) and
    compiles everywhere."""
    n, k = dhi.shape
    h = x.shape[1]
    bk_ = _pick_block(k, bk)
    bn_ = _pick_block(n, bn) or bn
    h_pad = -(-h // 128) * 128
    n_pad = -(-n // bn_) * bn_
    if bk_ == 0 or k < 128:
        # tiny-K fallback: reconstruct f32 D and use plain XLA HIGHEST dots
        d = dhi.astype(jnp.float32) + dlo.astype(jnp.float32)
        out = jnp.dot(d, xh, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        hot = jax.lax.dot_general(
            d, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return out, hot
    if n_pad != n:
        dhi = jnp.pad(dhi, ((0, n_pad - n), (0, 0)))
        dlo = jnp.pad(dlo, ((0, n_pad - n), (0, 0)))
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    if h_pad != h:
        x = jnp.pad(x, ((0, 0), (0, h_pad - h)))
        xh = jnp.pad(xh, ((0, 0), (0, h_pad - h)))
    out, hot = _fused_split(dhi, dlo, x, xh, bn_, bk_, interpret)
    return out[:n, :h], hot[:, :h]


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
