"""Pallas SpMM kernel vs the XLA segment path (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.ops import NormAdj, NodeFeatures
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment


def make_adj(rng, n_nodes=700, n_edges=5000, use_pallas=True):
    src = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    dst = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    w = (rng.random(n_edges).astype(np.float32) + 0.05)
    g = TextGraph(
        edge_src=jnp.asarray(src),
        edge_dst=jnp.asarray(dst),
        edge_w=jnp.asarray(w),
        y=jnp.zeros(n_nodes, jnp.int32),
        train_mask=jnp.zeros(n_nodes, bool),
        val_mask=jnp.zeros(n_nodes, bool),
        test_mask=jnp.zeros(n_nodes, bool),
        n_vocab=n_nodes // 2,
        n_docs=n_nodes - n_nodes // 2,
    )
    return NormAdj.from_graph(g, use_pallas=use_pallas)


def test_pallas_forward_matches_segment():
    rng = np.random.default_rng(0)
    adj = make_adj(rng)
    x = jnp.asarray(rng.standard_normal((adj.n_nodes, 40)).astype(np.float32))
    got = spmm(adj, x)  # pallas path (plan present)
    want = spmm_segment(adj, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_pallas_gradient_matches_segment():
    rng = np.random.default_rng(1)
    adj = make_adj(rng, n_nodes=300, n_edges=1500)
    x = jnp.asarray(rng.standard_normal((adj.n_nodes, 16)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((adj.n_nodes, 16)).astype(np.float32))

    def loss_pallas(x):
        return jnp.sum((spmm(adj, x) - tgt) ** 2)

    def loss_segment(x):
        return jnp.sum((spmm_segment(adj, x) - tgt) ** 2)

    g_pallas = jax.grad(loss_pallas)(x)
    g_segment = jax.grad(loss_segment)(x)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_segment), rtol=1e-4, atol=1e-4
    )


def test_pallas_inside_jit_and_empty_rows():
    rng = np.random.default_rng(2)
    # skewed graph: many empty rows, hub nodes
    n = 520
    src = rng.integers(0, 10, 4000).astype(np.int32)
    dst = np.concatenate([rng.integers(0, 5, 3500), rng.integers(0, n, 500)]).astype(
        np.int32
    )
    w = rng.random(4000).astype(np.float32)
    g = TextGraph(
        edge_src=jnp.asarray(src),
        edge_dst=jnp.asarray(dst),
        edge_w=jnp.asarray(w),
        y=jnp.zeros(n, jnp.int32),
        train_mask=jnp.zeros(n, bool),
        val_mask=jnp.zeros(n, bool),
        test_mask=jnp.zeros(n, bool),
        n_vocab=n // 2,
        n_docs=n - n // 2,
    )
    adj = NormAdj.from_graph(g, use_pallas=True)
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    got = jax.jit(lambda a, b: spmm(a, b))(adj, x)
    want = spmm_segment(adj, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_tile_geometry_and_f32_mode_variants():
    """Non-default tile geometries and the 'split2' f32 strategy agree with
    the scatter oracle (VERDICT r3 item 6: the residual kernel's cost is
    passes * 2 * row_block * h_pad flops per slot, so hybrid residual plans
    shrink both knobs — chip-swept in experiments/probe_resid_kernel.py).
    'highest' stays f32-exact (~1e-7); 'split2' trades two exact-one-hot
    bf16 passes for ~2^-18 representation error."""
    from pytextgcn_tpu.ops.spmm_pallas import _build_tile_plan, _spmm_pallas

    rng = np.random.default_rng(3)
    n, e, h = 700, 5000, 37
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n, h)).astype(np.float32)
    want = np.zeros((n, h), np.float64)
    np.add.at(want, dst, w[:, None].astype(np.float64) * x[src])
    want_g = np.zeros((n, h), np.float64)
    np.add.at(want_g, src, w[:, None].astype(np.float64) * np.ones((e, h)))
    scale = np.abs(want).max()

    for rb, et, mode, tol in [
        (256, 1024, "highest", 1e-6),
        (128, 512, "highest", 1e-6),
        (128, 1024, "split2", 2e-5),
        (128, 512, "split2", 2e-5),
        (64, 256, "split2", 2e-5),
    ]:
        f = _build_tile_plan(src, dst, w, n, row_block=rb, edge_tile=et,
                             f32_mode=mode)
        b = _build_tile_plan(dst, src, w, n, row_block=rb, edge_tile=et,
                             f32_mode=mode)
        assert (f.row_block, f.edge_tile, f.f32_mode) == (rb, et, mode)
        got = np.asarray(
            jax.jit(lambda x, f, b: _spmm_pallas(x, f, b, jnp.float32))(
                jnp.asarray(x), f, b
            )
        )
        assert np.abs(got - want).max() / scale < tol, (rb, et, mode)
        g = jax.grad(
            lambda x: _spmm_pallas(x, f, b, jnp.float32).sum()
        )(jnp.asarray(x))
        assert np.abs(np.asarray(g) - want_g).max() / np.abs(want_g).max() < tol


def test_resid_geometry_resolves_per_mode():
    """Per-mode residual geometry (chip-swept, probe_resid_kernel.py):
    'highest' wants a small row block (its 3 passes make row_block the flop
    knob), split2/bf16 share the cheaper-pass winner; bf16 plans ignore the
    f32 mode entirely; an unknown f32 mode raises up front instead of
    silently running the 'highest' path under the wrong label (advisor r4)."""
    import jax.numpy as jnp
    import pytest

    from pytextgcn_tpu.ops import spmm_pallas as sp

    assert sp.resid_geometry("float32", "highest") == sp.RESID_GEOMS["highest"]
    assert sp.resid_geometry("float32", "split2") == sp.RESID_GEOMS["split2"]
    assert sp.resid_geometry(jnp.bfloat16, "highest") == sp.RESID_GEOMS["bf16"]
    assert sp.resid_geometry(jnp.bfloat16, "split2") == sp.RESID_GEOMS["bf16"]
    with pytest.raises(ValueError, match="resid_f32_mode"):
        sp.resid_geometry("float32", "nonesuch")
