"""Sharded hybrid SpMM (parallel/hybrid_sharded.py): dense-hot MXU blocks per
shard + halo'd cold residual must equal the single-device SpMM forward and
backward, keep activations row-sharded, and move only O(K + halo) rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops.adjacency import NormAdj
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment
from pytextgcn_tpu.parallel import (
    HybridShardedAdj,
    build_hybrid_sharded_adj,
    make_mesh,
)
from pytextgcn_tpu.train import Trainer


def _sym_graph(n_vocab=300, n_docs=200, n_edges=8000, seed=0):
    # symmetric pairs with Zipfian endpoints, like a real normalized adjacency
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    p = 1.0 / np.arange(1, n + 1) ** 1.1
    p /= p.sum()
    a = rng.choice(n, n_edges // 2, p=p).astype(np.int32)
    b = rng.choice(n, n_edges // 2, p=p).astype(np.int32)
    w_half = (rng.random(n_edges // 2) + 0.05).astype(np.float32)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    w = np.concatenate([w_half, w_half])
    zeros = np.zeros(n, bool)
    tm = zeros.copy()
    tm[n_vocab:] = True
    return TextGraph(
        edge_src=src, edge_dst=dst, edge_w=w,
        y=rng.integers(0, 3, n).astype(np.int32),
        train_mask=tm, val_mask=zeros, test_mask=zeros,
        n_vocab=n_vocab, n_docs=n_docs,
    )


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_hybrid_sharded_forward_matches_single(n_dev):
    g = _sym_graph(seed=n_dev)
    mesh = make_mesh(n_dev)
    adj = build_hybrid_sharded_adj(g, mesh, hot_k=128)
    assert isinstance(adj, HybridShardedAdj)
    adj_ref = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((g.n_nodes, 12)), jnp.float32
    )
    got = jax.jit(spmm)(adj, x)
    ref = spmm_segment(adj_ref, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_hybrid_sharded_gradient_matches_single():
    g = _sym_graph(seed=7)
    mesh = make_mesh(4)
    adj = build_hybrid_sharded_adj(g, mesh, hot_k=128)
    adj_ref = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    ct = jnp.asarray(
        np.random.default_rng(3).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    g_h = jax.jit(jax.grad(lambda v: jnp.vdot(spmm(adj, v), ct)))(x)
    g_ref = jax.grad(lambda v: jnp.vdot(spmm_segment(adj_ref, v), ct))(x)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_ref), rtol=2e-5, atol=2e-5)


def test_hybrid_sharded_empty_residual():
    # K covers every node: the residual halo carries only the self-loop term
    g = _sym_graph(n_vocab=40, n_docs=40, n_edges=1200, seed=11)
    mesh = make_mesh(4)
    adj = build_hybrid_sharded_adj(g, mesh, hot_k=g.n_nodes)
    adj_ref = NormAdj.from_graph(g)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((g.n_nodes, 8)), jnp.float32
    )
    got = jax.jit(spmm)(adj, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(spmm_segment(adj_ref, x)), rtol=2e-5, atol=2e-5
    )


def test_hybrid_sharded_comm_volume():
    """The comm model must match what XLA actually compiles (r5: the old
    model counted each buffer once; ring accounting fixed it and the HLO
    audit is now the source of truth), and at an N >> K scale the hybrid
    wire volume stays below the all_gather replication it replaces."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "experiments"))
    from benchmark_scaling import hlo_collective_bytes

    from pytextgcn_tpu.ops.spmm import pad_rows, spmm

    g = _sym_graph(n_vocab=800, n_docs=800, n_edges=20000, seed=5)
    mesh = make_mesh(8)
    adj = build_hybrid_sharded_adj(g, mesh, hot_k=128)
    h = 128
    fn = jax.jit(lambda a, v: spmm(a, pad_rows(a, v)))
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((g.n_nodes, h)), jnp.float32)
    txt = fn.lower(adj, x).compile().as_text()
    wire = hlo_collective_bytes(txt, 8)
    model_bytes = adj.comm_rows_per_device * h * 4
    assert abs(wire["total"] - model_bytes) / model_bytes < 0.02, (
        wire, model_bytes)

    # scale property: at N >> K the hybrid stays below all_gather
    # replication even with honest ring accounting
    g2 = _sym_graph(n_vocab=4000, n_docs=4000, n_edges=40000, seed=5)
    adj2 = build_hybrid_sharded_adj(g2, mesh, hot_k=128)
    assert adj2.comm_rows_per_device < (8 - 1) * adj2.rows_per, (
        adj2.comm_rows_per_device, (8 - 1) * adj2.rows_per)


def test_hybrid_sharded_end_to_end_training():
    g = _sym_graph(seed=9)
    mesh = make_mesh(4)
    t_hs = Trainer(
        GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5),
        seed=4, mesh=mesh, halo=True, hybrid_k=128,
    )
    t_ref = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5), seed=4)
    h_hs = t_hs.fit(g, epochs=10, n_classes=3)
    h_ref = t_ref.fit(g, epochs=10, n_classes=3)
    np.testing.assert_allclose(
        [r["loss"] for r in h_hs], [r["loss"] for r in h_ref], rtol=5e-4, atol=1e-5
    )
    m = t_hs.evaluate(g, n_classes=3)
    assert 0.0 <= m["accuracy"] <= 1.0


def test_hybrid_sharded_auto_fallback():
    # hot_k='auto' on a tiny uniform graph: build returns None and the
    # Trainer falls back to the pure halo plan (still trains correctly)
    rng = np.random.default_rng(13)
    n_vocab, n_docs, n_edges = 30, 30, 400
    n = n_vocab + n_docs
    a = rng.integers(0, n, n_edges // 2).astype(np.int32)
    b = rng.integers(0, n, n_edges // 2).astype(np.int32)
    w_half = (rng.random(n_edges // 2) + 0.05).astype(np.float32)
    zeros = np.zeros(n, bool)
    tm = zeros.copy()
    tm[n_vocab:] = True
    g = TextGraph(
        edge_src=np.concatenate([a, b]), edge_dst=np.concatenate([b, a]),
        edge_w=np.concatenate([w_half, w_half]),
        y=rng.integers(0, 3, n).astype(np.int32),
        train_mask=tm, val_mask=zeros, test_mask=zeros,
        n_vocab=n_vocab, n_docs=n_docs,
    )
    mesh = make_mesh(4)
    t = Trainer(
        GCN(g.in_dim, 3, n_hidden_gcn=8, dropout=0.0),
        seed=1, mesh=mesh, halo=True, hybrid_k="auto",
    )
    hist = t.fit(g, epochs=3, n_classes=3)
    assert np.isfinite(hist[-1]["loss"])


def test_hybrid_sharded_k_zero_means_off():
    # explicit hot_k=0 must disable the hot set (None -> pure halo path),
    # not build a degenerate 1-column dense block
    from pytextgcn_tpu.parallel.hybrid_sharded import build_hybrid_sharded_adj
    from pytextgcn_tpu.parallel import make_mesh

    g = _sym_graph()
    mesh = make_mesh(2)
    assert build_hybrid_sharded_adj(g, mesh, hot_k=0) is None


def test_hybrid_sharded_fused_matches_single():
    # the fused per-shard D kernel must reproduce the single-device SpMM
    # (forward and gradient) exactly like the two-matmul sharded path
    from pytextgcn_tpu.parallel import make_mesh
    from pytextgcn_tpu.parallel.hybrid_sharded import (
        build_hybrid_sharded_adj,
        spmm_hybrid_sharded,
    )

    g = _sym_graph(seed=5)
    adj_ref = NormAdj.from_graph(g)
    mesh = make_mesh(4)
    adj_f = build_hybrid_sharded_adj(g, mesh, hot_k=128, fused=True)
    assert adj_f is not None and adj_f.fused
    assert adj_f.d_blk.shape[1] % 512 == 0  # per-shard rows padded at build

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 32)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((g.n_nodes, 32)), jnp.float32)
    ref = spmm_segment(adj_ref, x)
    got = jax.jit(lambda v: spmm_hybrid_sharded(adj_f, v))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda v: jnp.vdot(spmm_segment(adj_ref, v), t))(x)
    g_got = jax.jit(jax.grad(lambda v: jnp.vdot(spmm_hybrid_sharded(adj_f, v), t)))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=2e-5, atol=2e-5)
