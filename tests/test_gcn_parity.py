"""Per-layer activation parity vs a NumPy oracle of the reference
formulation (SURVEY.md §3.3: torch-geometric 1.6.3 GCNConv with
add_self_loops=True, symmetric normalization recomputed from edge weights,
x @ W then scatter-add aggregation then bias; NO inter-layer activation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN, EGCN, JumpingKnowledgeNetwork
from pytextgcn_tpu.ops import NodeFeatures, NormAdj
from pytextgcn_tpu.ops.spmm import spmm


def gcnconv_oracle(x, src, dst, w, W, b):
    """One GCNConv layer exactly as PyG 1.6.3 computes it."""
    n = x.shape[0]
    src2 = np.concatenate([src, np.arange(n)])
    dst2 = np.concatenate([dst, np.arange(n)])
    w2 = np.concatenate([w, np.ones(n, dtype=w.dtype)]).astype(np.float64)
    deg = np.zeros(n)
    np.add.at(deg, dst2, w2)
    dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-30)), 0.0)
    norm = dinv[src2] * w2 * dinv[dst2]
    xw = x.astype(np.float64) @ np.asarray(W, np.float64)
    out = np.zeros((n, xw.shape[1]))
    np.add.at(out, dst2, norm[:, None] * xw[src2])
    return out + np.asarray(b, np.float64)


def random_graph(rng, n_vocab=7, n_docs=9, n_edges=40):
    n = n_vocab + n_docs
    src = rng.integers(0, n, n_edges).astype(np.int32)
    dst = rng.integers(0, n, n_edges).astype(np.int32)
    w = rng.random(n_edges).astype(np.float32) + 0.1
    y = rng.integers(0, 3, n).astype(np.int32)
    test_mask = np.zeros(n, bool)
    test_mask[-3:] = True
    g = TextGraph(
        edge_src=jnp.asarray(src),
        edge_dst=jnp.asarray(dst),
        edge_w=jnp.asarray(w),
        y=jnp.asarray(y),
        train_mask=jnp.asarray(~test_mask),
        val_mask=jnp.asarray(np.zeros(n, bool)),
        test_mask=jnp.asarray(test_mask),
        n_vocab=n_vocab,
        n_docs=n_docs,
    )
    return g, src, dst, w


def test_spmm_matches_oracle_normalization():
    rng = np.random.default_rng(1)
    g, src, dst, w = random_graph(rng)
    n = g.n_nodes
    adj = NormAdj.from_graph(g)
    x = rng.standard_normal((n, 5)).astype(np.float32)
    got = np.asarray(spmm(adj, jnp.asarray(x)))
    want = gcnconv_oracle(x, src, dst, w, np.eye(5, dtype=np.float32), np.zeros(5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gcn_two_layer_parity_identity_features():
    rng = np.random.default_rng(2)
    g, src, dst, w = random_graph(rng)
    n = g.n_nodes
    model = GCN(in_dim=n, out_dim=3, n_hidden_gcn=8)
    params = model.init(jax.random.PRNGKey(0))
    adj = NormAdj.from_graph(g)
    feats = NodeFeatures.from_graph(g)
    got = np.asarray(model.apply(params, adj, feats, train=False))

    x = np.eye(n, dtype=np.float32)
    h = gcnconv_oracle(
        x, src, dst, w, params["layers"][0]["w"], params["layers"][0]["b"]
    )
    want = gcnconv_oracle(
        h, src, dst, w, params["layers"][1]["w"], params["layers"][1]["b"]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gcn_hierarchy_features_parity():
    rng = np.random.default_rng(3)
    g, src, dst, w = random_graph(rng)
    n = g.n_nodes
    hf = rng.random((g.n_docs, 4)).astype(np.float32)
    g = TextGraph(
        **{
            **{f: getattr(g, f) for f in (
                "edge_src", "edge_dst", "edge_w", "y",
                "train_mask", "val_mask", "test_mask", "n_vocab", "n_docs",
            )},
            "hierarchy_feats": jnp.asarray(hf),
        }
    )
    model = GCN(in_dim=n + 4, out_dim=3, n_hidden_gcn=8)
    params = model.init(jax.random.PRNGKey(1))
    got = np.asarray(
        model.apply(params, NormAdj.from_graph(g), NodeFeatures.from_graph(g), train=False)
    )

    # oracle: explicit [I | hf-padded] feature matrix (text2graph.py:226-246)
    x = np.concatenate(
        [np.eye(n, dtype=np.float32),
         np.concatenate([np.zeros((g.n_vocab, 4), np.float32), hf])],
        axis=1,
    )
    h = gcnconv_oracle(x, src, dst, w, params["layers"][0]["w"], params["layers"][0]["b"])
    want = gcnconv_oracle(h, src, dst, w, params["layers"][1]["w"], params["layers"][1]["b"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_egcn_and_jk_run():
    rng = np.random.default_rng(4)
    g, *_ = random_graph(rng)
    adj = NormAdj.from_graph(g)
    feats = NodeFeatures.from_graph(g)
    for model in (
        EGCN(g.n_nodes, 3, embedding_dim=12, n_hidden_gcn=8),
        JumpingKnowledgeNetwork(g.n_nodes, 3, n_gcn=3, n_hidden_gcn=8),
    ):
        params = model.init(jax.random.PRNGKey(0))
        out = model.apply(params, adj, feats, train=False)
        assert out.shape == (g.n_nodes, 3)
        assert bool(jnp.all(jnp.isfinite(out)))
        # train mode exercises dropout rng plumbing
        out_t = model.apply(params, adj, feats, train=True, rng=jax.random.PRNGKey(7))
        assert out_t.shape == (g.n_nodes, 3)
