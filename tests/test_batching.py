"""Neighborhood mini-batcher: a k-hop subgraph must reproduce the full-graph
GCN outputs at the batch nodes exactly (the property the reference's dead
TextGCNBatcher was aiming for)."""

import numpy as np
import jax
import jax.numpy as jnp

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.data.batching import NeighborhoodBatcher
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops import NodeFeatures, NormAdj


def make_graph(rng, n_vocab=40, n_docs=50, n_edges=600):
    n = n_vocab + n_docs
    train_mask = np.zeros(n, bool)
    train_mask[n_vocab : n_vocab + 30] = True
    return TextGraph(
        edge_src=rng.integers(0, n, n_edges).astype(np.int32),
        edge_dst=rng.integers(0, n, n_edges).astype(np.int32),
        edge_w=(rng.random(n_edges) + 0.1).astype(np.float32),
        y=rng.integers(0, 3, n).astype(np.int32),
        train_mask=train_mask,
        val_mask=np.zeros(n, bool),
        test_mask=np.zeros(n, bool),
        n_vocab=n_vocab,
        n_docs=n_docs,
    )


def test_subgraph_covers_and_matches_full_graph():
    rng = np.random.default_rng(0)
    g = make_graph(rng)
    n = g.n_nodes

    # full-graph 2-layer GCN logits (explicit dense features so the subgraph
    # can slice them)
    x_full = rng.standard_normal((n, 12)).astype(np.float32)
    model = GCN(in_dim=12, out_dim=3, n_hidden_gcn=8, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0))

    import dataclasses

    g_x = dataclasses.replace(g, x=x_full)
    full = np.asarray(
        model.apply(params, NormAdj.from_graph(g_x), NodeFeatures.from_graph(g_x), train=False)
    )

    batcher = NeighborhoodBatcher(g, batch_size=16, n_hops=2, shuffle=True, seed=1)
    assert len(batcher) == 2  # 30 seeds / 16
    seen = []
    for sub in batcher:
        real_nodes = sub.nodes[: sub.n_real_nodes]
        adj = sub.to_adj()  # globally-normalized weights: exact at batch nodes
        feats = NodeFeatures(
            n_vocab=0, n_docs=len(sub.nodes), x=jnp.asarray(x_full[np.maximum(sub.nodes, 0)])
        )
        out = np.asarray(model.apply(params, adj, feats, train=False))
        locs = sub.batch_local[sub.batch_local >= 0]
        global_ids = real_nodes[locs]
        seen.extend(global_ids.tolist())
        np.testing.assert_allclose(out[locs], full[global_ids], rtol=1e-4, atol=1e-5)
    assert sorted(seen) == sorted(np.flatnonzero(np.asarray(g.train_mask)).tolist())
