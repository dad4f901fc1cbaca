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


def test_subgraph_features_implicit_identity_and_hierarchy():
    """NodeFeatures.subgraph: the weight-row gather (+hierarchy block) must
    equal slicing the full implicit-identity product at the subgraph rows."""
    rng = np.random.default_rng(3)
    n_vocab, n_docs, fdim, h = 30, 20, 4, 8
    n = n_vocab + n_docs
    hier = rng.standard_normal((n_docs, fdim)).astype(np.float32)
    feats = NodeFeatures(
        n_vocab=n_vocab, n_docs=n_docs, hierarchy=jnp.asarray(hier)
    )
    w = jnp.asarray(rng.standard_normal((n + fdim, h)).astype(np.float32))
    full = np.asarray(feats.matmul(w))

    nodes = np.array([2, 7, 29, 30, 31, 49, -1, -1], np.int64)  # padded
    sub = np.asarray(feats.subgraph(jnp.asarray(nodes)).matmul(w))
    assert sub.shape == (len(nodes), h)
    np.testing.assert_allclose(sub[:6], full[nodes[:6]], rtol=1e-6, atol=1e-7)


def test_minibatch_training_single_batch_equals_full_batch():
    """fit_minibatch with one batch spanning every train doc (and n_hops =
    model depth) must reproduce full-batch fit exactly — same init, same
    optimizer trajectory, dropout off."""
    from pytextgcn_tpu.train import Trainer

    rng = np.random.default_rng(1)
    g = make_graph(rng)

    def make_trainer():
        return Trainer(GCN(g.in_dim, 3, n_hidden_gcn=8, dropout=0.0), lr=0.05, seed=5)

    tr_full = make_trainer()
    tr_full.fit(g, epochs=5, n_classes=3)

    n_train = int(np.sum(np.asarray(g.train_mask)))
    tr_mb = make_trainer()
    hist = tr_mb.fit_minibatch(g, epochs=5, batch_size=n_train, n_hops=2, n_classes=3)
    assert len(hist) == 5
    for a, b in zip(jax.tree.leaves(tr_mb.params), jax.tree.leaves(tr_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_minibatch_training_converges():
    """Real mini-batches (several per epoch, shuffled, dropout on) must fit
    the training documents."""
    from pytextgcn_tpu.train import Trainer
    from pytextgcn_tpu.train.metrics import accuracy

    rng = np.random.default_rng(2)
    g = make_graph(rng, n_vocab=40, n_docs=60, n_edges=500)
    tr = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.1), lr=0.05, seed=0)
    hist = tr.fit_minibatch(g, epochs=40, batch_size=8, n_classes=3)
    assert hist[-1]["loss"] < hist[0]["loss"]

    logits = tr.predict_logits(g)
    pred = jnp.argmax(logits, axis=-1)
    acc = float(accuracy(pred, jnp.asarray(g.y), jnp.asarray(g.train_mask)))
    assert acc > 0.9
