"""End-to-end: synthetic corpus -> graph -> GCN training -> accuracy.

The SURVEY.md §4 takeaway (3): tiny-known-graph convergence test, in the
spirit of the reference's KarateClub training test (test_model.py:10-41) but
with assertions."""

import numpy as np
import pytest

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.models import GCN, MLP
from pytextgcn_tpu.models.mlp import SparseMatrix
from pytextgcn_tpu.train import Trainer


@pytest.fixture(scope="module")
def corpus_graph():
    docs, labels = synthetic_corpus(n_docs=160, n_classes=4, seed=3)
    n = len(docs)
    rng = np.random.default_rng(0)
    test_idx = rng.choice(n, n // 5, replace=False)
    val_idx = np.array([i for i in rng.choice(n, n // 5, replace=False) if i not in test_idx])
    t2g = Text2Graph(min_df=1, window_size=5, backend="device")
    g = t2g.fit_transform(docs, labels, test_idx=test_idx, val_idx=val_idx)
    return t2g, g, labels, test_idx


def test_graph_shape_invariants(corpus_graph):
    t2g, g, labels, _ = corpus_graph
    assert g.n_docs == len(labels)
    assert g.n_vocab == len(t2g.vocabulary)
    # word nodes excluded from every mask's train portion
    assert not bool(np.asarray(g.train_mask[: g.n_vocab]).any())
    # symmetric edge structure: each edge has a mirror
    src, dst = np.asarray(g.edge_src), np.asarray(g.edge_dst)
    fwd = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in fwd for a, b in fwd)


def test_gcn_learns_synthetic(corpus_graph):
    _, g, labels, _ = corpus_graph
    model = GCN(in_dim=g.in_dim, out_dim=4, n_hidden_gcn=32, dropout=0.3)
    trainer = Trainer(model, lr=0.05, seed=0)
    hist = trainer.fit(g, epochs=80, n_classes=4)
    assert hist[-1]["loss"] < hist[0]["loss"]
    m = trainer.evaluate(g, n_classes=4)
    assert m["accuracy"] >= 0.8, m


def test_mlp_learns_synthetic(corpus_graph):
    t2g, g, labels, test_idx = corpus_graph
    import jax, jax.numpy as jnp
    import optax

    x = SparseMatrix.from_scipy(t2g.tfidf_mat_)
    y = np.asarray(labels)
    model = MLP(in_dim=x.shape[1], out_dim=4, hidden=[64], dropout=0.3)
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    mask = np.ones(len(y), bool)
    mask[test_idx] = False

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(p, x, train=True, rng=rng)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, jnp.asarray(y)[:, None], axis=1)[:, 0]
            return jnp.sum(nll * mask) / mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    for i in range(150):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    logits = model.apply(params, x, train=False)
    pred = np.asarray(jnp.argmax(logits, axis=1))
    acc = (pred[test_idx] == y[test_idx]).mean()
    assert acc >= 0.8, acc


def test_graph_save_load_roundtrip(tmp_path, corpus_graph):
    _, g, _, _ = corpus_graph
    p = str(tmp_path / "g.npz")
    g.save(p)
    g2 = g.load(p)
    assert g2.n_vocab == g.n_vocab and g2.n_docs == g.n_docs
    np.testing.assert_array_equal(np.asarray(g2.edge_src), np.asarray(g.edge_src))
    np.testing.assert_allclose(np.asarray(g2.edge_w), np.asarray(g.edge_w))


def test_trainer_pallas_dtype_bf16(corpus_graph):
    """Trainer(pallas_dtype='bfloat16') threads the compute dtype into the
    aggregation plan (the 2x-on-chip mode, RESULTS.md) and still learns."""
    from pytextgcn_tpu.ops.hybrid import HybridPlan

    _, g, labels, _ = corpus_graph
    model = GCN(in_dim=g.in_dim, out_dim=4, n_hidden_gcn=32, dropout=0.3)
    trainer = Trainer(model, lr=0.05, seed=0, hybrid_k=16,
                      pallas_dtype="bfloat16")
    hist = trainer.fit(g, epochs=80, n_classes=4)
    adj, _ = trainer.prepare(g)
    assert isinstance(adj.plan, HybridPlan) and adj.plan.compute_dtype == "bfloat16"
    assert hist[-1]["loss"] < hist[0]["loss"]
    m = trainer.evaluate(g, n_classes=4)
    assert m["accuracy"] >= 0.8, m
