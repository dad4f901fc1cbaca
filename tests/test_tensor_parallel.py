"""Tensor-parallel EGCN embedding (parallel/tensor.py): the wide
Linear(in, 2000) weight (reference models.py:35-38) column-sharded over a
'model' mesh axis via GSPMD, trained through the standard Trainer.

Checks: (a) the sharded layout is what we asked for (embedding split, not
replicated), (b) a full Trainer.fit run under TP reproduces the
single-device run's parameters and test metrics, (c) gradients of one step
match — i.e. the all_reduce GSPMD inserts for the first contraction is the
correct collective.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import EGCN
from pytextgcn_tpu.parallel import apply_tp, tp_param_shardings
from pytextgcn_tpu.train import Trainer


def tiny_graph(n_vocab=40, n_docs=60, n_edges=600, n_classes=5, seed=0):
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    train_mask = np.zeros(n, bool)
    train_mask[n_vocab : n_vocab + 40] = True
    test_mask = np.zeros(n, bool)
    test_mask[n_vocab + 45 :] = True
    return TextGraph(
        edge_src=rng.integers(0, n, n_edges).astype(np.int32),
        edge_dst=rng.integers(0, n, n_edges).astype(np.int32),
        edge_w=(rng.random(n_edges) + 0.1).astype(np.float32),
        y=rng.integers(0, n_classes, n).astype(np.int32),
        train_mask=train_mask,
        val_mask=np.zeros(n, bool),
        test_mask=test_mask,
        n_vocab=n_vocab,
        n_docs=n_docs,
    )


def model_mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("model",))


def test_embedding_is_sharded():
    g = tiny_graph()
    model = EGCN(g.in_dim, 5, embedding_dim=64, n_hidden_gcn=16)
    params = model.init(jax.random.PRNGKey(0))
    mesh = model_mesh()
    sharded = apply_tp(params, mesh)
    w = sharded["embed"]["w"]
    assert w.sharding.spec == P(None, "model")
    # each device holds 1/8 of the columns
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(params["embed"]["w"].shape[0], 64 // 8)}
    assert sharded["layers"][0]["w"].sharding.spec == P("model", None)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_tp_training_matches_single_device(n_dev):
    g = tiny_graph()
    n_classes = 5

    def run(tp_mesh):
        model = EGCN(g.in_dim, n_classes, embedding_dim=64, n_hidden_gcn=16,
                     dropout=0.5)
        tr = Trainer(model, lr=0.05, seed=7, tp_mesh=tp_mesh)
        hist = tr.fit(g, epochs=8, n_classes=n_classes)
        return tr, hist

    tr_ref, hist_ref = run(None)
    tr_tp, hist_tp = run(model_mesh(n_dev))

    np.testing.assert_allclose(
        [h["loss"] for h in hist_tp], [h["loss"] for h in hist_ref],
        rtol=2e-4, atol=2e-5,
    )
    for a, b in zip(jax.tree.leaves(tr_tp.params), jax.tree.leaves(tr_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4)
    m_ref = tr_ref.evaluate(g, n_classes=n_classes)
    m_tp = tr_tp.evaluate(g, n_classes=n_classes)
    assert m_ref["accuracy"] == pytest.approx(m_tp["accuracy"], abs=1e-6)


def test_tp_gradients_match():
    from pytextgcn_tpu.ops import NodeFeatures, NormAdj
    from pytextgcn_tpu.train.metrics import masked_cross_entropy

    g = tiny_graph()
    model = EGCN(g.in_dim, 5, embedding_dim=64, n_hidden_gcn=16, dropout=0.0)
    params = model.init(jax.random.PRNGKey(1))
    adj = NormAdj.from_graph(g)
    feats = NodeFeatures.from_graph(g)
    y = jnp.asarray(g.y)
    mask = jnp.asarray(g.train_mask)

    def loss_fn(p):
        return masked_cross_entropy(model.apply(p, adj, feats, train=False), y, mask)

    grads_ref = jax.jit(jax.grad(loss_fn))(params)
    grads_tp = jax.jit(jax.grad(loss_fn))(apply_tp(params, model_mesh()))
    for a, b in zip(jax.tree.leaves(grads_tp), jax.tree.leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_tp_restore_reapplies_shardings(tmp_path):
    # regression: a restored TP trainer must not continue training with
    # fully replicated params/opt-state — fit re-applies the TP layout
    from pytextgcn_tpu.models import EGCN

    g = tiny_graph()
    mesh = model_mesh(4)

    def mk():
        return EGCN(g.in_dim, 5, embedding_dim=64, n_hidden_gcn=16, dropout=0.0)

    t = Trainer(mk(), lr=0.05, seed=1, tp_mesh=mesh)
    t.fit(g, epochs=3, n_classes=5)
    t.save(str(tmp_path / "ck"), epoch=3)

    t2 = Trainer(mk(), lr=0.05, seed=1, tp_mesh=mesh)
    start = t2.restore(str(tmp_path / "ck"))
    t2.fit(g, epochs=6, n_classes=5, start_epoch=start)

    def axis_names(x):
        return {n for s in x.sharding.spec if s for n in (s if isinstance(s, tuple) else (s,))}

    assert "model" in axis_names(t2.params["embed"]["w"])
    # the Adam moments of the embedding are sharded too
    import jax.tree_util as jtu

    shapes = {tuple(l.shape) for l in jtu.tree_leaves(t2.params)}
    emb_shape = tuple(np.shape(t2.params["embed"]["w"]))
    moment_shardings = [
        axis_names(l)
        for l in jtu.tree_leaves(t2.opt_state)
        if hasattr(l, "sharding") and tuple(l.shape) == emb_shape
    ]
    assert moment_shardings and all("model" in a for a in moment_shardings)

    # and the resumed trajectory still matches an uninterrupted one
    t3 = Trainer(mk(), lr=0.05, seed=1, tp_mesh=mesh)
    t3.fit(g, epochs=6, n_classes=5)
    for a, b in zip(jtu.tree_leaves(t2.params), jtu.tree_leaves(t3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
