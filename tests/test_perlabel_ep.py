"""Expert-parallel per-label ensemble (train_per_label(mesh=...)).

The EP path trains every per-parent classifier in ONE vmapped, mesh-sharded
train step (SURVEY.md §2.4 EP row; the reference trains its 6 models strictly
sequentially, perlabel_amazon.py:90-155). Padding ragged class counts with
zero weight columns and -1e9 biases keeps padded logits at probability 0, so
the EP trajectory must equal the sequential one."""

import jax
import numpy as np
import pytest

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.hierarchy import eval_per_label, train_per_label
from pytextgcn_tpu.hierarchy.perlabel import _batched_member_preds
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def ragged_corpus():
    # 5 child classes over 2 parents -> ragged member class counts (3 and 2)
    docs, child, parent = synthetic_corpus(
        n_docs=150, n_classes=5, n_parents=2, seed=13
    )
    n = len(docs)
    rng = np.random.default_rng(2)
    test_idx = rng.choice(n, n // 5, replace=False)
    t2g = Text2Graph(min_df=1, window_size=5)
    g = t2g.fit_transform(docs, child, test_idx=test_idx)
    return g, np.asarray(child), np.asarray(parent)


def _mk(d_in, d_out):
    return GCN(d_in, d_out, n_hidden_gcn=16, dropout=0.5)


def test_ep_matches_sequential_ragged(ragged_corpus):
    g, child, parent = ragged_corpus
    seq = train_per_label(g, child, parent, _mk, epochs=25, seed=3)
    mesh = make_mesh(2, axis="ensemble")
    ep = train_per_label(g, child, parent, _mk, epochs=25, seed=3, mesh=mesh)

    assert ep["mapping"] == seq["mapping"]
    for ts, te in zip(seq["trainers"], ep["trainers"]):
        for a, b in zip(
            jax.tree_util.tree_leaves(ts.params), jax.tree_util.tree_leaves(te.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
            )

    m_seq = eval_per_label(g, child, parent, seq["trainers"], seq["mapping"])
    m_ep = eval_per_label(g, child, parent, ep["trainers"], ep["mapping"])
    assert m_seq["accuracy"] == pytest.approx(m_ep["accuracy"], abs=1e-6)


def test_ep_pads_members_to_mesh(ragged_corpus, tmp_path):
    # 2 parents on a 4-device mesh: dummy members padded in, results intact
    g, child, parent = ragged_corpus
    mesh = make_mesh(4, axis="ensemble")
    ep = train_per_label(
        g, child, parent, _mk, epochs=20, seed=3, mesh=mesh, save_dir=str(tmp_path)
    )
    assert len(ep["trainers"]) == 2
    assert (tmp_path / "class_mapping.json").exists()
    m = eval_per_label(g, child, parent, ep["trainers"], ep["mapping"])
    assert m["accuracy"] >= 0.5, m


def test_batched_eval_matches_member_loop(ragged_corpus):
    import dataclasses

    import jax.numpy as jnp

    g, child, parent = ragged_corpus
    out = train_per_label(g, child, parent, _mk, epochs=20, seed=1)
    trainers, mapping = out["trainers"], out["mapping"]
    c_list = [len(mapping[c]) for c in range(len(trainers))]

    y_nodes = np.zeros(g.n_nodes, np.int32)
    y_nodes[g.n_vocab :] = np.asarray(child, np.int32)
    g_eval = dataclasses.replace(g, y=y_nodes)

    batched = _batched_member_preds(g_eval, trainers, c_list)
    assert batched is not None and batched.shape == (len(trainers), g.n_docs)
    for c, t in enumerate(trainers):
        logits = t.predict_logits(g_eval)[g.n_vocab :]
        loop_pred = np.asarray(jnp.argmax(logits, axis=-1))
        np.testing.assert_array_equal(batched[c], loop_pred)


def test_ep_trainers_can_refit(ragged_corpus):
    # regression: the returned Trainers must carry a usable optimizer state
    # (sliced out of the vmapped EP state), so refitting continues training
    # instead of crashing on opt_state=None
    import dataclasses

    import jax.tree_util as jtu

    g, child, parent = ragged_corpus
    mesh = make_mesh(2, axis="ensemble")
    ep = train_per_label(g, child, parent, _mk, epochs=5, seed=3, mesh=mesh)
    seq = train_per_label(g, child, parent, _mk, epochs=5, seed=3)
    t, ts = ep["trainers"][0], seq["trainers"][0]
    assert t.opt_state is not None
    # sliced+truncated moment buffers match the sequential run's state
    for a, b in zip(jtu.tree_leaves(t.opt_state), jtu.tree_leaves(ts.opt_state)):
        assert np.shape(a) == np.shape(b)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    # refit on member-0's local label space (what the per-label pipeline
    # does when continuing a member) must run, not crash
    c0 = len(ep["mapping"][0])
    y_local = np.zeros(g.n_nodes, np.int32)
    doc_child = np.asarray(child)
    local = np.full_like(doc_child, 0)
    sel = np.asarray(parent) == 0
    local[sel] = np.searchsorted(np.unique(doc_child[sel]), doc_child[sel])
    y_local[g.n_vocab :] = local
    g_local = dataclasses.replace(g, y=y_local)
    hist = t.fit(g_local, epochs=3, n_classes=c0)
    assert len(hist) == 3


def test_ep_hybrid_matches_sequential(ragged_corpus):
    # hybrid_k in trainer_kwargs now applies INSIDE the vmapped EP step
    # (dense hot products batched across members, segment-path residual);
    # the trajectory must match the sequential hybrid run
    g, child, parent = ragged_corpus
    tk = {"hybrid_k": 64}
    seq = train_per_label(g, child, parent, _mk, epochs=20, seed=5,
                          trainer_kwargs=dict(tk))
    mesh = make_mesh(2, axis="ensemble")
    ep = train_per_label(g, child, parent, _mk, epochs=20, seed=5, mesh=mesh,
                         trainer_kwargs=dict(tk))
    assert ep["mapping"] == seq["mapping"]
    for ts, te in zip(seq["trainers"], ep["trainers"]):
        for a, b in zip(
            jax.tree_util.tree_leaves(ts.params),
            jax.tree_util.tree_leaves(te.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
            )
    m_seq = eval_per_label(g, child, parent, seq["trainers"], seq["mapping"])
    m_ep = eval_per_label(g, child, parent, ep["trainers"], ep["mapping"])
    assert m_seq["accuracy"] == pytest.approx(m_ep["accuracy"], abs=1e-6)
