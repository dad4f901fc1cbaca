"""Per-level cascade and per-label ensemble on a synthetic 2-level corpus."""

import numpy as np
import pytest

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.hierarchy import eval_per_label, train_per_label, train_per_level
from pytextgcn_tpu.models import GCN


@pytest.fixture(scope="module")
def hier_corpus():
    docs, child, parent = synthetic_corpus(
        n_docs=140, n_classes=4, n_parents=2, seed=11
    )
    n = len(docs)
    rng = np.random.default_rng(1)
    test_idx = rng.choice(n, n // 5, replace=False)
    t2g = Text2Graph(min_df=1, window_size=5)
    g = t2g.fit_transform(docs, child, test_idx=test_idx)
    return g, np.asarray(child), np.asarray(parent), test_idx


def test_per_level_cascade(hier_corpus):
    g, child, parent, _ = hier_corpus
    res = train_per_level(
        g,
        [parent, child],
        model_factory=lambda d_in, d_out: GCN(d_in, d_out, n_hidden_gcn=32, dropout=0.3),
        epochs=60,
        verbose=0,
    )
    assert len(res["trainers"]) == 2
    assert res["metrics"]["accuracy"] >= 0.6, res["metrics"]
    # level-2 graphs carried hierarchy features
    assert res["trainers"][1]._feats.hierarchy is not None


def test_per_label_ensemble(hier_corpus, tmp_path):
    g, child, parent, _ = hier_corpus
    out = train_per_label(
        g,
        child,
        parent,
        model_factory=lambda d_in, d_out: GCN(d_in, d_out, n_hidden_gcn=32, dropout=0.3),
        epochs=60,
        save_dir=str(tmp_path),
    )
    assert len(out["trainers"]) == 2
    # mapping covers all child classes exactly once
    all_children = sorted(c for v in out["mapping"].values() for c in v)
    assert all_children == sorted(np.unique(child).tolist())
    assert (tmp_path / "class_mapping.json").exists()
    assert (tmp_path / "lvl2-cat0.npz").exists()

    m_gt = eval_per_label(g, child, parent, out["trainers"], out["mapping"])
    assert m_gt["accuracy"] >= 0.6, m_gt
    # predicted-route variant also runs
    rng = np.random.default_rng(0)
    fake_parent_pred = parent.copy()
    flip = rng.random(len(parent)) < 0.1
    fake_parent_pred[flip] = 1 - fake_parent_pred[flip]
    m_pr = eval_per_label(
        g, child, parent, out["trainers"], out["mapping"],
        parent_pred=fake_parent_pred, route="predicted",
    )
    assert m_pr["accuracy"] <= m_gt["accuracy"] + 0.15


def test_checkpoint_roundtrip(tmp_path, hier_corpus):
    import jax

    g, child, parent, _ = hier_corpus
    from pytextgcn_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = GCN(g.in_dim, 4, n_hidden_gcn=8)
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "ck"), params, meta={"k": 1})
    loaded, _ = load_checkpoint(str(tmp_path / "ck"), params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ensemble_members_share_adjacency(hier_corpus):
    """Sequential per-label members differ only in labels/masks — they must
    share one prepared adjacency operator instead of rebuilding it."""
    from pytextgcn_tpu.hierarchy.perlabel import train_per_label
    from pytextgcn_tpu.models import GCN

    g, y_child, y_parent, _ = hier_corpus
    ens = train_per_label(
        g, y_child, y_parent,
        lambda i, o: GCN(i, o, n_hidden_gcn=8, dropout=0.0),
        epochs=2, seed=0,
    )
    adjs = {id(t._adj) for t in ens["trainers"]}
    assert len(adjs) == 1


def test_share_adjacency_guard_includes_f32_mode():
    """share_adjacency must refuse a donor with a different hybrid_f32_mode:
    a 'split2' trainer silently adopting a 'highest' plan (or vice versa)
    would defeat the knob's numeric contract (advisor r4, medium)."""
    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.train.trainer import Trainer

    model = GCN(8, 2, n_hidden_gcn=4)
    donor = Trainer(model, hybrid_k=16, hybrid_f32_mode="highest")
    donor._adj = object()  # stand-in for a prepared operator
    donor._adj_edge_src = donor._adj_edge_w = None
    donor._adj_n_nodes = 0

    taker = Trainer(model, hybrid_k=16, hybrid_f32_mode="split2")
    taker.share_adjacency(donor)
    assert taker._adj is None  # refused: mode differs

    same = Trainer(model, hybrid_k=16, hybrid_f32_mode="highest")
    same.share_adjacency(donor)
    assert same._adj is donor._adj  # accepted: settings match
