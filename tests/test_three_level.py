"""Three-level per-level cascade (the DBpedia l1->l2->l3 protocol,
perlevel_dbpedia.py): level-3 eval must use level-2's softmax computed on
its GT-fed graph, and max_length truncation must flow through the build."""

import numpy as np

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.hierarchy import train_per_level
from pytextgcn_tpu.models import GCN


def test_three_level_cascade_with_max_length():
    docs, child, parent = synthetic_corpus(n_docs=150, n_classes=8, n_parents=4, seed=13)
    child = np.asarray(child)
    parent = np.asarray(parent)
    grand = parent % 2  # level-1 above the parents
    rng = np.random.default_rng(2)
    test_idx = rng.choice(len(docs), len(docs) // 5, replace=False)

    # DBpedia-style knobs: small window + max_length truncation
    t2g = Text2Graph(min_df=1, window_size=5, max_length=15)
    g = t2g.fit_transform(docs, child, test_idx=test_idx)
    assert t2g.cv.encode_documents(docs, 15).shape[1] <= 15

    res = train_per_level(
        g,
        [grand, parent, child],
        model_factory=lambda d_in, d_out: GCN(d_in, d_out, n_hidden_gcn=24, dropout=0.3),
        epochs=50,
        verbose=0,
    )
    assert len(res["trainers"]) == 3
    # level-2 and level-3 graphs carried the previous level's width
    assert res["trainers"][1]._feats.hierarchy.shape[1] == 2
    assert res["trainers"][2]._feats.hierarchy.shape[1] == 4
    assert res["metrics"]["accuracy"] >= 0.5, res["metrics"]
