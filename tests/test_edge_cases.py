"""Edge cases: empty-after-filtering documents, short docs, missing splits."""

import numpy as np
import pytest

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.build.windows import word_word_edges
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.train import Trainer


def test_doc_shorter_than_window_and_empty_doc():
    docs = [
        "aa bb cc dd",
        "zz",  # becomes empty: 'zz' below min_df
        "aa bb aa bb cc dd aa",
        "ee ff ee ff gg",
        "ee gg ff",
    ]
    t2g = Text2Graph(min_df=2, window_size=20, rm_stopwords=False)
    g = t2g.fit_transform(docs, [0, 0, 0, 1, 1], test_idx=[4])
    assert g.n_docs == 5
    # empty doc still exists as a node with no word edges into it
    assert g.n_edges > 0


def test_no_val_split_trains():
    docs = ["aa bb cc"] * 10 + ["dd ee ff"] * 10
    t2g = Text2Graph(min_df=1, window_size=3, rm_stopwords=False)
    g = t2g.fit_transform(docs, [0] * 10 + [1] * 10, test_idx=[0, 10], val_idx=None)
    model = GCN(g.in_dim, 2, n_hidden_gcn=8, dropout=0.0)
    tr = Trainer(model, lr=0.05)
    hist = tr.fit(g, epochs=15, n_classes=2)
    assert np.isfinite(hist[-1]["loss"])
    m = tr.evaluate(g, n_classes=2)
    assert m["accuracy"] == 1.0


@pytest.mark.parametrize("backend", ["oracle", "native", "device"])
def test_single_token_corpus(backend):
    X = np.array([[0], [0]], dtype=np.int32)
    coo, w, nw = word_word_edges(X, 1, 5, backend=backend)
    assert nw == 2  # one j==0 window per doc
    assert coo.shape[0] == 0  # no off-diagonal pairs


def test_all_padding_rows():
    X = np.full((3, 4), -1, dtype=np.int32)
    coo, w, nw = word_word_edges(X, 2, 2, backend="oracle")
    assert nw == 3 and coo.shape[0] == 0
    coo2, w2, nw2 = word_word_edges(X, 2, 2, backend="device")
    assert nw2 == 3 and coo2.shape[0] == 0
