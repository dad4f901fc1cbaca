"""Training convergence on a fixed known graph — the reference trains its
GCN on torch-geometric's KarateClub fixture (test_model.py:10-41, no
assertions); here the same Zachary karate-club graph is embedded directly
and the test asserts convergence."""

import numpy as np
import jax.numpy as jnp

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.train import Trainer

# Zachary's karate club (public domain): 34 nodes, 78 undirected edges
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]
# community labels (instructor vs administrator factions, 2-community split)
KARATE_Y = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1], dtype=np.int32,
)


def test_gcn_trains_on_karate_club():
    e = np.array(KARATE_EDGES, np.int64)
    src = np.concatenate([e[:, 0], e[:, 1]]).astype(np.int32)
    dst = np.concatenate([e[:, 1], e[:, 0]]).astype(np.int32)
    n = 34
    train_mask = np.zeros(n, bool)
    train_mask[[0, 33, 5, 28]] = True  # few labeled nodes per community
    g = TextGraph(
        edge_src=src,
        edge_dst=dst,
        edge_w=np.ones(len(src), np.float32),
        y=KARATE_Y,
        train_mask=train_mask,
        val_mask=np.zeros(n, bool),
        test_mask=~train_mask,
        n_vocab=0,
        n_docs=n,
    )
    model = GCN(in_dim=n, out_dim=2, n_hidden_gcn=64, dropout=0.2)
    trainer = Trainer(model, lr=0.02, seed=0)
    hist = trainer.fit(g, epochs=100, n_classes=2)
    assert hist[-1]["loss"] < hist[0]["loss"]
    m = trainer.evaluate(g, n_classes=2)
    assert m["accuracy"] >= 0.85, m
