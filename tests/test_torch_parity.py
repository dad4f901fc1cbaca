"""Cross-framework parity: per-layer activations vs a torch implementation
of the reference formulation (BASELINE.md: 'Per-layer activations allclose
vs the reference formulation').

The torch model reimplements exactly what torch-geometric 1.6.3's GCNConv
computes under the reference's GCN (SURVEY.md §3.3): add self-loops with
weight 1, symmetric normalization from the edge weights, x @ W, scatter-add
aggregation over destinations, bias after aggregation, no inter-layer
activation, dropout only between layers. torch-geometric itself is not
installed here, so the formulation is written from the documented semantics
with plain torch ops — an implementation independent of both our JAX code
and the numpy oracle in test_gcn_parity.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from pytextgcn_tpu.core.graph import TextGraph
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops import NodeFeatures, NormAdj


def torch_gcnconv(x, src, dst, w, weight, bias):
    """One GCNConv layer (PyG 1.6.3 semantics) in plain torch."""
    n = x.shape[0]
    src2 = torch.cat([src, torch.arange(n)])
    dst2 = torch.cat([dst, torch.arange(n)])
    w2 = torch.cat([w, torch.ones(n, dtype=w.dtype)])
    deg = torch.zeros(n, dtype=x.dtype).scatter_add_(0, dst2, w2.to(x.dtype))
    dinv = deg.pow(-0.5)
    norm = dinv[src2] * w2.to(x.dtype) * dinv[dst2]
    xw = x @ weight
    out = torch.zeros_like(xw)
    out.scatter_add_(0, dst2.unsqueeze(1).expand(-1, xw.shape[1]), norm.unsqueeze(1) * xw[src2])
    return out + bias


def test_two_layer_activations_match_torch():
    rng = np.random.default_rng(7)
    n_vocab, n_docs, n_edges = 30, 40, 400
    n = n_vocab + n_docs
    src_np = rng.integers(0, n, n_edges).astype(np.int32)
    dst_np = rng.integers(0, n, n_edges).astype(np.int32)
    w_np = (rng.random(n_edges) + 0.1).astype(np.float32)
    g = TextGraph(
        edge_src=src_np, edge_dst=dst_np, edge_w=w_np,
        y=np.zeros(n, np.int32),
        train_mask=np.zeros(n, bool), val_mask=np.zeros(n, bool),
        test_mask=np.zeros(n, bool), n_vocab=n_vocab, n_docs=n_docs,
    )
    model = GCN(in_dim=n, out_dim=5, n_hidden_gcn=16)
    params = model.init(jax.random.PRNGKey(3))
    ours = np.asarray(
        model.apply(params, NormAdj.from_graph(g), NodeFeatures.from_graph(g), train=False)
    )

    # torch reference formulation, float64 for a tight tolerance
    x = torch.eye(n, dtype=torch.float64)
    src = torch.from_numpy(src_np.astype(np.int64))
    dst = torch.from_numpy(dst_np.astype(np.int64))
    w = torch.from_numpy(w_np).to(torch.float64)
    w1 = torch.from_numpy(np.asarray(params["layers"][0]["w"], np.float64))
    b1 = torch.from_numpy(np.asarray(params["layers"][0]["b"], np.float64))
    w2 = torch.from_numpy(np.asarray(params["layers"][1]["w"], np.float64))
    b2 = torch.from_numpy(np.asarray(params["layers"][1]["b"], np.float64))
    h = torch_gcnconv(x, src, dst, w, w1, b1)  # no inter-layer activation
    want = torch_gcnconv(h, src, dst, w, w2, b2).numpy()

    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_jk_forward_matches_torch_with_shared_params():
    """JumpingKnowledge correctness pin (VERDICT r2 item 2): the JAX
    BiLSTM-JK (models/jk.py) and an independent plain-torch implementation
    of PyG 1.6.3 JumpingKnowledge(mode='lstm') semantics
    (experiments/torch_reference.py, model='jk') produce allclose logits
    from the SAME parameters — pinning LSTM gate order, direction handling,
    attention softmax and head, not just shapes."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "experiments")
    )
    from torch_reference import train_torch_reference

    from pytextgcn_tpu.models import JumpingKnowledgeNetwork

    rng = np.random.default_rng(11)
    n_vocab, n_docs, n_edges, n_classes = 25, 35, 300, 4
    n = n_vocab + n_docs
    src_np = rng.integers(0, n, n_edges).astype(np.int32)
    dst_np = rng.integers(0, n, n_edges).astype(np.int32)
    w_np = (rng.random(n_edges) + 0.1).astype(np.float32)
    test_mask = np.zeros(n, bool)
    test_mask[n_vocab + 20 :] = True
    g = TextGraph(
        edge_src=src_np, edge_dst=dst_np, edge_w=w_np,
        y=np.concatenate([np.zeros(n_vocab, np.int32),
                          rng.integers(0, n_classes, n_docs).astype(np.int32)]),
        train_mask=~test_mask, val_mask=np.zeros(n, bool),
        test_mask=test_mask, n_vocab=n_vocab, n_docs=n_docs,
    )
    model = JumpingKnowledgeNetwork(n, n_classes, n_hidden_gcn=12)
    params = model.init(jax.random.PRNGKey(5))
    ours = np.asarray(
        model.apply(
            params, NormAdj.from_graph(g), NodeFeatures.from_graph(g),
            train=False,
        )
    )

    params_np = jax.tree.map(np.asarray, params)
    res = train_torch_reference(
        g, n_classes, epochs=0, n_hidden=12, model="jk", seed=0,
        init_params=params_np, return_forward=True, return_init=True,
    )
    theirs = res["predict"]()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # the import/export round-trip is lossless (layout transposes cancel)
    for a, b in zip(jax.tree.leaves(params_np), jax.tree.leaves(res["init"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
