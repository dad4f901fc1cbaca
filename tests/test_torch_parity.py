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
