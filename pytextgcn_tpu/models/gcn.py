"""GCN and EGCN models.

Functional re-design of the reference models
(/root/reference/textgcn/lib/models.py:6-52): an N-layer GCNConv stack with
dropout between layers and — parity-critically — **no inter-layer
activation** (the reference comments the ReLU out at models.py:22,48; that
quirk is the default here, switchable via ``activation``).

Each "layer" is ``A_hat @ (X W) + b`` where ``A_hat`` is precomputed
(ops/adjacency.py) and the first layer exploits the implicit-identity
feature structure (ops/features.py): for identity features ``X W == W``, so
layer 1 is a single SpMM over the weight matrix itself.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.adjacency import NormAdj
from ..ops.features import NodeFeatures
from ..ops.spmm import pad_rows, spmm
from .layers import dropout, gcnconv_init, linear_init


class GCN:
    """2-layer (by default) graph convolutional network.

    Matches reference ``GCN(in_channels, out_channels, n_gcn=2,
    n_hidden_gcn=64, dropout=0.5)`` (models.py:6-25).
    """

    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        n_gcn: int = 2,
        n_hidden_gcn: int = 64,
        dropout: float = 0.5,
        activation: Optional[Callable] = None,
    ):
        assert n_gcn >= 2
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.n_gcn = n_gcn
        self.n_hidden = n_hidden_gcn
        self.dropout = dropout
        self.activation = activation  # None == reference parity (no act)

    def config_key(self):
        """Hashable identity of the computation this model traces — used to
        share jitted train steps across instances (e.g. the per-label
        ensemble trains many same-shaped classifiers; the remote-compile
        latency on tunneled TPUs makes re-tracing each one very costly)."""
        return (
            type(self).__name__,
            self.in_dim,
            self.out_dim,
            self.n_gcn,
            self.n_hidden,
            self.dropout,
            getattr(self, "embedding_dim", None),
            self.activation,
        )

    def init(self, key) -> dict:
        dims = [self.in_dim] + [self.n_hidden] * (self.n_gcn - 1) + [self.out_dim]
        keys = jax.random.split(key, self.n_gcn)
        return {
            "layers": [
                gcnconv_init(k, d_in, d_out)
                for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
            ]
        }

    def apply(
        self,
        params: dict,
        adj: NormAdj,
        feats: NodeFeatures,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        adj_out=None,
    ) -> jax.Array:
        """``adj_out``: optional output-row-restricted operator
        (ops/restricted.py) used for the FINAL layer's aggregation — the
        training fast path that skips all rows the masked loss never reads
        (returns [M, out_dim] for its M rows). Evaluation passes None."""
        layers = params["layers"]
        # layer 1: structured X @ W, then aggregate. pad_rows keeps sharded
        # activations at the padded row count end to end (ops/spmm.py)
        h = spmm(adj, pad_rows(adj, feats.matmul(layers[0]["w"]))) + layers[0]["b"]
        for i, layer in enumerate(layers[1:]):
            last = i == len(layers) - 2
            if self.activation is not None:
                h = self.activation(h)
            if train:
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, self.dropout, train)
            a = adj_out if (last and adj_out is not None) else adj
            h = spmm(a, h @ layer["w"]) + layer["b"]
        return h


class EGCN(GCN):
    """Embedding-GCN: dense embedding layer (Linear + SELU + dropout) in
    front of the GCN stack (models.py:28-52). With identity features the
    embedding ``X @ W_emb + b`` collapses to ``W_emb + b`` — no N x N matmul.
    """

    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        embedding_dim: int = 2000,
        n_gcn: int = 2,
        n_hidden_gcn: int = 64,
        dropout: float = 0.5,
        activation: Optional[Callable] = None,
    ):
        super().__init__(
            in_dim, out_dim, n_gcn, n_hidden_gcn, dropout, activation
        )
        self.embedding_dim = embedding_dim

    def init(self, key) -> dict:
        k_emb, k_gcn = jax.random.split(key)
        dims = [self.embedding_dim] + [self.n_hidden] * (self.n_gcn - 1) + [self.out_dim]
        keys = jax.random.split(k_gcn, self.n_gcn)
        return {
            "embed": linear_init(k_emb, self.in_dim, self.embedding_dim),
            "layers": [
                gcnconv_init(k, d_in, d_out)
                for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
            ],
        }

    def apply(self, params, adj, feats, *, train=False, rng=None, adj_out=None):
        h = pad_rows(adj, feats.matmul(params["embed"]["w"]) + params["embed"]["b"])
        h = jax.nn.selu(h)
        if train:
            rng, sub = jax.random.split(rng)
            h = dropout(sub, h, self.dropout, train)
        for i, layer in enumerate(params["layers"]):
            a = (
                adj_out
                if (adj_out is not None and i == len(params["layers"]) - 1)
                else adj
            )
            h = spmm(a, h @ layer["w"]) + layer["b"]
            # Reference quirk kept: EGCN's loop condition
            # ``i < len(self.layers) - 1`` over ``layers[1:]`` is always true
            # (models.py:46-50), so dropout hits every GCN layer — including
            # the logits.
            if self.activation is not None:
                h = self.activation(h)
            if train:
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, self.dropout, train)
        return h
