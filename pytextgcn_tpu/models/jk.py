"""Jumping-Knowledge network (LSTM-attention fusion).

Re-design of the reference's ``JumpingKnowledgeNetwork`` (models.py:55-81):
a GCN stack whose per-layer activations are fused by torch-geometric's
``JumpingKnowledge(mode="lstm")`` — a bidirectional LSTM over the layer axis
with per-layer scalar attention — followed by an activation, dropout and a
linear head. The BiLSTM hidden size follows PyG's formula
``(num_layers * channels) // 2`` per direction.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.adjacency import NormAdj
from ..ops.features import NodeFeatures
from ..ops.spmm import pad_rows, spmm
from .layers import bilstm_apply, bilstm_init, dropout, gcnconv_init, linear_init


class JumpingKnowledgeNetwork:
    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        n_gcn: int = 2,
        n_hidden_gcn: int = 64,
        dropout: float = 0.5,
        activation: Callable = jax.nn.relu,
    ):
        assert n_gcn >= 2
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.n_gcn = n_gcn
        self.n_hidden = n_hidden_gcn
        self.dropout = dropout
        self.activation = activation

    def config_key(self):
        return (
            type(self).__name__, self.in_dim, self.out_dim,
            self.n_gcn, self.n_hidden, self.dropout, self.activation,
        )

    def init(self, key) -> dict:
        k_l, k_lstm, k_att, k_head = jax.random.split(key, 4)
        dims = [self.in_dim] + [self.n_hidden] * self.n_gcn
        keys = jax.random.split(k_l, self.n_gcn)
        lstm_hidden = (self.n_gcn * self.n_hidden) // 2
        return {
            "layers": [
                gcnconv_init(k, d_in, d_out)
                for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
            ],
            "lstm": bilstm_init(k_lstm, self.n_hidden, lstm_hidden),
            "att": linear_init(k_att, 2 * lstm_hidden, 1),
            "head": linear_init(k_head, self.n_hidden, self.out_dim),
        }

    def apply(self, params, adj: NormAdj, feats: NodeFeatures, *, train=False, rng=None):
        acts = []
        h = spmm(adj, pad_rows(adj, feats.matmul(params["layers"][0]["w"])))
        h = h + params["layers"][0]["b"]
        if train:
            rng, sub = jax.random.split(rng)
            h = dropout(sub, h, self.dropout, train)
        acts.append(h)
        for layer in params["layers"][1:]:
            h = spmm(adj, h @ layer["w"]) + layer["b"]
            # reference applies dropout after every layer (models.py:70-73)
            if train:
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, self.dropout, train)
            acts.append(h)

        xs = jnp.stack(acts, axis=1)  # [N, L, C]
        alpha = bilstm_apply(params["lstm"], xs)  # [N, L, 2H]
        score = alpha @ params["att"]["w"] + params["att"]["b"]  # [N, L, 1]
        score = jax.nn.softmax(score.squeeze(-1), axis=-1)  # [N, L]
        h = jnp.sum(xs * score[:, :, None], axis=1)  # [N, C]

        h = self.activation(h)
        if train:
            rng, sub = jax.random.split(rng)
            h = dropout(sub, h, self.dropout, train)
        return h @ params["head"]["w"] + params["head"]["b"]
