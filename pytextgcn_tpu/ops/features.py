"""Structured node features.

The reference materializes an N x N (sparse) identity feature matrix with
optional per-document "hierarchy" columns hstacked on (text2graph.py:179,
226-246) and pushes it through a sparse-dense matmul in the first GCN layer.
On TPU that entire product is structure: ``I @ W == W`` and the hierarchy
block is a skinny dense matmul over document rows only. ``NodeFeatures``
carries that structure so the first layer costs O(n_docs * F * H) instead of
an N x N SpMM — the identity never exists.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.graph import TextGraph


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "hierarchy", "node_ids"],
    meta_fields=["n_vocab", "n_docs"],
)
@dataclasses.dataclass
class NodeFeatures:
    """Either explicit dense features ``x`` [N, D], or implicit identity
    features (+ optional hierarchy columns on document rows).

    ``node_ids`` restricts the implicit-identity form to a subgraph: row i
    is the feature row of *global* node ``node_ids[i]`` (padding: -1), so
    ``matmul`` becomes a row gather of the weight matrix — this is how
    mini-batched training (data/batching.py) keeps the first layer a
    gather instead of materializing any identity block."""

    n_vocab: int
    n_docs: int
    x: Optional[jax.Array] = None
    hierarchy: Optional[jax.Array] = None  # [n_docs, F]
    node_ids: Optional[jax.Array] = None  # [M] global ids, -1 = padding

    @staticmethod
    def from_graph(g: TextGraph) -> "NodeFeatures":
        return NodeFeatures(
            n_vocab=g.n_vocab,
            n_docs=g.n_docs,
            x=None if g.x is None else jnp.asarray(g.x),
            hierarchy=None if g.hierarchy_feats is None else jnp.asarray(g.hierarchy_feats),
        )

    def subgraph(self, node_ids) -> "NodeFeatures":
        """Features for the subgraph whose local row i is global node
        ``node_ids[i]``. Keeps the global ``in_dim`` (model params are
        global); explicit features are sliced, implicit ones deferred to
        a gather in :meth:`matmul`."""
        ids = jnp.asarray(node_ids)
        if self.x is not None:
            return NodeFeatures(
                n_vocab=self.n_vocab,
                n_docs=self.n_docs,
                x=self.x[jnp.maximum(ids, 0)],
            )
        return NodeFeatures(
            n_vocab=self.n_vocab,
            n_docs=self.n_docs,
            hierarchy=self.hierarchy,
            node_ids=ids,
        )

    @property
    def n_nodes(self) -> int:
        return self.n_vocab + self.n_docs

    @property
    def in_dim(self) -> int:
        if self.x is not None:
            return int(self.x.shape[1])
        extra = 0 if self.hierarchy is None else int(self.hierarchy.shape[1])
        return self.n_nodes + extra

    def matmul(self, w: jax.Array) -> jax.Array:
        """``X @ w`` without materializing X. ``w``: [in_dim, H]."""
        if self.x is not None:
            return self.x @ w
        n = self.n_nodes
        if self.node_ids is not None:
            ids = jnp.maximum(self.node_ids, 0)
            out = w[ids]
            if self.hierarchy is not None:
                is_doc = (ids >= self.n_vocab) & (self.node_ids >= 0)
                hrows = self.hierarchy[
                    jnp.clip(ids - self.n_vocab, 0, self.n_docs - 1)
                ]
                out = out + jnp.where(is_doc[:, None], hrows @ w[n:], 0.0)
            return out
        out = w[:n]
        if self.hierarchy is not None:
            doc_part = self.hierarchy @ w[n:]
            out = out.at[self.n_vocab :].add(doc_part)
        return out
