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
    data_fields=["x", "hierarchy"],
    meta_fields=["n_vocab", "n_docs"],
)
@dataclasses.dataclass
class NodeFeatures:
    """Either explicit dense features ``x`` [N, D], or implicit identity
    features (+ optional hierarchy columns on document rows)."""

    n_vocab: int
    n_docs: int
    x: Optional[jax.Array] = None
    hierarchy: Optional[jax.Array] = None  # [n_docs, F]

    @staticmethod
    def from_graph(g: TextGraph) -> "NodeFeatures":
        return NodeFeatures(
            n_vocab=g.n_vocab,
            n_docs=g.n_docs,
            x=None if g.x is None else jnp.asarray(g.x),
            hierarchy=None if g.hierarchy_feats is None else jnp.asarray(g.hierarchy_feats),
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
        out = w[:n]
        if self.hierarchy is not None:
            doc_part = self.hierarchy @ w[n:]
            out = out.at[self.n_vocab :].add(doc_part)
        return out
