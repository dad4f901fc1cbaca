"""Normalized adjacency operator.

Precomputes ``A_hat = D^-1/2 (A + I) D^-1/2`` once per graph — the reference
recomputes this inside every GCNConv forward via torch-geometric's
``gcn_norm`` (SURVEY.md §3.3); for a static graph that is pure waste, so the
TPU-native design hoists it into graph finalization. Self-loops are carried
as a separate diagonal vector (a fused elementwise op at apply time) instead
of E extra edges.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.graph import TextGraph, gcn_normalize


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "dst", "w", "self_w", "plan"],
    meta_fields=["n_nodes"],
)
@dataclasses.dataclass
class NormAdj:
    """Symmetrically normalized adjacency in COO form + self-loop diagonal.

    ``plan`` optionally holds a Pallas execution plan (tiled/padded edge
    layout) built by :mod:`pytextgcn_tpu.ops.spmm_pallas`; when present the
    SpMM runs in the Pallas kernel, otherwise through XLA segment ops.
    """

    src: jax.Array
    dst: jax.Array
    w: jax.Array
    self_w: jax.Array
    n_nodes: int
    plan: Optional[object] = None

    @staticmethod
    def from_graph(g: TextGraph, use_pallas: bool = False) -> "NormAdj":
        norm_w, self_w = gcn_normalize(g.edge_src, g.edge_dst, g.edge_w, g.n_nodes)
        adj = NormAdj(
            src=g.edge_src,
            dst=g.edge_dst,
            w=norm_w,
            self_w=self_w,
            n_nodes=g.n_nodes,
        )
        if use_pallas:
            from .spmm_pallas import build_plan

            adj = dataclasses.replace(adj, plan=build_plan(adj))
        return adj

    @property
    def n_edges(self) -> int:
        return int(self.src.shape[0])
