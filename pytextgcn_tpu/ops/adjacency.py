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

import numpy as np

from ..core.graph import TextGraph, gcn_normalize_np


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
    def from_graph(
        g: TextGraph, use_pallas: bool = False, pallas_dtype: str = "float32"
    ) -> "NormAdj":
        # normalization on host (numpy): one-time preprocessing; keeps all
        # device work inside jitted hot paths
        src = np.asarray(g.edge_src)
        dst = np.asarray(g.edge_dst)
        norm_w, self_w = gcn_normalize_np(src, dst, g.edge_w, g.n_nodes)
        plan = None
        if use_pallas:
            from .spmm_pallas import build_plan_from_arrays

            plan = build_plan_from_arrays(
                src, dst, norm_w, self_w, g.n_nodes, compute_dtype=pallas_dtype
            )
        return NormAdj(
            src=jnp.asarray(src),
            dst=jnp.asarray(dst),
            w=jnp.asarray(norm_w),
            self_w=jnp.asarray(self_w),
            n_nodes=g.n_nodes,
            plan=plan,
        )

    @property
    def n_edges(self) -> int:
        return int(self.src.shape[0])
