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
        g: TextGraph,
        use_pallas: bool = False,
        pallas_dtype: str = "float32",
        hybrid_k=None,
        hybrid_fused: Optional[bool] = None,
        hybrid_resid: str = "pallas",
        hybrid_batch: int = 1,
        plan_cache: Optional[str] = None,
        hybrid_f32_mode: Optional[str] = None,
    ) -> "NormAdj":
        """``hybrid_k``: enable the dense-hot/sparse-cold decomposition
        (ops/hybrid.py) with a hot set of that size ('auto' = cost-model
        choice, may fall back to the requested pure path). Implies the
        Pallas kernel for the cold residual. ``hybrid_fused``: force the
        one-pass-over-D fused dual kernel on/off (None = backend default,
        see ops/hybrid.build_hybrid_plan). ``hybrid_resid``: 'pallas' |
        'segment' | 'auto' — how the cold-cold residual executes (segment
        is vmappable; the EP ensemble step uses it). ``hybrid_batch``:
        models applying this operator per step (EP ensembles) — biases
        the auto-K choice toward larger hot sets. ``plan_cache``:
        directory for persisted hybrid plans (ops/plan_cache.py) — a warm
        process skips host-side plan construction, keyed by an edge
        fingerprint + build parameters. ``hybrid_f32_mode``: f32 MXU
        strategy for the cold residual tile kernel — 'highest' (3-pass
        exact-parity default) or 'split2' (two exact bf16 passes, ~3e-6
        max rel error, chip-measured ~26% faster residual; None = the
        RESID_F32_MODE default in ops/spmm_pallas.py)."""
        # normalization on host (numpy): one-time preprocessing; keeps all
        # device work inside jitted hot paths
        src = np.asarray(g.edge_src)
        dst = np.asarray(g.edge_dst)
        norm_w, self_w = gcn_normalize_np(src, dst, g.edge_w, g.n_nodes)
        plan = None
        if hybrid_k == 0:  # explicit 0 = decomposition off (same contract as
            hybrid_k = None  # build_hybrid_plan) -> segment path unless use_pallas
        if hybrid_k is not None:
            from .plan_cache import load_or_build

            plan = load_or_build(
                plan_cache, g, src, dst, norm_w, hot_k=hybrid_k,
                compute_dtype=pallas_dtype, fused=hybrid_fused,
                resid_mode=hybrid_resid, batch=hybrid_batch,
                resid_f32_mode=hybrid_f32_mode,
                # symmetric normalization preserves construction-guaranteed
                # weight symmetry -> the cheap randomized audit suffices
                validate="fast" if getattr(g, "weight_symmetric", False) else True,
            )
        if plan is None and (use_pallas or hybrid_k is not None):
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
