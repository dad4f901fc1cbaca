"""Sparse-dense matmul (neighborhood aggregation) dispatch.

``spmm(adj, x)`` computes ``A_hat @ x`` for the normalized adjacency:
``out[i] = self_w[i] * x[i] + sum_{e: dst[e]==i} w[e] * x[src[e]]``.

This is the per-epoch hot op — the role torch-scatter's CUDA kernels play
under torch-geometric's GCNConv in the reference (SURVEY.md §2.3 item 2).
Two execution paths:

* XLA path (default): gather + ``segment_sum``. Fully differentiable; XLA
  transposes the scatter into a gather for the backward pass.
* Pallas path (``adj.plan`` present): tiled one-hot-matmul segment reduction
  on the MXU (see spmm_pallas.py), with a custom VJP that reuses the kernel
  on the transpose plan (A_hat is symmetric, but the plan differs because the
  edge tiling is destination-sorted).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .adjacency import NormAdj


def spmm_segment(adj: NormAdj, x: jax.Array) -> jax.Array:
    """XLA gather/segment_sum aggregation."""
    contrib = adj.w[:, None] * jnp.take(x, adj.src, axis=0)
    agg = jax.ops.segment_sum(contrib, adj.dst, num_segments=adj.n_nodes)
    return agg + adj.self_w[:, None] * x


def pad_rows(adj, x: jax.Array) -> jax.Array:
    """Pad [N, H] activations to the row-sharded family's padded row count.

    The sharded appliers (halo / hybrid-sharded / restricted-sharded) are
    same-rows-in/same-rows-out: fed ``adj.n_pad`` rows they skip their
    internal pad AND their output slice. That slice is the expensive part —
    ``out[:n]`` of a row-sharded array with n % devices != 0 has no
    expressible sharding, so GSPMD re-materializes it REPLICATED with a
    full [n_pad, H] all-gather on every SpMM (caught by the compiled-HLO
    audit, experiments/benchmark_scaling.py --audit-comm; it doubled the
    halo path's measured wire volume at bench scale). Models call this once
    on the layer-1 pre-aggregation input so every sharded activation stays
    padded end to end; the pad rows are exact zeros through every row-wise
    op, and the trainer pads labels/masks to match (pads masked False).
    Single-chip operators have no ``n_pad`` — identity there."""
    n_pad = getattr(adj, "n_pad", None)
    if n_pad is not None and x.shape[0] != n_pad:
        x = jnp.pad(x, ((0, n_pad - x.shape[0]), (0, 0)))
    return x


def spmm(adj, x: jax.Array) -> jax.Array:
    from ..parallel.halo import HaloAdj, spmm_halo
    from ..parallel.hybrid_sharded import HybridShardedAdj, spmm_hybrid_sharded
    from ..parallel.restricted_sharded import (
        RestrictedShardedAdj,
        spmm_restricted_sharded,
    )
    from ..parallel.sharded import ShardedAdj, spmm_sharded
    from .restricted import RestrictedAdj, spmm_restricted

    if isinstance(adj, RestrictedAdj):
        return spmm_restricted(adj, x)
    if isinstance(adj, RestrictedShardedAdj):
        return spmm_restricted_sharded(adj, x)
    if isinstance(adj, HybridShardedAdj):
        return spmm_hybrid_sharded(adj, x)
    if isinstance(adj, HaloAdj):
        return spmm_halo(adj, x)
    if isinstance(adj, ShardedAdj):
        return spmm_sharded(adj, x)
    if adj.plan is not None:
        from .hybrid import HybridPlan, spmm_hybrid

        if isinstance(adj.plan, HybridPlan):
            return spmm_hybrid(adj.plan, x) + adj.self_w[:, None] * x
        from .spmm_pallas import spmm_pallas

        return spmm_pallas(adj.plan, x) + adj.self_w[:, None] * x
    return spmm_segment(adj, x)
