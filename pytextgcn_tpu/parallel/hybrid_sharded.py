"""Sharded hybrid SpMM: dense-hot MXU blocks per shard + halo'd cold residual.

Single-device, the hybrid decomposition (ops/hybrid.py) is the fastest
parity-exact aggregation path on TPU — it routes every edge incident to the
K hottest nodes through dense matmuls at streaming bandwidth. This module is
its multi-chip form, keeping activations **row-sharded end to end** like the
halo path (parallel/halo.py) while the dense blocks ride each chip's MXU:

* the ``D[n, k] = Σ w(hot_k → n)`` matrix is row-partitioned with the output
  rows — shard ``d`` holds ``D[d*rows_per:(d+1)*rows_per]``; its ``D_d @
  x_hot`` needs only the replicated (K, H) hot activations,
* ``x_hot`` is assembled with ONE small collective: each shard contributes
  its owned hot rows (padded to the max per-shard hot count) to an
  ``all_gather`` of ~K rows total — a few MB, vs the full [N, H] activation
  the naive sharded path gathers,
* the hot-destination term ``Dᵀ @ x`` is a contraction over ALL nodes:
  every shard computes its partial ``D_dᵀ @ x_d`` (K, H) and one ``psum``
  combines them — again K·H, not N·H, on the wire,
* the cold-cold residual (typically <10% of edges on Zipfian text graphs)
  and the self-loop diagonal ride the existing boundary-row halo exchange
  (build_halo_core) — its ppermutes and the dense matmuls are all one XLA
  computation, free for the scheduler to overlap.

Per SpMM per device the wire carries O(K·H + halo rows · H) — independent of
N — so the graph-size ceiling is HBM for the shard's D block and edges, not
replication. Everything inside shard_map is plain differentiable XLA
(matmuls, takes, psum, ppermute), so jax.grad composes. With ``fused=True``
the two shard-local D products run through the one-pass-over-D Pallas
kernel (ops/fused_dual.py, custom VJP — still composes under shard_map),
halving each shard's D traffic.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.graph import TextGraph, gcn_normalize_np
from .halo import HaloAdj, build_halo_core, spmm_halo
from .sharded import put_global, replicate_global


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["d_blk", "hot_rows", "hot_ranks", "a_hh", "hot_unpack", "halo_res"],
    meta_fields=[
        "n_nodes", "rows_per", "k", "k_max", "mesh", "axis", "compute_dtype",
        "fused",
    ],
)
@dataclasses.dataclass
class HybridShardedAdj:
    """Row-partitioned hot/cold decomposition of a normalized adjacency.

    d_blk:      [D, rows_per, K] this shard's rows of the dense hot matrix
                (compute_dtype).
    hot_rows:   [D, k_max] local row ids of the hot nodes this shard owns
                (padded with rows_per — clipped on gather, dropped on
                scatter via a rows_per+1 extension row).
    hot_ranks:  [D, k_max] the global hot rank of each of those nodes
                (padding garbage: its scatter lands on the dropped row).
    a_hh:       [K, K] hot-hot block, replicated.
    hot_unpack: [K] position of hot rank r in the concatenated
                (D * k_max)-row all_gather buffer, replicated.
    halo_res:   HaloAdj over the cold-cold residual edges, carrying the
                true self-loop diagonal (so the residual term contributes
                ``self_w ⊙ x`` exactly once).
    """

    d_blk: jax.Array
    hot_rows: jax.Array
    hot_ranks: jax.Array
    a_hh: jax.Array
    hot_unpack: jax.Array
    halo_res: HaloAdj
    n_nodes: int
    rows_per: int
    k: int
    k_max: int
    mesh: Mesh
    axis: str
    compute_dtype: str = "float32"
    fused: bool = False

    @property
    def n_shards(self) -> int:
        return int(self.d_blk.shape[0])

    @property
    def n_pad(self) -> int:
        return self.rows_per * self.n_shards

    @property
    def comm_rows_per_device(self) -> int:
        """Rows on the wire per SpMM per device, with ring-collective
        accounting (r5: the round-4 version counted each buffer once and
        under-stated the hybrid mode ~2x at d>=4 — caught by the compiled-HLO
        audit, experiments/benchmark_scaling.py --audit-comm):

        * hot all_gather of the (D * k_max)-row padded buffer moves
          (D-1) * k_max rows per device on a ring,
        * the psum'd (K, H) partial costs 2 * K * (D-1)/D (ring
          reduce-scatter + all-gather),
        * the residual halo permutes exactly its boundary rows.

        Still O(K + halo rows), independent of N."""
        d = self.n_shards
        return (
            (d - 1) * self.k_max
            + 2 * self.k * (d - 1) // d
            + self.halo_res.comm_rows_per_device
        )


def build_hybrid_sharded_adj(
    g: TextGraph,
    mesh: Mesh,
    axis: str = "graph",
    hot_k="auto",
    compute_dtype: str = "float32",
    h_hint: int = 128,
    fused: Optional[bool] = None,
) -> Optional[HybridShardedAdj]:
    """Host-side build. Returns None when the cost model says the hot set
    is not worth it (caller falls back to the pure halo path)."""
    from ..ops.hybrid import (
        _scatter_dense_block,
        check_weight_symmetric,
        check_weight_symmetric_fast,
        choose_hot_k,
    )

    d = mesh.shape[axis]
    src = np.asarray(g.edge_src, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    norm_w, self_w = gcn_normalize_np(src, dst, np.asarray(g.edge_w), g.n_nodes)
    n_nodes = g.n_nodes

    itemsize = jnp.dtype(compute_dtype).itemsize
    if fused is None:
        # conservatively off until revalidated on the target chip (same
        # policy as ops/hybrid.build_hybrid_plan)
        fused = False
    auto = hot_k == "auto"
    if auto:
        hot_k = choose_hot_k(src, n_nodes, h=h_hint, itemsize=itemsize, dst=dst,
                             d_reads=1 if fused else 2)
    if not hot_k:  # 0/None disables the hot set (same contract as
        return None  # ops/hybrid.build_hybrid_plan) -> pure halo path
    k = int(min(hot_k, n_nodes))
    if k >= 128:
        k = (k // 128) * 128
    k = max(1, k)

    deg = np.bincount(src, minlength=n_nodes)
    order = np.argsort(-deg, kind="stable")
    hot_ids = np.sort(order[:k]).astype(np.int64)
    hot_rank = np.full(n_nodes, -1, np.int64)
    hot_rank[hot_ids] = np.arange(k)

    rows_per = -(-n_nodes // d)  # must match build_halo_core's partition
    n_pad = rows_per * d

    src_hot = hot_rank[src] >= 0
    dst_hot = hot_rank[dst] >= 0
    # like the single-device hybrid: the hot-destination D^T term is exact
    # only for weight-symmetric adjacencies; under 'auto' fall back to the
    # pure halo path (exact for any operator), raise only for a forced K
    try:
        if getattr(g, "weight_symmetric", False):
            # construction-guaranteed (Text2Graph): O(E) randomized audit
            check_weight_symmetric_fast(src, dst, norm_w, n_nodes)
        else:
            check_weight_symmetric(src, dst, norm_w, sel=src_hot | dst_hot)
    except ValueError:
        if auto:
            import warnings

            warnings.warn(
                "hybrid_k='auto': adjacency is not weight-symmetric; "
                "falling back to the pure halo-exchange path",
                stacklevel=2,
            )
            return None
        raise

    # dense block, built once into the padded row space then row-sharded;
    # same backend switch as ops/hybrid.py — host np.add.at costs minutes
    # at bench scale on this lazily page-backed host, the jitted scatter
    # seconds (and XLA CPU scatter is ~40x slower than np.add.at, so CPU
    # test meshes keep the host path)
    sel = src_hot
    cd = jnp.dtype(compute_dtype)
    if jax.default_backend() == "cpu":
        d_full = np.zeros((n_pad, k), np.float32)
        np.add.at(d_full, (dst[sel], hot_rank[src[sel]]), norm_w[sel])
        a_hh = jnp.asarray(d_full[hot_ids], cd)
        d_full = jnp.asarray(d_full, cd)
    else:
        d_full, a_hh = _scatter_dense_block(
            jnp.asarray(dst[sel], jnp.int32),
            jnp.asarray(hot_rank[src[sel]], jnp.int32),
            jnp.asarray(norm_w[sel], jnp.float32),
            jnp.asarray(hot_ids, jnp.int32),
            n_rows=n_pad,
            k=k,
            compute_dtype=compute_dtype,
        )

    # per-shard hot ownership (hot_ids ascending => per-shard runs are
    # contiguous slices)
    shard_of_hot = hot_ids // rows_per
    counts = np.bincount(shard_of_hot, minlength=d)
    k_max = max(1, int(counts.max()))
    hot_rows = np.full((d, k_max), rows_per, np.int32)  # pad -> dropped row
    hot_ranks = np.zeros((d, k_max), np.int32)
    hot_unpack = np.zeros(k, np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for dev in range(d):
        lo, hi = starts[dev], starts[dev + 1]
        m = hi - lo
        hot_rows[dev, :m] = hot_ids[lo:hi] - dev * rows_per
        hot_ranks[dev, :m] = np.arange(lo, hi)
        hot_unpack[lo:hi] = dev * k_max + np.arange(m)

    rsel = ~src_hot & ~dst_hot
    halo_res = build_halo_core(
        src[rsel], dst[rsel], norm_w[rsel], self_w, n_nodes, mesh, axis
    )

    d_blk = jnp.asarray(d_full).reshape(d, rows_per, k)
    if fused:
        # the fused kernel wants row-block-aligned shard blocks; pad each
        # shard's rows once at build (zero rows — out is sliced per shard)
        rows_fd = -(-rows_per // 512) * 512
        if rows_fd != rows_per:
            d_blk = jnp.pad(d_blk, ((0, 0), (0, rows_fd - rows_per), (0, 0)))

    return HybridShardedAdj(
        d_blk=put_global(mesh, P(axis), d_blk),
        hot_rows=put_global(mesh, P(axis), hot_rows),
        hot_ranks=put_global(mesh, P(axis), hot_ranks),
        a_hh=replicate_global(mesh, a_hh),
        hot_unpack=replicate_global(mesh, hot_unpack),
        halo_res=halo_res,
        n_nodes=n_nodes,
        rows_per=rows_per,
        k=k,
        k_max=k_max,
        mesh=mesh,
        axis=axis,
        compute_dtype=compute_dtype,
        fused=bool(fused),
    )


def spmm_hybrid_sharded(adj: HybridShardedAdj, x: jax.Array) -> jax.Array:
    """``A_hat @ x`` with row-sharded activations: dense hot blocks on each
    shard's MXU, K-row collectives, halo'd cold residual."""
    rows_per, axis = adj.rows_per, adj.axis
    n, h = x.shape
    cd = jnp.dtype(adj.compute_dtype)
    precision = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    x_pad = x if n == adj.n_pad else jnp.pad(x, ((0, adj.n_pad - n), (0, 0)))
    x_pad = jax.lax.with_sharding_constraint(
        x_pad, jax.sharding.NamedSharding(adj.mesh, P(axis, None))
    )

    def local(x_blk, d_blk, hot_rows, hot_ranks, a_hh, unpack):
        d_blk, hot_rows, hot_ranks = d_blk[0], hot_rows[0], hot_ranks[0]
        xc = x_blk.astype(cd)
        # assemble the replicated (K, H) hot activations: one k_max-row
        # all_gather (pad index rows_per clips to the last row; junk rows
        # are never referenced by `unpack`)
        mine = jnp.take(xc, hot_rows, axis=0, mode="clip")
        allh = jax.lax.all_gather(mine, axis, axis=0, tiled=True)
        x_hot = jnp.take(allh, unpack, axis=0)

        if adj.fused:
            # both shard-local D products in one pass over the shard's
            # (row-padded) D block (ops/fused_dual.py)
            from ..ops.fused_dual import fused_dual
            from ..ops.spmm_pallas import _use_interpret

            rows_fd = d_blk.shape[0]
            x_in = (
                jnp.pad(xc, ((0, rows_fd - rows_per), (0, 0)))
                if rows_fd != rows_per
                else xc
            )
            out, part = fused_dual(
                d_blk, x_in, x_hot, interpret=_use_interpret()
            )
            out = out[:rows_per]
        else:
            out = jnp.dot(d_blk, x_hot, preferred_element_type=jnp.float32,
                          precision=precision)
            # hot destinations: per-shard partial contraction
            part = jax.lax.dot_general(
                d_blk, xc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
        hot_in = jax.lax.psum(part, axis) - jnp.dot(
            a_hh, x_hot, preferred_element_type=jnp.float32, precision=precision
        )
        vals = jnp.take(hot_in, hot_ranks, axis=0)
        ext = jnp.zeros((rows_per + 1, vals.shape[1]), out.dtype)
        ext = ext.at[hot_rows].add(vals)  # padded index rows_per -> dropped
        return out + ext[:rows_per]

    fn = jax.shard_map(
        local,
        mesh=adj.mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    dense = fn(x_pad, adj.d_blk, adj.hot_rows, adj.hot_ranks, adj.a_hh,
               adj.hot_unpack)
    # residual + self-loop diagonal (handles its own padding/slicing);
    # bf16 mode propagates so the residual's wire/multiply dtype matches
    # the dense half (accumulation stays f32 either way)
    res_cd = None if cd == jnp.float32 else adj.compute_dtype
    return dense[:n] + spmm_halo(adj.halo_res, x, compute_dtype=res_cd)
