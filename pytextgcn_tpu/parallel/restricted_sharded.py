"""Output-row-restricted sharded head: masked-head training on a mesh.

Single-device, masked-head training (ops/restricted.py) restricts the final
layer's aggregation to the train rows — the only rows the masked loss reads.
This module is its multi-chip form, composing with the row-sharded
activation layouts of parallel/halo.py and parallel/hybrid_sharded.py:

* the restricted head keeps the **full [N, H] row-sharded output shape** —
  exactly zero at non-train rows — so the training step passes the ordinary
  labels/train-mask (no host-side slicing) and the masked cross-entropy
  reads identical terms: zero rows carry zero cotangent, so gradients are
  exact,
* without a hot set the operator is literally a :class:`~pytextgcn_tpu.
  parallel.halo.HaloAdj` built over the train-row-incident edge subset with
  the self-loop diagonal masked to the train rows — the existing halo
  ppermute exchange (and its VJP) does all the work,
* with a hot set (``hot_k``), edges from the K hottest sources ride a dense
  per-shard MXU block ``D_r``: each shard compacts its own train rows into
  an [m_max, K] slab (streaming ~M/D · K bytes, not rows_per · K), computes
  ``D_r @ x_hot`` against the same K-row all_gather the sharded hybrid uses,
  and scatters the slab into its row block. As in the single-device
  restricted form there is **no transposed-D term** — destinations are
  always train rows — so no weight symmetry is required. The src-cold
  residual rides the halo exchange.

Used by ``Trainer(masked_head=True, mesh=...)``; evaluation always runs the
full-output sharded operator. Reference workload: the training loop's loss
only ever reads train-document logits (flat_amazon.py:99-123).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.graph import TextGraph, gcn_normalize_np
from .halo import HaloAdj, build_halo_core, spmm_halo
from .sharded import put_global, replicate_global


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["d_blk", "out_rows", "hot_rows", "hot_unpack", "halo_res"],
    meta_fields=[
        "n_nodes", "rows_per", "k", "k_max", "m_max", "mesh", "axis",
        "compute_dtype",
    ],
)
@dataclasses.dataclass
class RestrictedShardedAdj:
    """Train-row-restricted hot/cold decomposition, row-partitioned.

    d_blk:      [D, m_max, K] dense src-hot block at this shard's train rows
                (zero rows on padding).
    out_rows:   [D, m_max] local row ids of those train rows (padded with
                rows_per — scatters onto a dropped extension row).
    hot_rows:   [D, k_max] local row ids of the hot nodes this shard owns
                (padded with rows_per — clipped on gather; junk rows are
                never referenced by ``hot_unpack``).
    hot_unpack: [K] position of hot rank r in the concatenated
                (D * k_max)-row all_gather buffer, replicated.
    halo_res:   HaloAdj over the src-cold restricted edges, carrying the
                train-row-masked self-loop diagonal.
    """

    d_blk: jax.Array
    out_rows: jax.Array
    hot_rows: jax.Array
    hot_unpack: jax.Array
    halo_res: HaloAdj
    n_nodes: int
    rows_per: int
    k: int
    k_max: int
    m_max: int
    mesh: Mesh
    axis: str
    compute_dtype: str = "float32"

    @property
    def n_shards(self) -> int:
        return int(self.d_blk.shape[0])

    @property
    def n_pad(self) -> int:
        return self.rows_per * self.n_shards

    @property
    def comm_rows_per_device(self) -> int:
        """Rows on the wire per restricted SpMM per device: the hot
        all_gather block with ring accounting ((D-1) * k_max rows — r5 fix,
        see HybridShardedAdj.comm_rows_per_device) plus the residual halo
        (no psum'd partial — the restricted form has no hot-destination
        term)."""
        return ((self.n_shards - 1) * self.k_max
                + self.halo_res.comm_rows_per_device)


def _choose_restricted_hot_k(
    r_src: np.ndarray, n: int, m: int, itemsize: int
) -> int:
    """Cost model over the restricted edge subset: dense slab streaming +
    MXU vs the halo residual's per-edge gather/segment cost (measured
    on-chip at ~4x the raw gather issue rate — see ops/restricted.py)."""
    from ..ops.hybrid import (
        _GATHER_NS,
        _MXU_F32_HIGHEST,
    )

    deg = np.bincount(r_src, minlength=n)
    rank = np.empty(n, np.int64)
    rank[np.argsort(-deg, kind="stable")] = np.arange(n)
    src_rank = rank[r_src]
    # restricted-head single-product bf16 rate: 1.6, NOT the hybrid
    # model's 3.5 streaming-dual rate (see ops/restricted.py — measured
    # masked-step regression when the head K moves up)
    mxu = _MXU_F32_HIGHEST * (1 if itemsize == 4 else 1.6)
    hbm = 2.2e11  # see ops/restricted.py — restricted slab effective rate
    best_k, best_t = 0, len(r_src) * 4 * _GATHER_NS
    for cand in (512, 1024, 2048, 4096, 8192):
        if cand >= n or m * cand * itemsize > 1.5e9:
            continue
        n_cold = int((src_rank >= cand).sum())
        dense_ns = max(
            m * cand * itemsize / hbm, 2 * m * cand * 128 / mxu
        ) * 1e9
        t = dense_ns + n_cold * 4 * _GATHER_NS
        if t < best_t:
            best_k, best_t = cand, t
    return best_k


def build_restricted_sharded_adj(
    g: TextGraph,
    rows: np.ndarray,
    mesh: Mesh,
    axis: str = "graph",
    hot_k=None,
    compute_dtype: str = "float32",
) -> Union[HaloAdj, RestrictedShardedAdj]:
    """Host-side build of the mesh masked-head operator.

    ``rows``: sorted unique global node ids (the train rows). ``hot_k``:
    None/0 = pure halo restricted head; 'auto' = cost model over the
    restricted edge subset; an int forces K. Returns a plain HaloAdj when
    no hot set is used (or 'auto' picks none) — ``ops.spmm`` dispatches it
    directly."""
    d = mesh.shape[axis]
    src = np.asarray(g.edge_src, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    norm_w, self_w = gcn_normalize_np(src, dst, np.asarray(g.edge_w), g.n_nodes)
    n = g.n_nodes
    rows = np.asarray(rows, np.int64)
    m = int(rows.shape[0])
    itemsize = jnp.dtype(compute_dtype).itemsize

    in_rows = np.zeros(n, bool)
    in_rows[rows] = True
    sel = in_rows[dst]
    r_src, r_dst, r_w = src[sel], dst[sel], norm_w[sel]
    self_masked = np.where(in_rows, self_w, 0.0).astype(np.float32)

    if hot_k == "auto":
        hot_k = _choose_restricted_hot_k(r_src, n, m, itemsize)
    if not hot_k:
        return build_halo_core(r_src, r_dst, r_w, self_masked, n, mesh, axis)

    k = int(min(hot_k, n))
    if k >= 128:
        k = (k // 128) * 128
    k = max(1, k)
    deg = np.bincount(r_src, minlength=n)
    order = np.argsort(-deg, kind="stable")
    hot_ids = np.sort(order[:k]).astype(np.int64)
    hot_rank = np.full(n, -1, np.int64)
    hot_rank[hot_ids] = np.arange(k)
    hsel = hot_rank[r_src] >= 0

    rows_per = -(-n // d)  # must match build_halo_core's partition

    # per-shard train-row compaction: shard `dev` owns the train rows in its
    # row block; its dense slab has one row per owned train row
    shard_of_row = rows // rows_per
    row_counts = np.bincount(shard_of_row, minlength=d)
    m_max = max(1, int(row_counts.max()))
    out_rows = np.full((d, m_max), rows_per, np.int32)  # pad -> dropped row
    slab_of = np.empty(m, np.int64)  # train row -> (shard, slab slot)
    starts = np.concatenate([[0], np.cumsum(row_counts)])
    for dev in range(d):
        lo, hi = starts[dev], starts[dev + 1]
        out_rows[dev, : hi - lo] = rows[lo:hi] - dev * rows_per
        slab_of[lo:hi] = dev * m_max + np.arange(hi - lo)
    slot_of_node = np.full(n, -1, np.int64)
    slot_of_node[rows] = slab_of

    # dense hot slab, [D * m_max, K] flattened then row-sharded
    d_slab = np.zeros((d * m_max, k), np.float32)
    np.add.at(
        d_slab, (slot_of_node[r_dst[hsel]], hot_rank[r_src[hsel]]), r_w[hsel]
    )
    d_blk = jnp.asarray(d_slab.reshape(d, m_max, k), jnp.dtype(compute_dtype))

    # per-shard hot ownership for the K-row all_gather (hot_ids ascending =>
    # contiguous per-shard runs), same layout as parallel/hybrid_sharded.py
    shard_of_hot = hot_ids // rows_per
    counts = np.bincount(shard_of_hot, minlength=d)
    k_max = max(1, int(counts.max()))
    hot_rows = np.full((d, k_max), rows_per, np.int32)
    hot_unpack = np.zeros(k, np.int32)
    hstarts = np.concatenate([[0], np.cumsum(counts)])
    for dev in range(d):
        lo, hi = hstarts[dev], hstarts[dev + 1]
        hot_rows[dev, : hi - lo] = hot_ids[lo:hi] - dev * rows_per
        hot_unpack[lo:hi] = dev * k_max + np.arange(hi - lo)

    csel = ~hsel
    halo_res = build_halo_core(
        r_src[csel], r_dst[csel], r_w[csel], self_masked, n, mesh, axis
    )

    return RestrictedShardedAdj(
        d_blk=put_global(mesh, P(axis), d_blk),
        out_rows=put_global(mesh, P(axis), out_rows),
        hot_rows=put_global(mesh, P(axis), hot_rows),
        hot_unpack=replicate_global(mesh, hot_unpack),
        halo_res=halo_res,
        n_nodes=n,
        rows_per=rows_per,
        k=k,
        k_max=k_max,
        m_max=m_max,
        mesh=mesh,
        axis=axis,
        compute_dtype=compute_dtype,
    )


def spmm_restricted_sharded(adj: RestrictedShardedAdj, x: jax.Array) -> jax.Array:
    """Train rows of ``A_hat @ x``, zero elsewhere; [N, H] row-sharded."""
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

    def local(x_blk, d_blk, out_rows, hot_rows, unpack):
        d_blk, out_rows, hot_rows = d_blk[0], out_rows[0], hot_rows[0]
        xc = x_blk.astype(cd)
        # replicated (K, H) hot activations: one k_max-row all_gather
        mine = jnp.take(xc, hot_rows, axis=0, mode="clip")
        allh = jax.lax.all_gather(mine, axis, axis=0, tiled=True)
        x_hot = jnp.take(allh, unpack, axis=0)
        slab = jnp.dot(
            d_blk, x_hot, preferred_element_type=jnp.float32,
            precision=precision,
        )  # [m_max, H]
        ext = jnp.zeros((rows_per + 1, slab.shape[1]), slab.dtype)
        ext = ext.at[out_rows].add(slab)  # padded index rows_per -> dropped
        return ext[:rows_per]

    fn = jax.shard_map(
        local,
        mesh=adj.mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    dense = fn(x_pad, adj.d_blk, adj.out_rows, adj.hot_rows, adj.hot_unpack)
    # src-cold residual + masked self term (zero at non-train rows)
    res_cd = None if cd == jnp.float32 else adj.compute_dtype
    return dense[:n] + spmm_halo(adj.halo_res, x, compute_dtype=res_cd)
