"""Multi-chip edge-partitioned SpMM (shard_map over a named mesh).

The reference is single-process single-device (SURVEY.md §2.4); its only
gesture at scaling is a dead mini-batcher stub (batching.py:9-55). The
TPU-native scaling strategy is *graph partitioning*, the GNN analogue of
sequence parallelism:

* the adjacency is 1D row-partitioned: device ``d`` owns output rows
  ``[d * rows_per, (d+1) * rows_per)`` and every edge whose destination
  falls there (host-side plan, padded to equal per-device edge counts so
  shapes are uniform),
* node features are replicated (N x H is tens of MB — far below HBM);
  each device aggregates its row block locally, then an ``all_gather``
  over the mesh axis reassembles the full activation for the next layer.
  XLA turns the gather's transpose into a reduce-scatter in backward, so
  gradients ride the same ICI links,
* edges/s scales linearly: each chip touches E / n_devices edges.

``ShardedAdj`` quacks like :class:`pytextgcn_tpu.ops.NormAdj` — the models
and Trainer are oblivious; ``ops.spmm`` dispatches on the container type.
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


def make_mesh(n_devices: Optional[int] = None, axis: str = "graph") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.array(devs[:n]), (axis,))


def put_global(mesh: Mesh, spec: P, arr: np.ndarray) -> jax.Array:
    """Place a host array as a global array sharded by ``spec`` over
    ``mesh``. Works on multi-process meshes (every process holds the same
    full host array — graph finalization is deterministic — and contributes
    its addressable shards); on single-process meshes it simply places each
    shard on its device, skipping the resharding a plain ``jnp.asarray``
    would cost on entry to ``shard_map``."""
    from jax.sharding import NamedSharding

    if not isinstance(arr, jax.Array):
        # device-built arrays (e.g. the hybrid D block) stay on device:
        # shard slices move device-to-device instead of round-tripping host
        arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, NamedSharding(mesh, spec), lambda idx: arr[idx]
    )


def replicate_global(mesh: Mesh, arr) -> jax.Array:
    """Replicate an array over every device of a (possibly multi-process)
    mesh. Device-built arrays pass through without a host round-trip
    (``put_global`` only materializes host arrays)."""
    return put_global(mesh, P(), arr)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "dst_local", "w", "self_w", "plan_fwd", "plan_bwd"],
    meta_fields=["n_nodes", "rows_per", "mesh", "axis", "compute_dtype"],
)
@dataclasses.dataclass
class ShardedAdj:
    """Row-partitioned normalized adjacency.

    src:       int32 [D, E_max] global source ids (0 on padding)
    dst_local: int32 [D, E_max] destination row local to the shard
    w:         float32 [D, E_max] normalized weights (0 on padding)
    self_w:    float32 [N] self-loop diagonal (replicated)
    plan_fwd/plan_bwd: optional TilePlans with a leading shard axis
               (uniform shapes across shards): the Pallas kernel then runs
               per shard inside shard_map instead of the XLA segment path.
               fwd maps replicated X -> local rows; bwd is the transpose
               (local grad rows -> full-node cotangent, psum'd by shard_map).
    """

    src: jax.Array
    dst_local: jax.Array
    w: jax.Array
    self_w: jax.Array
    n_nodes: int
    rows_per: int
    mesh: Mesh
    axis: str
    plan_fwd: Optional[object] = None
    plan_bwd: Optional[object] = None
    compute_dtype: str = "float32"

    @property
    def n_shards(self) -> int:
        return int(self.src.shape[0])


def build_sharded_adj(
    g: TextGraph,
    mesh: Mesh,
    axis: str = "graph",
    use_pallas: bool = False,
    pallas_dtype: str = "float32",
) -> ShardedAdj:
    """Host-side partition: normalize, split edges by destination row block,
    pad shards to a uniform edge count; optionally build per-shard Pallas
    tile plans (padded to uniform tile counts across shards)."""
    from ..ops.spmm_pallas import ROW_BLOCK, _build_tile_plan, count_tiles

    n_dev = mesh.shape[axis]
    src = np.asarray(g.edge_src, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    norm_w, self_w = gcn_normalize_np(src, dst, np.asarray(g.edge_w), g.n_nodes)

    rows_per = -(-g.n_nodes // n_dev)
    if use_pallas:
        # align to the kernel's output block so a shard's padded output rows
        # are exactly its row slice of the gathered result (only the Pallas
        # path needs this; unconditional alignment would skew the partition
        # for small graphs — worst case all edges on shard 0)
        rows_per = -(-rows_per // ROW_BLOCK) * ROW_BLOCK
    shard_of_edge = dst // rows_per
    order = np.argsort(shard_of_edge, kind="stable")
    src, dst, norm_w = src[order], dst[order], norm_w[order]
    shard_of_edge = shard_of_edge[order]
    counts = np.bincount(shard_of_edge, minlength=n_dev)
    e_max = max(int(counts.max()), 1)

    src_s = np.zeros((n_dev, e_max), np.int32)
    dstl_s = np.zeros((n_dev, e_max), np.int32)
    w_s = np.zeros((n_dev, e_max), np.float32)
    starts = np.concatenate([[0], np.cumsum(counts)])
    per_shard = []
    for d in range(n_dev):
        lo, hi = starts[d], starts[d + 1]
        k = hi - lo
        src_s[d, :k] = src[lo:hi]
        dstl_s[d, :k] = dst[lo:hi] - d * rows_per
        w_s[d, :k] = norm_w[lo:hi]
        per_shard.append((src_s[d, :k].copy(), dstl_s[d, :k].copy(), w_s[d, :k].copy()))

    plan_fwd = plan_bwd = None
    if use_pallas:
        t_fwd = max(count_tiles(d_, rows_per) for _, d_, _ in per_shard)
        t_bwd = max(count_tiles(s_, g.n_nodes) for s_, _, _ in per_shard)
        fwd_plans, bwd_plans = [], []
        for s_, d_, w_ in per_shard:
            fwd_plans.append(
                _build_tile_plan(s_, d_, w_, rows_per, pad_tiles_to=t_fwd, device=False)
            )
            bwd_plans.append(
                _build_tile_plan(d_, s_, w_, g.n_nodes, pad_tiles_to=t_bwd, device=False)
            )
        # stack on host, upload once (eager per-leaf device stacking would be
        # a separate remote compile per op on tunneled backends); leaves are
        # placed pre-sharded over the mesh so this works on multi-process
        # meshes and skips resharding-on-entry to shard_map
        stack = lambda plans: jax.tree.map(
            lambda *xs: put_global(mesh, P(axis), np.stack(xs)), *plans
        )
        plan_fwd = stack(fwd_plans)
        plan_bwd = stack(bwd_plans)

    return ShardedAdj(
        src=put_global(mesh, P(axis), src_s),
        dst_local=put_global(mesh, P(axis), dstl_s),
        w=put_global(mesh, P(axis), w_s),
        self_w=replicate_global(mesh, self_w),
        n_nodes=g.n_nodes,
        rows_per=rows_per,
        mesh=mesh,
        axis=axis,
        plan_fwd=plan_fwd,
        plan_bwd=plan_bwd,
        compute_dtype=pallas_dtype,
    )


def spmm_sharded(adj: ShardedAdj, x: jax.Array) -> jax.Array:
    """``A_hat @ x`` with the aggregation row-partitioned over the mesh.

    With per-shard tile plans the local aggregation runs in the Pallas
    kernel (custom VJP: the transpose plan emits this shard's contribution
    to the full-node cotangent, which shard_map psums since x is
    replicated); otherwise XLA gather/segment_sum."""
    rows_per, n_nodes, axis = adj.rows_per, adj.n_nodes, adj.axis

    if adj.plan_fwd is not None:
        from ..ops.spmm_pallas import _spmm_pallas

        dtype = jnp.dtype(adj.compute_dtype).type

        def local_pallas(pf, pb, x_full):
            pf_l = jax.tree.map(lambda a: a[0], pf)
            pb_l = jax.tree.map(lambda a: a[0], pb)
            local = _spmm_pallas(x_full, pf_l, pb_l, dtype)  # (rows_per, h)
            full = jax.lax.all_gather(local, axis, axis=0, tiled=True)
            return full[:n_nodes]

        fn = jax.shard_map(
            local_pallas,
            mesh=adj.mesh,
            in_specs=(P(axis), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )
        return fn(adj.plan_fwd, adj.plan_bwd, x) + adj.self_w[:, None] * x

    def local_agg(src, dst_local, w, x_full):
        # local views: src/dst_local/w are (1, E_max); x_full replicated
        contrib = w[0][:, None] * jnp.take(x_full, src[0], axis=0)
        local = jax.ops.segment_sum(contrib, dst_local[0], num_segments=rows_per)
        full = jax.lax.all_gather(local, axis, axis=0, tiled=True)
        return full[:n_nodes]

    fn = jax.shard_map(
        local_agg,
        mesh=adj.mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=P(),
        check_vma=False,  # all_gather output IS replicated; the static
        # varying-mesh-axes analysis can't prove it
    )
    return fn(adj.src, adj.dst_local, adj.w, x) + adj.self_w[:, None] * x
