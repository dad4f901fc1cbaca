"""Halo-exchange edge-partitioned SpMM: boundary rows only, no replication.

The first sharded path (parallel/sharded.py) replicates the full [N, H]
activation and all_gathers it every layer — correct, but it caps graph size
per chip and moves N*H bytes per device per layer. This module keeps
activations **row-sharded end to end** (SURVEY.md §5 "graph-size
parallelism", §7 step 7; the reference's dead mini-batcher gestured at the
same idea, batching.py:9-55):

* device ``d`` owns activation rows ``[d*rows_per, (d+1)*rows_per)`` and all
  edges whose destination lands there,
* a host-built plan records, per (sender, step) pair, exactly which of the
  sender's rows some other shard needs — the *halo*,
* at apply time every halo block is sent with ``ppermute`` (ring schedule:
  step ``s`` sends to ``d+s``); all sends are issued before the local-source
  aggregation so XLA's latency-hiding scheduler can overlap the ICI
  transfers with the local compute,
* each received block feeds a local gather + ``segment_sum`` into the
  shard's own output rows.

Per layer per device this moves only the boundary rows (typically a small
multiple of rows_per for graphs with locality; worst case (D-1)*rows_per
— never more than the all_gather it replaces, which moves (D-1)*rows_per
regardless). ``HaloAdj.comm_rows_per_device`` reports the measured plan
volume so benchmark_scaling.py can print the reduction.
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
from .sharded import put_global


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "own_src", "own_dst", "own_w",
        "send_idx", "rem_pos", "rem_dst", "rem_w",
        "self_w",
    ],
    meta_fields=["n_nodes", "rows_per", "mesh", "axis"],
)
@dataclasses.dataclass
class HaloAdj:
    """Row-partitioned adjacency with explicit halo-exchange plans.

    own_*:    [D, E_own] edges whose src AND dst live on the shard
              (src/dst local to the shard's row block; w=0 padding).
    send_idx: [D, D-1, S] local row indices shard d sends at step s
              (to shard (d+s+1) mod D; 0-padded — padded sends are ignored
              by every receiver since no edge references them).
    rem_pos:  [D, D-1, E_rem] position of each remote-source edge's row in
              the block received at step s.
    rem_dst/rem_w: [D, D-1, E_rem] local destination and weight (w=0 pad).
    self_w:   [D, rows_per] self-loop diagonal, row-sharded.
    """

    own_src: jax.Array
    own_dst: jax.Array
    own_w: jax.Array
    send_idx: jax.Array
    rem_pos: jax.Array
    rem_dst: jax.Array
    rem_w: jax.Array
    self_w: jax.Array
    n_nodes: int
    rows_per: int
    mesh: Mesh
    axis: str

    @property
    def n_shards(self) -> int:
        return int(self.own_src.shape[0])

    @property
    def n_pad(self) -> int:
        return self.rows_per * self.n_shards

    @property
    def comm_rows_per_device(self) -> int:
        """Halo rows each device sends per SpMM (plan size S per step)."""
        return int(self.send_idx.shape[1] * self.send_idx.shape[2])


def build_halo_adj(g: TextGraph, mesh: Mesh, axis: str = "graph") -> HaloAdj:
    """Host-side plan: partition rows, split edges into own/remote-by-step,
    compute per-(sender, step) unique halo row lists."""
    src = np.asarray(g.edge_src, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    norm_w, self_w = gcn_normalize_np(src, dst, np.asarray(g.edge_w), g.n_nodes)
    return build_halo_core(src, dst, norm_w, self_w, g.n_nodes, mesh, axis)


def build_halo_core(
    src: np.ndarray,
    dst: np.ndarray,
    norm_w: np.ndarray,
    self_w: np.ndarray,
    n_nodes: int,
    mesh: Mesh,
    axis: str = "graph",
) -> HaloAdj:
    """Halo plan over an already-normalized edge list (the hybrid-sharded
    path routes only its cold-cold residual through here, with the true
    self-loop diagonal carried along)."""
    d = mesh.shape[axis]

    rows_per = -(-n_nodes // d)
    n_pad = rows_per * d
    dst_shard = dst // rows_per
    src_shard = src // rows_per

    own_lists, rem_lists, send_lists = [], [], []
    for dev in range(d):
        mine = dst_shard == dev
        own_m = mine & (src_shard == dev)
        own_lists.append(
            (src[own_m] - dev * rows_per, dst[own_m] - dev * rows_per, norm_w[own_m])
        )
        rem_steps = []
        for s in range(1, d):
            peer = (dev - s) % d  # block received at step s-1 comes from here
            m = mine & (src_shard == peer)
            uniq = np.unique(src[m]) - peer * rows_per  # sorted local rows
            pos = np.searchsorted(uniq, src[m] - peer * rows_per)
            rem_steps.append((uniq, pos, dst[m] - dev * rows_per, norm_w[m]))
        rem_lists.append(rem_steps)

    # sender-side lists: at step s, shard `snd` sends to (snd+s) % d the rows
    # that receiver recorded as `uniq` for peer == snd
    e_own = max(1, max(len(t[2]) for t in own_lists))
    s_max, e_rem = 1, 1
    for dev in range(d):
        for s in range(d - 1):
            uniq, pos, dl, wl = rem_lists[dev][s]
            s_max = max(s_max, len(uniq))
            e_rem = max(e_rem, len(wl))

    own_src = np.zeros((d, e_own), np.int32)
    own_dst = np.zeros((d, e_own), np.int32)
    own_w = np.zeros((d, e_own), np.float32)
    for dev, (s_, d_, w_) in enumerate(own_lists):
        own_src[dev, : len(w_)] = s_
        own_dst[dev, : len(w_)] = d_
        own_w[dev, : len(w_)] = w_

    n_steps = max(d - 1, 1)
    send_idx = np.zeros((d, n_steps, s_max), np.int32)
    rem_pos = np.zeros((d, n_steps, e_rem), np.int32)
    rem_dst = np.zeros((d, n_steps, e_rem), np.int32)
    rem_w = np.zeros((d, n_steps, e_rem), np.float32)
    for dev in range(d):
        for s in range(d - 1):
            uniq, pos, dl, wl = rem_lists[dev][s]
            # the sender of this block is (dev - (s+1)) ... step indexing:
            # rem_lists uses s in [0, d-2] for ring step s+1
            rem_pos[dev, s, : len(pos)] = pos
            rem_dst[dev, s, : len(dl)] = dl
            rem_w[dev, s, : len(wl)] = wl
            snd = (dev - (s + 1)) % d
            send_idx[snd, s, : len(uniq)] = uniq

    self_pad = np.zeros(n_pad, np.float32)
    self_pad[:n_nodes] = self_w

    shard = lambda a, spec: put_global(mesh, spec, a)
    return HaloAdj(
        own_src=shard(own_src, P(axis)),
        own_dst=shard(own_dst, P(axis)),
        own_w=shard(own_w, P(axis)),
        send_idx=shard(send_idx, P(axis)),
        rem_pos=shard(rem_pos, P(axis)),
        rem_dst=shard(rem_dst, P(axis)),
        rem_w=shard(rem_w, P(axis)),
        self_w=shard(self_pad.reshape(d, rows_per), P(axis)),
        n_nodes=n_nodes,
        rows_per=rows_per,
        mesh=mesh,
        axis=axis,
    )


def spmm_halo(
    adj: HaloAdj, x: jax.Array, compute_dtype: Optional[str] = None
) -> jax.Array:
    """``A_hat @ x`` with row-sharded activations and boundary-only exchange.

    ``x``: [N, H] (any sharding; constrained to row-sharded on entry).
    Returns [N, H] row-sharded. Differentiable: ppermute transposes to the
    reverse permutation, gathers to scatter-adds — all inside shard_map.

    ``compute_dtype``: cast gathered rows/weights to this dtype before the
    per-edge multiplies and halo sends (halving ICI bytes in bf16 mode);
    accumulation stays float32 — the same operand/accumulator split the
    Pallas kernel and the hybrid's MXU matmuls use, so the sharded-hybrid
    bf16 mode is consistent across its dense and residual halves.
    """
    d, rows_per, axis = adj.n_shards, adj.rows_per, adj.axis
    n, h = x.shape
    cd = None if compute_dtype is None else jnp.dtype(compute_dtype)
    x_pad = x if n == adj.n_pad else jnp.pad(x, ((0, adj.n_pad - n), (0, 0)))
    x_pad = jax.lax.with_sharding_constraint(
        x_pad, jax.sharding.NamedSharding(adj.mesh, P(axis, None))
    )

    def local(x_blk, own_src, own_dst, own_w, send_idx, rem_pos, rem_dst, rem_w, self_w):
        x_own = x_blk if cd is None else x_blk.astype(cd)
        own_src, own_dst, own_w = own_src[0], own_dst[0], own_w[0]
        send_idx, rem_pos = send_idx[0], rem_pos[0]
        rem_dst, rem_w = rem_dst[0], rem_w[0]
        self_w = self_w[0]
        if cd is not None:
            own_w, rem_w, self_w = own_w.astype(cd), rem_w.astype(cd), self_w.astype(cd)

        # issue EVERY halo send first — no dependency on the local compute,
        # so the scheduler overlaps the ICI permutes with the own-block work
        recvs = []
        for s in range(d - 1):
            perm = [(j, (j + s + 1) % d) for j in range(d)]
            send = jnp.take(x_own, send_idx[s], axis=0)
            recvs.append(jax.lax.ppermute(send, axis, perm))

        contrib = (own_w[:, None] * jnp.take(x_own, own_src, axis=0)).astype(
            jnp.float32
        )
        out = jax.ops.segment_sum(contrib, own_dst, num_segments=rows_per)
        for s in range(d - 1):
            c = (rem_w[s][:, None] * jnp.take(recvs[s], rem_pos[s], axis=0)).astype(
                jnp.float32
            )
            out = out + jax.ops.segment_sum(c, rem_dst[s], num_segments=rows_per)
        return out + (self_w[:, None] * x_own).astype(jnp.float32)

    fn = jax.shard_map(
        local,
        mesh=adj.mesh,
        in_specs=(
            P(axis, None),
            P(axis), P(axis), P(axis),
            P(axis), P(axis), P(axis), P(axis),
            P(axis),
        ),
        out_specs=P(axis, None),
        check_vma=False,
    )
    out = fn(
        x_pad,
        adj.own_src, adj.own_dst, adj.own_w,
        adj.send_idx, adj.rem_pos, adj.rem_dst, adj.rem_w,
        adj.self_w,
    )
    return out[:n]
