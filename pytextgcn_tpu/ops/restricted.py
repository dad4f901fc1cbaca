"""Output-row-restricted SpMM: aggregate into a subset of rows only.

The training step's loss reads logits at the **train rows** alone — every
other row of the final layer's aggregation is dead work (and its cotangent
is exactly zero, so the first backward SpMM only ever moves mass *from*
those rows). Restricting the head SpMM to the train-document subset:

* the per-edge work of 2 of the step's 4 SpMM applications drops from all
  E edges to just the edges **into** train documents (word-word edges — the
  bulk of a TextGCN graph — never reach document rows at all),
* under the hybrid decomposition (ops/hybrid.py) the restricted form is
  strictly simpler: ``out = D_r @ x_hot + residual_r(x) + self_r ⊙ x[rows]``
  with ``D_r`` the [M, K] row slice of the dense hot matrix. The
  transposed-D hot-destination term vanishes (it exists in the full hybrid
  only to cover hot *output* rows), so each restricted application streams
  ~M/N of one D block instead of two full ones — and needs **no weight
  symmetry**.

Gradients are exact: the dense slice and the self term differentiate
through XLA's take/dot transposes; the cold residual rides the Pallas tile
kernel's custom VJP with a rectangular transpose plan ([M] cotangent rows →
[N] input rows). For a GCN whose dropout sits on hidden layers (the
reference formulation), a masked-head training step computes bit-identical
losses and gradients to the full-output step.

Used by ``Trainer(masked_head=True)`` for the final layer during training;
evaluation always runs the full-output operator.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.graph import TextGraph, gcn_normalize_np


@partial(jax.jit, static_argnames=("m", "k"))
def _scatter_rows_block(dst_local, rank, w, *, m, k):
    d = jnp.zeros((m, k), jnp.float32)
    return d.at[dst_local, rank].add(w)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "rows", "self_rows", "hot_ids", "d_rows",
        "res_fwd", "res_bwd", "seg_src", "seg_dst", "seg_w",
    ],
    meta_fields=["n_nodes", "m", "k", "compute_dtype", "floor_spmm_ns"],
)
@dataclasses.dataclass
class RestrictedAdj:
    """Rows ``rows`` of a normalized adjacency (incl. its self-loop diag).

    Exactly one aggregation body is populated:
    * hybrid: ``d_rows`` [M, K] dense src-hot block (+ Pallas residual
      plans over the src-cold edges, absent when empty),
    * pallas: residual plans over ALL restricted edges (``d_rows`` None),
    * segment: raw (global-src, local-dst, w) arrays.
    """

    rows: jax.Array           # int32 [M] global output row ids
    self_rows: jax.Array      # f32 [M] self-loop diagonal at those rows
    hot_ids: Optional[jax.Array]
    d_rows: Optional[jax.Array]
    res_fwd: Optional[object]
    res_bwd: Optional[object]
    seg_src: Optional[jax.Array]
    seg_dst: Optional[jax.Array]
    seg_w: Optional[jax.Array]
    n_nodes: int
    m: int
    k: int
    compute_dtype: str = "float32"
    floor_spmm_ns: float = 0.0


def _resid_geom(compute_dtype="float32", f32_mode=None) -> dict:
    """Residual tile-plan geometry kwargs (the chip-swept per-mode
    RESID_GEOMS shared with ops/hybrid.py — probe_resid_kernel.py)."""
    from .spmm_pallas import RESID_F32_MODE, resid_geometry

    if f32_mode is None:
        f32_mode = RESID_F32_MODE
    rb, et = resid_geometry(compute_dtype, f32_mode)
    return dict(row_block=rb, edge_tile=et, f32_mode=f32_mode)


def _padded_slots(dst_local: np.ndarray, m: int,
                  compute_dtype="float32", f32_mode=None) -> int:
    """Exact slot count a tile plan would allocate for these edges: per
    residual row block, edges round up to the residual edge tile (and every
    block pays at least one tile). The restricted head's residuals are
    small enough that this padding — not the raw edge count — is the cost."""
    geom = _resid_geom(compute_dtype, f32_mode)
    rb, et = geom["row_block"], geom["edge_tile"]
    n_blocks = max(1, -(-m // rb))
    counts = np.bincount(dst_local // rb, minlength=n_blocks)
    return int(np.maximum(-(-counts // et), 1).sum() * et)


def build_restricted_adj(
    g: TextGraph,
    rows: np.ndarray,
    use_pallas: bool = False,
    hot_k=None,
    compute_dtype: str = "float32",
    resid_mode: str = "auto",
    resid_f32_mode: str = None,
) -> RestrictedAdj:
    """Host-side build. ``rows``: sorted unique global node ids (the train
    rows). ``hot_k``: as in ops/hybrid.py ('auto' = cost model over the
    restricted edge subset; no symmetry requirement here). ``resid_mode``:
    'pallas' | 'segment' | 'auto' — the src-cold residual of a restricted
    head is typically a few hundred k edges, where the segment path's
    per-row gather beats the tile kernel's block padding; 'auto' picks by
    modeled cost. ``resid_f32_mode``: 'highest' | 'split2' residual MXU
    strategy (None = RESID_F32_MODE, see ops/spmm_pallas.py)."""
    from .hybrid import (
        _EDGE_NS,
        _GATHER_NS,
        _HBM_BPS,
        _MXU_F32_HIGHEST,
    )
    from .spmm_pallas import _build_tile_plan

    src = np.asarray(g.edge_src, np.int64)
    dst = np.asarray(g.edge_dst, np.int64)
    norm_w, self_w = gcn_normalize_np(src, dst, np.asarray(g.edge_w), g.n_nodes)
    rows = np.asarray(rows, np.int64)
    m = int(rows.shape[0])
    n = g.n_nodes
    itemsize = jnp.dtype(compute_dtype).itemsize

    local_of = np.full(n, -1, np.int64)
    local_of[rows] = np.arange(m)
    sel = local_of[dst] >= 0
    r_src, r_dst, r_w = src[sel], local_of[dst[sel]], norm_w[sel]

    if hot_k == 0:
        hot_k = None

    def _resid_ns(dst_l, n_edges):
        """Modeled residual cost: best of the tile kernel at its EXACT
        padded slot count and the segment path (measured on-chip at ~4x the
        raw gather issue rate once the scatter half and launch overheads
        are in — probe_restricted.py)."""
        pallas_ns = _padded_slots(
            dst_l, m, compute_dtype, resid_f32_mode) * _EDGE_NS
        segment_ns = n_edges * 4 * _GATHER_NS
        return min(pallas_ns, segment_ns)

    if hot_k == "auto":
        # restricted cost model: dst is always in `rows`, so the residual is
        # exactly the src-cold edges (no (1-cov)^2 independence estimate),
        # and D_r streams ONCE per application (no transposed term)
        deg0 = np.bincount(r_src, minlength=n)
        rank0 = np.empty(n, np.int64)
        order0 = np.argsort(-deg0, kind="stable")
        rank0[order0] = np.arange(n)
        src_rank = rank0[r_src]
        # bf16 rate: the hybrid model's _MXU_BF16_FACTOR (3.5 since r5)
        # is the [N, K] streaming-dual rate; the restricted head's single
        # m-row product (m ~ train rows) measures far below it — pricing
        # it at 3.5 moves the head K up and regresses the measured masked
        # step (bf16 masked-head 15.3 ms with the 1.6-era resolution vs
        # 17.2 with 3.5 — bench r5a vs r5c, same session family). Keep
        # the restricted chooser on the conservatively-measured 1.6.
        mxu = _MXU_F32_HIGHEST * (1 if itemsize == 4 else 1.6)
        # likewise the m-row slab does NOT stream at the [N, K] D-read
        # rate (the r5-corrected 420 GB/s) — the masked step measured
        # best under the r4-era 220 GB/s resolution (f32 masked-head
        # 25.0 ms vs 25.7 after the raise); pin the restricted model's
        # effective bandwidth to that validated regime
        hbm = 2.2e11
        best_k, best_t = 0, _resid_ns(r_dst, len(r_src))
        for cand in (512, 1024, 2048, 4096, 8192):
            if cand >= n or m * cand * itemsize > 1.5e9:
                continue
            cold = src_rank >= cand
            dense_ns = max(
                m * cand * itemsize / hbm, 2 * m * cand * 128 / mxu
            ) * 1e9
            t = dense_ns + _resid_ns(r_dst[cold], int(cold.sum()))
            if t < best_t:
                best_k, best_t = cand, t
        hot_k = best_k

    hot_ids = d_rows = res_fwd = res_bwd = None
    seg_src = seg_dst = seg_w = None
    k = 0
    floor = len(r_w) * _GATHER_NS
    if hot_k:
        k = int(min(hot_k, n))
        if k >= 128:
            k = (k // 128) * 128
        k = max(1, k)
        deg = np.bincount(r_src, minlength=n)
        order = np.argsort(-deg, kind="stable")
        hot = np.sort(order[:k]).astype(np.int64)
        hot_rank = np.full(n, -1, np.int64)
        hot_rank[hot] = np.arange(k)
        hsel = hot_rank[r_src] >= 0
        if jax.default_backend() == "cpu":
            d_host = np.zeros((m, k), np.float32)
            np.add.at(d_host, (r_dst[hsel], hot_rank[r_src[hsel]]), r_w[hsel])
            d_rows = jnp.asarray(d_host, jnp.dtype(compute_dtype))
        else:
            d_rows = _scatter_rows_block(
                jnp.asarray(r_dst[hsel], jnp.int32),
                jnp.asarray(hot_rank[r_src[hsel]], jnp.int32),
                jnp.asarray(r_w[hsel], jnp.float32),
                m=m, k=k,
            ).astype(jnp.dtype(compute_dtype))
        hot_ids = jnp.asarray(hot, jnp.int32)
        csel = ~hsel
        n_resid = int(csel.sum())
        if n_resid:
            use_tiles = resid_mode == "pallas" or (
                resid_mode == "auto"
                and _padded_slots(
                    r_dst[csel], m, compute_dtype, resid_f32_mode) * _EDGE_NS
                < n_resid * 2 * _GATHER_NS
            )
            if use_tiles:
                res_fwd = _build_tile_plan(
                    r_src[csel], r_dst[csel], r_w[csel], m,
                    **_resid_geom(compute_dtype, resid_f32_mode))
                res_bwd = _build_tile_plan(
                    r_dst[csel], r_src[csel], r_w[csel], n,
                    **_resid_geom(compute_dtype, resid_f32_mode))
            else:
                seg_src = jnp.asarray(r_src[csel], jnp.int32)
                seg_dst = jnp.asarray(r_dst[csel], jnp.int32)
                seg_w = jnp.asarray(r_w[csel], jnp.float32)
        floor = m * k * itemsize / _HBM_BPS * 1e9 + n_resid * _GATHER_NS
    elif use_pallas and resid_mode != "segment":
        res_fwd = _build_tile_plan(
            r_src, r_dst, r_w, m,
            **_resid_geom(compute_dtype, resid_f32_mode))
        res_bwd = _build_tile_plan(
            r_dst, r_src, r_w, n,
            **_resid_geom(compute_dtype, resid_f32_mode))
    else:
        seg_src = jnp.asarray(r_src, jnp.int32)
        seg_dst = jnp.asarray(r_dst, jnp.int32)
        seg_w = jnp.asarray(r_w, jnp.float32)

    return RestrictedAdj(
        rows=jnp.asarray(rows, jnp.int32),
        self_rows=jnp.asarray(self_w[rows], jnp.float32),
        hot_ids=hot_ids,
        d_rows=d_rows,
        res_fwd=res_fwd,
        res_bwd=res_bwd,
        seg_src=seg_src,
        seg_dst=seg_dst,
        seg_w=seg_w,
        n_nodes=n,
        m=m,
        k=k,
        compute_dtype=compute_dtype,
        floor_spmm_ns=float(floor),
    )


def spmm_restricted(adj: RestrictedAdj, x: jax.Array) -> jax.Array:
    """Rows ``adj.rows`` of ``A_hat @ x``; returns [M, H] float32."""
    cd = jnp.dtype(adj.compute_dtype)
    precision = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    xc = x.astype(cd)
    out = adj.self_rows[:, None] * jnp.take(x, adj.rows, axis=0)
    if adj.d_rows is not None:
        x_hot = jnp.take(xc, adj.hot_ids, axis=0)
        out = out + jnp.dot(
            adj.d_rows, x_hot,
            preferred_element_type=jnp.float32, precision=precision,
        )
    if adj.res_fwd is not None:
        from .spmm_pallas import _spmm_pallas

        out = out + _spmm_pallas(x, adj.res_fwd, adj.res_bwd, cd.type)
    if adj.seg_src is not None:
        contrib = adj.seg_w[:, None] * jnp.take(x, adj.seg_src, axis=0)
        out = out + jax.ops.segment_sum(contrib, adj.seg_dst, num_segments=adj.m)
    return out
