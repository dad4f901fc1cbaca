"""Pallas TPU SpMM: tiled segment reduction on the MXU.

The role torch-scatter's CUDA scatter-add plays in the reference
(SURVEY.md §2.3 item 2), designed for TPU instead of translated: scatter-add
is hostile to the TPU vector unit, so the reduction is reformulated as a
sequence of small one-hot matmuls — the classic TPU segment-sum trick:

1. A host-side *plan* sorts edges by destination, pads them into fixed-size
   tiles of ``EDGE_TILE`` edges such that every tile's destinations fall in
   one aligned block of ``ROW_BLOCK`` output rows, and records the block id
   per tile (scalar-prefetched so the output BlockSpec can be data-driven).
2. The kernel builds, per tile, the one-hot matrix ``M[r, e] = (rel[e] == r)``
   and accumulates ``M @ (w * x_src)`` into the output block, which stays
   resident in VMEM across the consecutive tiles of the same block (first
   visit zero-initializes it).

The gather ``x[src]`` runs in XLA outside the kernel (TPU dynamic-gather),
the multiply + reduction inside. Backward is the same kernel on a transpose
plan (``A_hat`` minus self-loops is symmetric as a matrix, but the tiling is
destination-sorted, so the plan differs); exposed via ``custom_vjp``.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EDGE_TILE = 1024  # = 8 sublanes x 128 lanes, so per-tile edge vectors tile cleanly
ROW_BLOCK = 256
LANE = 128

# geometry + f32 strategy for HYBRID RESIDUAL tile plans (ops/hybrid.py):
# chip-swept PER MODE in experiments/probe_resid_kernel.py (v5e, 0.99M
# cold edges, K=4096, H=100; full grids in experiments/resid_kernel*.log).
# The kernel's MXU flops per edge slot are ``passes * 2 * row_block *
# h_pad``, so the 3-pass 'highest' mode wants the smallest row block whose
# padding doesn't eat the flop saving (128x256: 5.04 ms vs 5.93 at the old
# 256x1024 — pad 1.04x), while the cheaper-pass modes are flat across
# row_block<=256 and won best at 256x512 ('split2' 4.36 ms, -26%). bf16
# was initially extrapolated to split2's geometry; the r5 chip sweep
# (--modes bf16 --grad, experiments/resid_kernel_bf16.log) refuted that:
# 128x256 wins the fwd+VJP pair (9.89 ms vs 10.91 at 256x512, pad 1.04x).
# Standalone full-graph plans keep the ROW_BLOCK/EDGE_TILE defaults above
# ('highest' exactness, larger blocks amortize better at full-graph edge
# counts).
RESID_GEOMS = {"highest": (128, 256), "split2": (256, 512),
               "bf16": (128, 256)}
RESID_ROW_BLOCK, RESID_EDGE_TILE = RESID_GEOMS["highest"]
# Default f32 mode for hybrid plans: 'split2' (two exact-one-hot bf16
# passes + hi/lo split-fused dense pair, ~2e-5 relative vs f64 oracle) —
# licensed at protocol scale in round 5: flat amazon seeds 42-44 land
# seed-for-seed identical (acc/f1 to 4 decimals) with the f32-'highest'
# rows (docs/protocol_results.csv 'jax-split2'; RESULTS.md round 5).
# 'highest' remains available for strict-exactness callers.
RESID_F32_MODE = "split2"
F32_MODES = ("highest", "split2")  # valid resid_f32_mode values


def resid_geometry(compute_dtype, f32_mode: str):
    """Chip-swept residual tile geometry ``(row_block, edge_tile)`` for
    this compute mode (see RESID_GEOMS above; bf16 plans ignore f32_mode).

    Raises on an unknown f32 mode up front: a silent fallback here would
    run the 'highest' kernel under the wrong label and only crash much
    later in plan-cache serialization (advisor r4)."""
    if jnp.dtype(compute_dtype) == jnp.bfloat16:
        return RESID_GEOMS["bf16"]
    if f32_mode not in F32_MODES:
        raise ValueError(
            f"resid_f32_mode must be one of {F32_MODES}, got {f32_mode!r}")
    return RESID_GEOMS[f32_mode]


def _use_interpret() -> bool:
    # compiled Mosaic on real TPU backends; interpreter elsewhere (CPU tests)
    return jax.default_backend() not in ("tpu", "axon")


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["src", "w", "rel", "block_idx", "visited"],
    meta_fields=["n_rows_padded", "n_rows", "n_tiles", "n_chunks",
                 "tiles_per_chunk", "row_block", "edge_tile", "f32_mode"],
)
@dataclasses.dataclass
class TilePlan:
    """Destination-sorted, block-aligned edge tiling (one direction).

    Tiles are grouped into ``n_chunks`` equal chunks executed sequentially
    (lax.scan) so the gathered-source working set stays bounded — a single
    monolithic gather would materialize 4*E*H bytes, which exceeds HBM for
    graphs beyond a few million edges. ``visited[k, b]`` marks which output
    blocks chunk k touches (its kernel output is garbage elsewhere and gets
    masked before accumulation).

    ``row_block``/``edge_tile`` are the tile geometry this plan was built
    for: each slot costs ``passes * 2 * row_block * h_pad`` MXU flops, so
    smaller row blocks make the one-hot matmul proportionally cheaper at
    the price of more per-block padding (min one tile per visited block).
    ``f32_mode`` selects the float32 MXU strategy — 'highest' (XLA
    3-bf16-pass product, the exact-parity default) or 'split2' (gathered
    rows split hi/lo into two exact-one-hot bf16 passes; ~2/3 the MXU time
    at ~2^-18 relative representation error, chip-validated in
    experiments/probe_resid_kernel.py).
    """

    src: jax.Array  # int32 [K, C, edge_tile] source node per slot (0 on pads)
    w: jax.Array  # float32 [K, C, edge_tile] weight (0 on pads)
    rel: jax.Array  # int32 [K, C, edge_tile] dst - block_start (0 on pads)
    block_idx: jax.Array  # int32 [K, C] output block per tile (nondecreasing)
    visited: jax.Array  # bool [K, n_blocks] blocks touched by each chunk
    n_rows_padded: int
    n_rows: int  # true output row count (<= n_rows_padded)
    n_tiles: int
    n_chunks: int
    tiles_per_chunk: int
    row_block: int = ROW_BLOCK
    edge_tile: int = EDGE_TILE
    f32_mode: str = "highest"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["fwd", "bwd", "self_w"],
    meta_fields=["n_nodes", "compute_dtype"],
)
@dataclasses.dataclass
class SpmmPlan:
    fwd: TilePlan
    bwd: TilePlan
    self_w: jax.Array  # kept for completeness; applied by ops.spmm
    n_nodes: int
    compute_dtype: str = "float32"  # 'float32' (parity) | 'bfloat16' (fast)


def count_tiles(dst, n_nodes: int, row_block: int = ROW_BLOCK,
                edge_tile: int = EDGE_TILE) -> int:
    """Tile count a plan for these destinations will have (for cross-shard
    shape alignment)."""
    n_rows_padded = max(row_block, int(-(-n_nodes // row_block)) * row_block)
    counts = np.bincount(
        np.asarray(dst, np.int64) // row_block, minlength=n_rows_padded // row_block
    )
    return int(np.maximum(-(-counts // edge_tile), 1).sum())


def _build_tile_plan(
    src, dst, w, n_nodes: int, max_chunk_tiles: int = 4096, pad_tiles_to: int = 0,
    device: bool = True, row_block: int = ROW_BLOCK, edge_tile: int = EDGE_TILE,
    f32_mode: str = "highest",
) -> TilePlan:
    """Host-side tiling: sort by dst, cut tiles at block boundaries and at
    edge_tile occupancy, pad tiles with zero-weight edges, group into
    evenly-sized chunks of at most ``max_chunk_tiles`` tiles (~2 GB of
    gathered rows at H=128 f32). Small graphs stay single-chunk — each scan
    iteration carries fixed overhead, so splitting is only worth it once the
    monolithic gather would pressure HBM."""
    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float32)
    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order], w[order]

    n_rows_padded = max(row_block, int(-(-n_nodes // row_block)) * row_block)
    block = dst // row_block
    # tiles per block
    n_blocks = n_rows_padded // row_block
    counts = np.bincount(block, minlength=n_blocks)
    # every block needs >= 1 tile: an unvisited output block would keep
    # whatever garbage its buffer held (NaNs included) — a zero-weight dummy
    # tile zero-initializes it
    tiles_per_block = np.maximum(-(-counts // edge_tile), 1)
    tile_base = np.concatenate([[0], np.cumsum(tiles_per_block)])
    n_tiles = int(tile_base[-1])

    # position of each edge within its block
    block_start_edge = np.concatenate([[0], np.cumsum(counts)])
    pos_in_block = np.arange(dst.shape[0]) - block_start_edge[block]
    tile_of_edge = tile_base[block] + pos_in_block // edge_tile
    slot_of_edge = pos_in_block % edge_tile

    src_t = np.zeros((n_tiles, edge_tile), np.int32)
    w_t = np.zeros((n_tiles, edge_tile), np.float32)
    rel_t = np.zeros((n_tiles, edge_tile), np.int32)
    src_t[tile_of_edge, slot_of_edge] = src
    w_t[tile_of_edge, slot_of_edge] = w
    rel_t[tile_of_edge, slot_of_edge] = dst % row_block

    block_of_tile = np.repeat(
        np.arange(n_blocks, dtype=np.int32), tiles_per_block
    )
    if pad_tiles_to > n_tiles:
        # cross-shard alignment: extra dummy tiles repeat the last real
        # tile's block with w=0 (consecutive, so no spurious first-visit
        # zeroing; contribution is exactly zero)
        pad = pad_tiles_to - n_tiles
        src_t = np.concatenate([src_t, np.zeros((pad, edge_tile), np.int32)])
        w_t = np.concatenate([w_t, np.zeros((pad, edge_tile), np.float32)])
        rel_t = np.concatenate([rel_t, np.zeros((pad, edge_tile), np.int32)])
        block_of_tile = np.concatenate(
            [block_of_tile, np.full(pad, block_of_tile[-1], np.int32)]
        )
        n_tiles = pad_tiles_to

    # chunking: pad the tile count to K * C; padding tiles carry w=0 and the
    # last real tile's block (their kernel contribution is exactly zero).
    # Split evenly so no chunk is pathologically small.
    k = -(-n_tiles // max_chunk_tiles)
    c = -(-n_tiles // k)
    t_pad = k * c
    if t_pad > n_tiles:
        pad = t_pad - n_tiles
        src_t = np.concatenate([src_t, np.zeros((pad, edge_tile), np.int32)])
        w_t = np.concatenate([w_t, np.zeros((pad, edge_tile), np.float32)])
        rel_t = np.concatenate([rel_t, np.zeros((pad, edge_tile), np.int32)])
        block_of_tile = np.concatenate(
            [block_of_tile, np.full(pad, block_of_tile[-1], np.int32)]
        )
    visited = np.zeros((k, n_blocks), bool)
    chunk_of_tile = np.arange(t_pad) // c
    visited[chunk_of_tile, block_of_tile] = True

    put = jnp.asarray if device else (lambda a: a)
    return TilePlan(
        src=put(src_t.reshape(k, c, edge_tile)),
        w=put(w_t.reshape(k, c, edge_tile)),
        rel=put(rel_t.reshape(k, c, edge_tile)),
        block_idx=put(block_of_tile.reshape(k, c)),
        visited=put(visited),
        n_rows_padded=n_rows_padded,
        n_rows=n_nodes,
        n_tiles=n_tiles,
        n_chunks=k,
        tiles_per_chunk=c,
        row_block=row_block,
        edge_tile=edge_tile,
        f32_mode=f32_mode,
    )


def build_plan_from_arrays(
    src, dst, w, self_w, n_nodes: int, compute_dtype: str = "float32"
) -> SpmmPlan:
    """Build forward + transpose tile plans from host numpy edge arrays."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    w = np.asarray(w)
    return SpmmPlan(
        fwd=_build_tile_plan(src, dst, w, n_nodes),
        bwd=_build_tile_plan(dst, src, w, n_nodes),
        self_w=jnp.asarray(self_w),
        n_nodes=n_nodes,
        compute_dtype=compute_dtype,
    )


def build_plan(adj) -> SpmmPlan:
    """Build forward + transpose tile plans from a NormAdj."""
    return build_plan_from_arrays(
        np.asarray(adj.src), np.asarray(adj.dst), np.asarray(adj.w), adj.self_w, adj.n_nodes
    )


# ------------------------------------------------------------------ kernel


def _spmm_kernel(block_ref, yg_ref, rel_ref, out_ref, *, row_block, edge_tile,
                 compute_dtype, f32_mode):
    i = pl.program_id(0)
    prev = block_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, block_ref[i] != prev)

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # One-hot scatter matrix M[r, e] = (rel[e] == r), built lane-slice by
    # lane-slice (rel arrives as (edge_tile/128, 128) blocks; broadcasting a
    # (1, 128) row against the (row_block, 128) iota keeps every op in a
    # Mosaic-supported layout — no 1D<->2D shape casts). The edge weights
    # are pre-multiplied into the gathered rows OUTSIDE the kernel (XLA
    # fuses the multiply into the gather), so M's entries are EXACTLY
    # representable in bf16 — which is what makes the 'split2' f32 mode
    # sound: only the yg operand needs bf16 splitting.
    rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, LANE), 0)
    slices = []
    for s in range(edge_tile // LANE):
        rel_s = rel_ref[s, :][None, :]  # (1, LANE) int32
        slices.append(jnp.where(rows == rel_s, 1.0, 0.0))
    m = jnp.concatenate(slices, axis=1)  # (row_block, edge_tile) f32 {0,1}
    yg = yg_ref[0]
    if compute_dtype == jnp.float32 and f32_mode == "split2":
        # exact one-hot in bf16 + hi/lo split of the f32 rows: two DEFAULT
        # bf16 passes instead of HIGHEST's three — ~2^-18 relative
        # representation error (vs ~2^-21 for the 3-pass product), f32
        # accumulation throughout
        m16 = m.astype(jnp.bfloat16)
        y_hi = yg.astype(jnp.bfloat16)
        y_lo = (yg - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out_ref[:] += jnp.dot(
            m16, y_hi, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ) + jnp.dot(
            m16, y_lo, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    else:
        m = m.astype(compute_dtype)  # bf16 mode: MXU runs bf16 x bf16 -> f32
        # f32/'highest' must request HIGHEST precision: the MXU otherwise
        # truncates f32 operands to bf16 passes, costing ~2 decimal digits
        # vs the scatter path
        precision = (
            jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        out_ref[:] += jnp.dot(
            m, yg, preferred_element_type=jnp.float32, precision=precision
        )


def _chunk_call(x_pad, src_c, w_c, rel_c, blk_c, n_rows_padded, h_pad,
                compute_dtype, row_block, edge_tile, f32_mode):
    """One pallas_call over one chunk of tiles. The edge weights multiply
    the gathered rows here in XLA (fused into the gather's consumer chain —
    no extra HBM pass), so the kernel's one-hot matrix is {0, 1}-exact."""
    c = src_c.shape[0]
    edge_tile = int(edge_tile)
    xg = jnp.take(x_pad, src_c.reshape(-1), axis=0).reshape(c, edge_tile, h_pad)
    yg = (xg * w_c[:, :, None]).astype(compute_dtype)
    # Mosaic wants >= 8 sublanes per block: tiles narrower than 8*LANE edges
    # pad their rel vector with unread rows (the kernel only loops over the
    # first edge_tile/LANE slices)
    sub = max(8, edge_tile // LANE)
    rel_in = rel_c.reshape(c, edge_tile // LANE, LANE)
    if sub > edge_tile // LANE:
        rel_in = jnp.pad(rel_in, ((0, 0), (0, sub - edge_tile // LANE), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c,),
        in_specs=[
            pl.BlockSpec(
                (1, edge_tile, h_pad), lambda i, blk: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((sub, LANE), lambda i, blk: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_block, h_pad), lambda i, blk: (blk[i], 0), memory_space=pltpu.VMEM
        ),
    )
    itemsize = jnp.dtype(compute_dtype).itemsize
    passes = 2 if (compute_dtype == jnp.float32 and f32_mode == "split2") else (
        3 if compute_dtype == jnp.float32 else 1
    )
    return pl.pallas_call(
        partial(_spmm_kernel, row_block=row_block, edge_tile=edge_tile,
                compute_dtype=compute_dtype, f32_mode=f32_mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows_padded, h_pad), jnp.float32),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=passes * 2 * c * edge_tile * row_block * h_pad,
            bytes_accessed=c * edge_tile * (h_pad * itemsize + 4)
            + n_rows_padded * h_pad * 4,
            transcendentals=0,
        ),
    )(
        blk_c,
        yg,
        rel_in.reshape(-1, LANE),
    )


def _run_tiles(plan: TilePlan, x: jax.Array, compute_dtype=jnp.float32) -> jax.Array:
    """Apply the tiled aggregation: returns [n, h] float32.

    ``compute_dtype=bfloat16`` halves the gathered-row HBM traffic and runs
    the MXU in native bf16 with float32 accumulation. Multi-chunk plans run
    under ``lax.scan`` so only one chunk's gather (~1 GB) is live at a time.
    """
    n, h = x.shape
    rb, et = plan.row_block, plan.edge_tile
    h_pad = max(LANE, -(-h // LANE) * LANE)
    n_pad = max(plan.n_rows_padded, -(-n // rb) * rb)
    x_pad = jnp.zeros((n_pad, h_pad), compute_dtype).at[:n, :h].set(
        x.astype(compute_dtype)
    )

    if plan.n_chunks == 1:
        out = _chunk_call(
            x_pad,
            plan.src[0],
            plan.w[0],
            plan.rel[0],
            plan.block_idx[0],
            plan.n_rows_padded,
            h_pad,
            compute_dtype,
            rb,
            et,
            plan.f32_mode,
        )
        return out[:plan.n_rows, :h]

    def body(carry, chunk):
        src_c, w_c, rel_c, blk_c, vis_c = chunk
        out_c = _chunk_call(
            x_pad, src_c, w_c, rel_c, blk_c, plan.n_rows_padded, h_pad,
            compute_dtype, rb, et, plan.f32_mode
        )
        # blocks this chunk never visited hold garbage — mask, then add
        # (chunk boundaries can split a block, so partial sums accumulate)
        mask = jnp.repeat(vis_c, rb)[:, None]
        return carry + jnp.where(mask, out_c, 0.0), None

    init = jnp.zeros((plan.n_rows_padded, h_pad), jnp.float32)
    out, _ = jax.lax.scan(
        body, init, (plan.src, plan.w, plan.rel, plan.block_idx, plan.visited)
    )
    return out[:plan.n_rows, :h]


def _zero_cotangent(tree):
    return jax.tree.map(
        lambda a: np.zeros(a.shape, jax.dtypes.float0)
        if not jnp.issubdtype(a.dtype, jnp.floating)
        else jnp.zeros_like(a),
        tree,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spmm_pallas(x, fwd_plan, bwd_plan, compute_dtype):
    return _run_tiles(fwd_plan, x, compute_dtype)


def _spmm_fwd(x, fwd_plan, bwd_plan, compute_dtype):
    return _run_tiles(fwd_plan, x, compute_dtype), (fwd_plan, bwd_plan)


def _spmm_bwd(compute_dtype, res, g):
    fwd_plan, bwd_plan = res
    dx = _run_tiles(bwd_plan, g, compute_dtype)
    return (dx, _zero_cotangent(fwd_plan), _zero_cotangent(bwd_plan))


_spmm_pallas.defvjp(_spmm_fwd, _spmm_bwd)


def spmm_pallas(plan: SpmmPlan, x: jax.Array) -> jax.Array:
    """``(A_hat - diag(self_w)) @ x`` via the Pallas tile kernel.
    The self-loop diagonal is applied by the caller (ops/spmm.py)."""
    return _spmm_pallas(x, plan.fwd, plan.bwd, jnp.dtype(plan.compute_dtype).type)
