"""Hybrid dense-hot / sparse-cold SpMM decomposition.

The per-epoch SpMM is gather-bound on TPU: every edge fetches a random
H-row of ``x`` from HBM (RESULTS.md round-1 analysis — the XLA row gather is
~60% of the SpMM). Text graphs are Zipfian, and that is exploitable
structure: a few thousand *hot* nodes (frequent words) are an endpoint of
most edges. Splitting the adjacency at a hot set H of size K:

    A_hat = [A_hh A_hc]   →  out  = D @ x[hot]                (src ∈ H)
            [A_ch A_cc]      out[hot] += Dᵀ @ x - A_hh @ x[hot] (dst ∈ H, src ∉ H)
                             out += pallas(A_cc, x)             (both cold)
                             out += self_w ⊙ x

where ``D[n, k] = Σ w(hot_k → n)`` is ONE dense ``N x K`` matrix that — by
the symmetry of the normalized adjacency (w(i→j) == w(j→i), both directions
stored; text2graph.py:162-171) — also serves the transposed role, and
``A_hh = D[hot]`` (K x K) removes the double-counted hot-hot block.

Every hot edge thus rides the MXU in large dense matmuls at streaming HBM
bandwidth instead of a per-edge random gather; on a Zipf-1.05 corpus built
through Text2Graph, K=2048 leaves only ~12% of edges on the gather path
(K=4096: ~5%). This replaces what torch-scatter does for the reference
(SURVEY.md §2.3 item 2) with a decomposition only a dense-matmul machine
would choose.

Cold-cold residual edges run in the existing Pallas tile kernel
(ops/spmm_pallas.py). Everything here is plain XLA, so autodiff handles the
dense parts (transposed reads of D in backward) and the residual brings its
custom VJP.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# cost-model constants, calibrated against the real-chip probes
# (experiments/chip_probe.py, experiments/probe_fused.py; RESULTS.md
# "round 2"): measured streaming bandwidth ~220 GB/s and ~6 ns per
# residual edge slot in the Pallas tile path. The MXU roofs are the
# *effective* rates at H=128 matmul shapes, settled empirically by the
# fused dual kernel: reading D exactly ONCE (115 GB/s — bandwidth
# demonstrably not binding) it still ran 87 GFLOP in 5.93 ms f32/HIGHEST
# (14.7 TF/s) and 3.70 ms bf16 (23.5 TF/s). An earlier revision assumed an
# architectural ~33 TF/s roof on the theory that the 14.1 TF/s dense probe
# was bandwidth-bound; the single-read measurement refutes that. The model
# only has to rank candidate K values; the zipf probe shows K=2048-4096
# within 12% of each other, so coarse constants are fine.
# r5: raised from the r2-era 2.2e11 to the slope-timed D-read measurement
# (423-437 GB/s across sessions, ops/probe.py / chip_probe.py; the r2
# 220 GB/s number was an artifact of the pre-fix timing loop). Ranking
# consequence at bench scale: the dense stream stops being over-priced
# ~2x, which moves the auto-K optimum to the measured-best cell
# (K=8192 under split2+dense_split: 6.19 ms/app vs 6.37 at 4096,
# docs/hybrid_parts_r5.log).
_HBM_BPS = 4.2e11
_MXU_F32_HIGHEST = 1.45e13
# bf16 [N,K]@[K,H] effective ratio over f32-HIGHEST. The r2-era 1.6 was
# the v1 fused kernel's rate; the r5 in-step K sweep (bf16 K=2048/4096/
# 8192 = 44.2/29.7/21.3 ms/step, docs/step_bf16_sweep_r5.log) fits an
# effective ~50 TF/s for the plain-XLA bf16 dual at these shapes — the
# probed DEFAULT-bf16 MXU roof is 176-222 TF/s, so the streaming bytes
# and the kk term bind, not the MXU; 3.5 prices exactly that regime and
# resolves auto-K to the measured-best 8192
_MXU_BF16_FACTOR = 3.5
_EDGE_NS = 6.0
# hard per-edge floor for any gather-formulated residual: the chip's
# measured random-row gather issue rate (0.427 Grows/s, chip_probe.py) —
# unlike _EDGE_NS (the *observed* tile-kernel rate incl. padding, used to
# rank K candidates), this is what no gather formulation can beat
_GATHER_NS = 2.34


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["hot_ids", "d_full", "d_lo", "a_hh", "res_fwd", "res_bwd",
                 "seg_src", "seg_dst", "seg_w"],
    meta_fields=["n_nodes", "k", "compute_dtype", "fused", "predicted_spmm_ns",
                 "floor_spmm_ns", "n_resid"],
)
@dataclasses.dataclass
class HybridPlan:
    """Hot-set decomposition of a normalized adjacency (minus self-loops).

    hot_ids: int32 [K] node ids of the hot set (descending degree).
    d_full:  [N, K] dense ``Σ w(hot_k → n)`` (f32, or bf16 in fast mode).
             With ``fused`` the rows are zero-padded to the fused kernel's
             block multiple (built padded — never copied after the fact).
    a_hh:    [K, K] hot-hot block (= d_full[hot_ids]).
    res_fwd/res_bwd: Pallas tile plans over the cold-cold residual edges
             (None when the residual is empty or rides the segment path).
    seg_src/seg_dst/seg_w: the residual as raw COO for the XLA segment path
             (``resid_mode='segment'`` — cheaper than the tile kernel's
             block padding for small residuals, and vmappable, which the
             expert-parallel ensemble step relies on).
    fused:   route the two D products through the one-pass-over-D Pallas
             kernel (ops/fused_dual.py) instead of two XLA matmuls.
    """

    hot_ids: jax.Array
    d_full: jax.Array
    d_lo: Optional[jax.Array]  # bf16 low half when the dense split is on
    a_hh: jax.Array
    res_fwd: Optional[object]
    res_bwd: Optional[object]
    seg_src: Optional[jax.Array]
    seg_dst: Optional[jax.Array]
    seg_w: Optional[jax.Array]
    n_nodes: int
    k: int
    compute_dtype: str = "float32"
    fused: bool = False
    # residual (cold-cold) edge count — lets bench.py re-derive the floor
    # from RUN-TIME chip probes (ops/probe.py) instead of the frozen
    # constants above (VERDICT r2 item 3)
    n_resid: int = 0
    # calibrated cost-model *prediction* for one application (ns; the number
    # choose_hot_k ranks by) and the *hard floor* (dense roofline term +
    # residual at the measured gather issue rate, no padding inflation) —
    # bench.py reports measured/floor as fraction_of_achievable
    predicted_spmm_ns: float = 0.0
    floor_spmm_ns: float = 0.0


def _predict_cost_ns(n_nodes: int, n_edges: int, resid_edges: int, k: int, h: int,
                     itemsize: int, d_reads: int = 2, batch: int = 1,
                     dense_split: bool = False,
                     edge_ns: float = None) -> float:
    """Rough per-SpMM cost of a K-hot decomposition (see module docstring).
    ``d_reads``: how many times the [N, K] block D streams from HBM per
    application — 2 with separate XLA matmuls, 1 under the fused dual
    kernel (ops/fused_dual.py). ``batch``: how many models apply the SAME
    adjacency per step (the vmapped EP ensemble, hierarchy/perlabel.py) —
    the batched dense contraction streams D once for all of them (bytes
    unchanged, FLOPs xB) while the residual pays per member, so the
    optimum K grows with the ensemble."""
    dense_bytes = (d_reads * n_nodes * k + k * k) * itemsize
    dense_flops = 2 * (2 * n_nodes * k) * h * batch
    # the K x K hot-hot correction (a_hh @ x_hot) is a SMALL matmul — it
    # runs at the chip's small-shape effective rate, not the streaming
    # [N, K] rate, and grows quadratically: the r5 K sweep's 'other'
    # column (docs/hybrid_parts_r5.log: 0.42/1.00/2.16/3.06 ms at
    # K=4/8/12/16k) fits 2K²h at ~14.5 TF/s, which is what un-priced
    # K=12288+ candidates were hiding
    kk_ns = 2 * k * k * h * batch / _MXU_F32_HIGHEST * 1e9
    if dense_split:
        # hi/lo bf16 pair: same total bytes as f32 D (2 arrays x 2 B),
        # read once, at the split kernel's measured effective rate
        mxu = _MXU_SPLIT_DENSE
    elif itemsize == 4:
        mxu = _MXU_F32_HIGHEST
    else:
        mxu = _MXU_BF16_FACTOR * _MXU_F32_HIGHEST
    # memory traffic and MXU time overlap on TPU; the slower one dominates
    dense_ns = max(dense_bytes / _HBM_BPS, dense_flops / mxu) * 1e9 + kk_ns
    return dense_ns + resid_edges * (_EDGE_NS if edge_ns is None
                                     else edge_ns) * batch


_PAD_FACTOR = 1.6  # measured tile-plan slot inflation over raw edge counts
# bump when the constants above change enough to move choose_hot_k's
# resolution — plan_cache folds this into 'auto' keys so a recalibration
# invalidates stale auto-resolved entries (r5: 1 -> 2, bandwidth + split
# rate recalibration moved bench-scale auto-K from 4096 to 8192)
COST_MODEL_VERSION = 3
# split-fused dense pair (ops/fused_dual.fused_dual_split): effective MXU
# rate on BASE flops (not x3 passes) — chip-measured 86.6 GFLOP in 1.66 ms
# at N=41305 K=4096 H=128 (docs/hybrid_parts_r5.log), i.e. the pair is at
# the HBM bandwidth floor (677 MB once at ~420 GB/s); the rate constant
# only matters when a K candidate would push it compute-bound
_MXU_SPLIT_DENSE = 5.2e13
# per-slot residual rate by f32 mode: 'highest' is the original 3-pass
# measurement; 'split2' drops to ~4.3 ns/edge (4.30 ms / 0.99M edges at
# K=4096, docs/hybrid_parts_r5.log). bf16 keeps the conservative 6.0 —
# the split2 extrapolation made the model under-price bf16 residuals
# and the in-step bf16 sweep (docs/step_bf16_sweep_r5.log) is fit by
# the 6.0 rate
_EDGE_NS_MODE = {"highest": _EDGE_NS, "split2": 4.3, "bf16": _EDGE_NS}


def choose_hot_k(src, n_nodes: int, h: int = 128, itemsize: int = 4,
                 candidates=(0, 512, 1024, 2048, 4096, 8192, 12288, 16384),
                 dst=None, d_reads: int = 2, batch: int = 1,
                 segment_resid: bool = False, dense_split: bool = False,
                 edge_ns: float = _EDGE_NS) -> int:
    """Pick K minimizing the modeled SpMM cost (0 = hybrid not worth it).

    With ``dst`` given, the cold-cold residual is counted exactly per
    candidate (one vectorized pass each); without it, an independence
    estimate from the src-degree coverage is used. ``d_reads``: per-
    application HBM reads of D (1 when the fused dual kernel is on) —
    cheaper dense halves shift the optimum toward larger K, as does
    ``batch`` > 1 (vmapped EP ensembles share the D stream but pay the
    residual per member). ``segment_resid``: cost the residual at the
    segment path's measured per-edge rate instead of the tile kernel's
    padded-slot rate (resid_mode='segment', the vmappable EP form).
    """
    src = np.asarray(src)
    deg = np.bincount(src, minlength=n_nodes)
    order = np.argsort(-deg, kind="stable")
    e = len(src)
    rank = np.empty(n_nodes, np.int64)
    rank[order] = np.arange(n_nodes)
    r_src = rank[src]
    r_dst = rank[np.asarray(dst)] if dst is not None else None
    cum = np.concatenate([[0], np.cumsum(deg[order])])
    # per-edge residual cost in _EDGE_NS units (matches build_hybrid_plan's
    # resid_slots conversion for each mode)
    slot_factor = (4 * _GATHER_NS / edge_ns) if segment_resid else _PAD_FACTOR
    best_k, best_t = 0, e * slot_factor * edge_ns * batch
    for k in candidates:
        if k == 0 or k >= n_nodes:
            continue
        # d_full memory budget: a batched ensemble amortizes the block's
        # HBM residency and plan-build cost over its members, so the cap
        # scales with batch (bounded well under the 16 GB chip HBM)
        if n_nodes * k * itemsize > min(1.5e9 * batch, 4e9):
            continue  # d_full would not be worth its HBM/plan-build cost
        if r_dst is not None:
            resid = int(np.sum((r_src >= k) & (r_dst >= k)))
        else:
            cov = cum[k] / max(e, 1)
            resid = e * max(1.0 - cov, 0.0) ** 2
        t = _predict_cost_ns(n_nodes, e, resid * slot_factor, k, h, itemsize,
                             d_reads=d_reads, batch=batch,
                             dense_split=dense_split, edge_ns=edge_ns)
        if t < best_t:
            best_k, best_t = k, t
    return best_k


@partial(jax.jit, static_argnames=("n_rows", "k", "compute_dtype", "split"))
def _scatter_dense_block(dst_sel, rank_sel, w_sel, hot_ids, *, n_rows, k,
                         compute_dtype, split=False):
    """Device-side accumulation of D[n, k] = sum w(hot_k -> n) + its hot
    rows; dtype cast happens on device too (host bf16 conversion of a
    677 MB block costs ~30 s via ml_dtypes). ``n_rows`` >= n_nodes: under
    the fused kernel D is built with rows zero-padded to the block
    multiple, so no per-application pad-copy is ever needed. ``split``:
    emit ``(d_hi, d_lo, a_hh)`` for the split-fused dense path
    (ops/fused_dual.fused_dual_split) — the bf16 pair carries D to ~2^-18
    relative, and a_hh stays the f32 reconstruction hi+lo so the hot-hot
    correction is consistent with the D the kernel actually applies."""
    d_full = jnp.zeros((n_rows, k), jnp.float32)
    d_full = d_full.at[dst_sel, rank_sel].add(w_sel)
    a_hh = jnp.take(d_full, hot_ids, axis=0)
    if split:
        from .fused_dual import split_bf16

        d_hi, d_lo = split_bf16(d_full)
        a_hh = (jnp.take(d_hi, hot_ids, axis=0).astype(jnp.float32)
                + jnp.take(d_lo, hot_ids, axis=0).astype(jnp.float32))
        return d_hi, d_lo, a_hh
    cd = jnp.dtype(compute_dtype)
    return d_full.astype(cd), a_hh.astype(cd)


def check_weight_symmetric(src, dst, w, sel=None):
    """Verify the (selected) edge list is weight-symmetric: every edge
    (i, j, w) has a mirror (j, i, w). The hybrid decomposition's
    hot-destination term computes ``D^T @ x`` — substituting outgoing hot
    weights for incoming ones — so it is exact ONLY under this symmetry
    (which Text2Graph guarantees: PMI edges are emitted in both directions,
    doc<->word edges carry the same TF-IDF both ways). Raises ValueError on
    the first asymmetric input instead of silently computing a wrong SpMM.
    """
    if sel is not None:
        src, dst, w = src[sel], dst[sel], w[sel]
    o1 = np.lexsort((w, dst, src))
    o2 = np.lexsort((w, src, dst))
    # weights compare with a tight relative tolerance: symmetric
    # normalization computes (dinv_i*w)*dinv_j vs (dinv_j*w)*dinv_i, which
    # differ in the last ulp
    if not (
        np.array_equal(src[o1], dst[o2])
        and np.array_equal(dst[o1], src[o2])
        and np.allclose(w[o1], w[o2], rtol=1e-5, atol=1e-12)
    ):
        raise ValueError(
            "hybrid SpMM requires a weight-symmetric adjacency (every edge "
            "(i,j,w) mirrored as (j,i,w)) for edges touching the hot set; "
            "this edge list is directed or half-stored. Use the segment or "
            "Pallas path (hybrid_k=None) for non-symmetric operators."
        )


def dense_block_host(dst_sel, rank_sel, w_sel, n_rows: int, k: int) -> np.ndarray:
    """Accumulate the [n_rows, K] dense hot block on host. scipy's COO
    densification sums duplicates in C at ~10x np.add.at's rate (the warm
    plan-cache load and CPU cold builds both sit on this)."""
    from scipy import sparse

    m = sparse.coo_matrix(
        (np.asarray(w_sel, np.float32),
         (np.asarray(dst_sel, np.int64), np.asarray(rank_sel, np.int64))),
        shape=(n_rows, k), dtype=np.float32,
    )
    return m.toarray()


def check_weight_symmetric_fast(src, dst, w, n_nodes: int, seed: int = 0):
    """O(E) randomized audit of weight symmetry (for graphs whose
    construction already guarantees it — ``TextGraph.weight_symmetric``).

    The multiset {(i, j, w)} equals its transpose iff, for independent
    random node vectors r1, r2, the bilinear forms ``Σ w·r1[src]·r2[dst]``
    and ``Σ w·r1[dst]·r2[src]`` agree (a Schwartz-Zippel-style identity
    check; two draws push the false-accept probability to negligible).
    Replaces the full O(E log E) double-lexsort audit
    (:func:`check_weight_symmetric`), which dominated hybrid plan builds
    (~5 s of a 10 s build at E=3M; VERDICT r2 Weak #5).
    """
    rng = np.random.default_rng(seed)
    w = np.asarray(w, np.float64)
    for _ in range(2):
        r1 = rng.standard_normal(n_nodes)
        r2 = rng.standard_normal(n_nodes)
        a = float(np.sum(w * r1[src] * r2[dst]))
        b = float(np.sum(w * r1[dst] * r2[src]))
        scale = float(np.sum(np.abs(w * r1[src] * r2[dst]))) + 1e-30
        if abs(a - b) > 1e-6 * scale:
            raise ValueError(
                "randomized symmetry audit failed: the adjacency is not "
                "weight-symmetric despite TextGraph.weight_symmetric=True"
            )


def build_hybrid_plan(
    src,
    dst,
    w,
    n_nodes: int,
    hot_k="auto",
    compute_dtype: str = "float32",
    h_hint: int = 128,
    validate=True,
    fused: Optional[bool] = None,
    resid_mode: str = "pallas",
    batch: int = 1,
    resid_row_block: Optional[int] = None,
    resid_edge_tile: Optional[int] = None,
    resid_f32_mode: Optional[str] = None,
    dense_split: Optional[bool] = None,
) -> Optional[HybridPlan]:
    """Host-side construction. ``hot_k``: int (0 = disabled), or 'auto' to
    pick by cost model (returns None if the model says pure-Pallas wins).
    ``validate=False`` skips the weight-symmetry precondition check — only
    for timing probes where the numeric result is discarded. ``fused``:
    compute both D products in one pass over D (ops/fused_dual.py);
    default = compiled TPU backends only (the interpreter is far slower
    than XLA dots on CPU). ``resid_mode``: 'pallas' | 'segment' | 'auto' —
    how the cold-cold residual executes; 'segment' (raw COO through
    jax.ops.segment_sum) beats the tile kernel's block padding for small
    residuals and is vmappable (the EP ensemble step requires it); 'auto'
    picks by modeled cost. ``batch``: number of models applying this plan
    per step (vmapped EP ensembles) — biases the auto-K choice toward
    larger hot sets, since the batched dense half streams D once for all
    members while the residual pays per member. ``resid_row_block`` /
    ``resid_edge_tile`` / ``resid_f32_mode``: tile geometry + f32 MXU
    strategy for the cold-cold residual kernel (None = the chip-swept
    RESID_* defaults in ops/spmm_pallas.py —
    experiments/probe_resid_kernel.py). ``dense_split``: route the dense
    pair through the hi/lo bf16 split-fused kernel
    (ops/fused_dual.fused_dual_split — split2 precision class, reads the
    D pair once, DEFAULT-precision bf16 MXU passes). None resolves to the
    chip-validated default: on under f32 'split2' mode (where the
    residual already carries the same precision license), off otherwise."""
    from .spmm_pallas import RESID_F32_MODE, _build_tile_plan, resid_geometry

    if resid_f32_mode is None:
        resid_f32_mode = RESID_F32_MODE
    if dense_split is None:
        # batch > 1 means the plan is applied under vmap (the EP ensemble
        # step): the split kernel's scoped-VMEM footprint at the swept
        # geometry exceeds the 16 MB limit once vmap batches its operands
        # (chip-measured at K=8192 x batch 6: 16.4 MB requested), so
        # batched plans keep the dense pair on plain XLA matmuls
        dense_split = (
            jnp.dtype(compute_dtype) == jnp.float32
            and resid_f32_mode == "split2"
            and batch == 1
        )
    dense_split = bool(dense_split) and jnp.dtype(compute_dtype) == jnp.float32
    geom = resid_geometry(compute_dtype, resid_f32_mode)
    if resid_row_block is None:
        resid_row_block = geom[0]
    if resid_edge_tile is None:
        resid_edge_tile = geom[1]

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    w = np.asarray(w, np.float32)
    itemsize = jnp.dtype(compute_dtype).itemsize
    if fused is None:
        # measured on the v5e (probe_fused.py, N=41472 K=4096 H=128): the
        # dual product is MXU-compute-bound, not bandwidth-bound — at
        # lane-padded H=128 the f32/HIGHEST arithmetic intensity (H/2 = 64
        # flops/byte) sits exactly at the chip's measured balance point
        # (14.1 TFLOP/s / 220 GB/s), so reading D once instead of twice
        # gains only 1.07x f32 / ~1.0x bf16. Default stays off; the knob
        # remains for bandwidth-bound regimes (future chips with a higher
        # compute:bandwidth ratio, or sub-128 effective lanes).
        fused = False
    auto = hot_k == "auto"
    mode_edge_ns = _EDGE_NS_MODE.get(
        "bf16" if jnp.dtype(compute_dtype) == jnp.bfloat16 else resid_f32_mode,
        _EDGE_NS)
    if auto:
        hot_k = choose_hot_k(src, n_nodes, h=h_hint, itemsize=itemsize, dst=dst,
                             d_reads=1 if (fused or dense_split) else 2, batch=batch,
                             segment_resid=resid_mode == "segment",
                             dense_split=dense_split, edge_ns=mode_edge_ns)
    if not hot_k:  # 0/None: the decomposition is off, pure sparse path wins
        return None
    k = int(min(hot_k, n_nodes))
    if k >= 128:
        k = (k // 128) * 128  # MXU-aligned when the graph allows it
    k = max(1, k)

    deg = np.bincount(src, minlength=n_nodes)
    order = np.argsort(-deg, kind="stable")
    hot_ids = np.sort(order[:k]).astype(np.int32)  # sorted: nicer gathers
    hot_rank = np.full(n_nodes, -1, np.int64)
    hot_rank[hot_ids] = np.arange(k)

    src_hot = hot_rank[src] >= 0
    dst_hot = hot_rank[dst] >= 0
    if validate:
        try:
            if validate == "fast":
                # construction-guaranteed symmetry (Text2Graph output):
                # O(E) randomized audit over ALL edges instead of the
                # O(E log E) lexsort proof over the hot-touching subset
                check_weight_symmetric_fast(src, dst, w, n_nodes)
            else:
                check_weight_symmetric(src, dst, w, sel=src_hot | dst_hot)
        except ValueError:
            if auto:
                # under 'auto' a directed/half-stored operator silently
                # falls back to the pure sparse paths, which are exact for
                # it; a hard error is reserved for an explicitly forced K
                import warnings

                warnings.warn(
                    "hybrid_k='auto': adjacency is not weight-symmetric; "
                    "falling back to the pure sparse SpMM path",
                    stacklevel=2,
                )
                return None
            raise

    # the fused/split kernels want row-block-aligned D; build it padded
    # (zero rows), never pad-copy the built block afterwards
    n_rows = -(-n_nodes // 512) * 512 if (fused or dense_split) else n_nodes

    sel = src_hot
    d_lo = None
    if jax.default_backend() == "cpu":
        # Host accumulation (XLA CPU scatter is ~40x slower than host code)
        d_host = dense_block_host(dst[sel], hot_rank[src[sel]], w[sel],
                                  n_rows, k)
        if dense_split:
            from .fused_dual import split_bf16

            d_full, d_lo = split_bf16(jnp.asarray(d_host))
            a_hh = jnp.asarray(
                np.asarray(d_full[hot_ids], np.float32)
                + np.asarray(d_lo[hot_ids], np.float32))
        else:
            cd = jnp.dtype(compute_dtype)
            d_full = jnp.asarray(d_host, cd)
            a_hh = jnp.asarray(d_host[hot_ids], cd)
    else:
        # On-device accumulation: a host-side np.add.at at bench scale
        # (E~9M, K=4096 -> 677 MB) costs ~2 min on this lazily page-backed
        # host (first-touch faults), while shipping just the selected edges
        # (int32 ids + f32 weights, ~70 MB) and scatter-adding under jit is
        # seconds. Edge arrays are jit *arguments*, never constants.
        blocks = _scatter_dense_block(
            jnp.asarray(dst[sel], jnp.int32),
            jnp.asarray(hot_rank[src[sel]], jnp.int32),
            jnp.asarray(w[sel]),
            jnp.asarray(hot_ids),
            n_rows=n_rows,
            k=k,
            compute_dtype=compute_dtype,
            split=dense_split,
        )
        if dense_split:
            d_full, d_lo, a_hh = blocks
        else:
            d_full, a_hh = blocks

    rsel = ~src_hot & ~dst_hot
    res_fwd = res_bwd = None
    seg_src = seg_dst = seg_w = None
    n_resid = int(rsel.sum())
    resid_slots = n_resid * _PAD_FACTOR
    if n_resid:
        if resid_mode == "auto":
            # same trade the restricted head models (ops/restricted.py):
            # the segment path costs ~4x the raw gather issue rate per edge
            # once the scatter half and launch overheads are in
            use_tiles = resid_slots * _EDGE_NS < n_resid * 4 * _GATHER_NS
        else:
            use_tiles = resid_mode != "segment"
        if use_tiles:
            res_fwd = _build_tile_plan(
                src[rsel], dst[rsel], w[rsel], n_nodes,
                row_block=resid_row_block, edge_tile=resid_edge_tile,
                f32_mode=resid_f32_mode)
            res_bwd = _build_tile_plan(
                dst[rsel], src[rsel], w[rsel], n_nodes,
                row_block=resid_row_block, edge_tile=resid_edge_tile,
                f32_mode=resid_f32_mode)
        else:
            seg_src = jnp.asarray(src[rsel], jnp.int32)
            seg_dst = jnp.asarray(dst[rsel], jnp.int32)
            seg_w = jnp.asarray(w[rsel], jnp.float32)
            resid_slots = n_resid * 4 * _GATHER_NS / mode_edge_ns  # same ns units

    predicted_ns = _predict_cost_ns(
        n_nodes, len(src), resid_slots, k, h_hint,
        itemsize, d_reads=1 if (fused or dense_split) else 2,
        dense_split=dense_split, edge_ns=mode_edge_ns,
    )
    floor_ns = (
        _predict_cost_ns(n_nodes, len(src), 0, k, h_hint, itemsize,
                         d_reads=1 if (fused or dense_split) else 2, dense_split=dense_split)
        + n_resid * _GATHER_NS
    )
    return HybridPlan(
        hot_ids=jnp.asarray(hot_ids),
        d_full=d_full,
        d_lo=d_lo,
        a_hh=a_hh,
        res_fwd=res_fwd,
        res_bwd=res_bwd,
        seg_src=seg_src,
        seg_dst=seg_dst,
        seg_w=seg_w,
        n_nodes=n_nodes,
        k=k,
        compute_dtype=compute_dtype,
        fused=bool(fused),
        predicted_spmm_ns=float(predicted_ns),
        floor_spmm_ns=float(floor_ns),
        n_resid=n_resid,
    )


def spmm_hybrid(plan: HybridPlan, x: jax.Array) -> jax.Array:
    """``(A_hat - diag(self_w)) @ x`` via the hot decomposition."""
    cd = jnp.dtype(plan.compute_dtype)
    # parity mode keeps f32 operands; the MXU truncates f32 to bf16 passes
    # unless HIGHEST is requested (see spmm_pallas._spmm_kernel)
    precision = (
        jax.lax.Precision.HIGHEST
        if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    xc = x.astype(cd)
    x_hot = jnp.take(xc, plan.hot_ids, axis=0)  # (K, H) — K-row gather only

    n = plan.n_nodes
    if plan.d_lo is not None:
        # split-fused dense pair: D as a bf16 (hi, lo) pair read once,
        # DEFAULT-precision bf16 MXU passes (split2 class; fused_dual.py v2)
        from .fused_dual import fused_dual_split
        from .spmm_pallas import _use_interpret

        n_rows = plan.d_full.shape[0]
        x_in = jnp.pad(xc, ((0, n_rows - n), (0, 0))) if n_rows != n else xc
        out, hot_in = fused_dual_split(
            plan.d_full, plan.d_lo, x_in, x_hot, interpret=_use_interpret()
        )
        out = out[:n]
    elif plan.fused:
        # both D products in one pass over D (ops/fused_dual.py); D was
        # built with rows padded to the kernel's block multiple, x pads to
        # match (cheap — x is skinny) and out slices back
        from .fused_dual import fused_dual
        from .spmm_pallas import _use_interpret

        n_rows = plan.d_full.shape[0]
        x_in = jnp.pad(xc, ((0, n_rows - n), (0, 0))) if n_rows != n else xc
        out, hot_in = fused_dual(
            plan.d_full, x_in, x_hot, interpret=_use_interpret()
        )
        out = out[:n]
    else:
        out = jnp.dot(
            plan.d_full, x_hot, preferred_element_type=jnp.float32,
            precision=precision,
        )[:n]
        # dst ∈ hot from ALL sources: Dᵀ @ x (contraction over nodes; XLA
        # reads D in its stored layout)
        hot_in = jax.lax.dot_general(
            plan.d_full[:n],
            xc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    # minus the double-counted hot-hot block
    hot_in = hot_in - jnp.dot(
        plan.a_hh, x_hot, preferred_element_type=jnp.float32, precision=precision
    )
    out = out.at[plan.hot_ids].add(hot_in)

    if plan.res_fwd is not None:
        from .spmm_pallas import _spmm_pallas

        out = out + _spmm_pallas(x, plan.res_fwd, plan.res_bwd, cd.type)
    if plan.seg_src is not None:
        contrib = plan.seg_w[:, None] * jnp.take(x, plan.seg_src, axis=0)
        out = out + jax.ops.segment_sum(
            contrib, plan.seg_dst, num_segments=plan.n_nodes
        )
    return out
