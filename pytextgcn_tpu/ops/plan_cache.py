"""Persistent cache for hybrid SpMM plans.

VERDICT r2 Weak #5: hybrid plan construction cost 5-32 s per configuration
at protocol scale, and every fresh process paid it again because plans were
never persisted with the graph artifact. This module stores the *host-built*
parts of a :class:`~pytextgcn_tpu.ops.hybrid.HybridPlan` — hot ids, the
residual tiling / COO arrays, cost fields — in an ``.npz`` keyed by a
fingerprint of the edge arrays and every build parameter. The two large
device blocks (``d_full``/``a_hh``, up to GBs) are deliberately NOT stored:
they are rebuilt at load time by the same on-device scatter the cold build
uses (seconds), so a warm load is dominated by the normalization +
fingerprint pass (~sub-second at E=9M).

Layout: ``<cache_dir>/hybridplan-<key>.npz``. The key covers the edge
fingerprint, n_nodes, and (hot_k, compute_dtype, fused, resid_mode, batch,
h_hint, format version), so any change misses cleanly.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

import numpy as np

# v3: dense_split flag (hi/lo bf16 dense pair, r5). v4: batched (EP)
# plans resolve dense_split=False — the derivation changed and
# dense_split is not part of the key, so v3 entries saved under the old
# rule must miss (a stale batched d_lo plan VMEM-OOMs under vmap)
_FORMAT_VERSION = 4

from .spmm_pallas import F32_MODES as _F32_MODES  # single source of truth


def graph_fingerprint(src: np.ndarray, dst: np.ndarray, w: np.ndarray,
                      n_nodes: int) -> str:
    """Blake2b over the raw edge arrays (the *unnormalized* weights — the
    plan is a function of them plus n_nodes)."""
    h = hashlib.blake2b(digest_size=16)
    h.update(np.int64(n_nodes).tobytes())
    for a in (src, dst, w):
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _plan_key(fp: str, hot_k, compute_dtype, fused, resid_mode, batch,
              h_hint, resid_geom=None) -> str:
    h = hashlib.blake2b(digest_size=12)
    h.update(
        repr((_FORMAT_VERSION, fp, hot_k, compute_dtype, fused, resid_mode,
              batch, h_hint, resid_geom)).encode()
    )
    return h.hexdigest()


def _tile_fields(tp, prefix: str) -> dict:
    return {
        f"{prefix}_src": np.asarray(tp.src),
        f"{prefix}_w": np.asarray(tp.w),
        f"{prefix}_rel": np.asarray(tp.rel),
        f"{prefix}_block_idx": np.asarray(tp.block_idx),
        f"{prefix}_visited": np.asarray(tp.visited),
        f"{prefix}_meta": np.asarray(
            [tp.n_rows_padded, tp.n_rows, tp.n_tiles, tp.n_chunks,
             tp.tiles_per_chunk, tp.row_block, tp.edge_tile,
             _F32_MODES.index(tp.f32_mode)], np.int64
        ),
    }


def _tile_from(z, prefix: str):
    import jax.numpy as jnp

    from .spmm_pallas import TilePlan

    if f"{prefix}_src" not in z:
        return None
    meta = z[f"{prefix}_meta"]
    return TilePlan(
        src=jnp.asarray(z[f"{prefix}_src"]),
        w=jnp.asarray(z[f"{prefix}_w"]),
        rel=jnp.asarray(z[f"{prefix}_rel"]),
        block_idx=jnp.asarray(z[f"{prefix}_block_idx"]),
        visited=jnp.asarray(z[f"{prefix}_visited"]),
        n_rows_padded=int(meta[0]), n_rows=int(meta[1]), n_tiles=int(meta[2]),
        n_chunks=int(meta[3]), tiles_per_chunk=int(meta[4]),
        row_block=int(meta[5]), edge_tile=int(meta[6]),
        f32_mode=_F32_MODES[int(meta[7])],
    )


def save_plan(cache_dir: str, key: str, plan) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    arrays = {
        "hot_ids": np.asarray(plan.hot_ids),
        "meta_f": np.asarray(
            [plan.predicted_spmm_ns, plan.floor_spmm_ns], np.float64
        ),
        "meta_i": np.asarray(
            [plan.n_nodes, plan.k, int(plan.fused), plan.n_resid,
             int(plan.d_lo is not None)], np.int64
        ),
        "compute_dtype": np.frombuffer(
            str(plan.compute_dtype).encode(), dtype=np.uint8
        ),
    }
    if plan.seg_src is not None:
        arrays["seg_src"] = np.asarray(plan.seg_src)
        arrays["seg_dst"] = np.asarray(plan.seg_dst)
        arrays["seg_w"] = np.asarray(plan.seg_w)
    if plan.res_fwd is not None:
        arrays.update(_tile_fields(plan.res_fwd, "resf"))
        arrays.update(_tile_fields(plan.res_bwd, "resb"))
    path = os.path.join(cache_dir, f"hybridplan-{key}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)  # uncompressed: load speed is the point
    os.replace(tmp, path)
    return path


def load_plan(cache_dir: str, key: str, src, dst, norm_w):
    """Load a cached plan and rebuild its dense blocks from the (already
    normalized) edge arrays. Returns None on a miss."""
    import jax
    import jax.numpy as jnp

    from .hybrid import HybridPlan, _scatter_dense_block, dense_block_host

    path = os.path.join(cache_dir, f"hybridplan-{key}.npz")
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        hot_ids = z["hot_ids"]
        meta_i = [int(v) for v in z["meta_i"]]
        n_nodes, k, fused, n_resid = meta_i[:4]
        dense_split = bool(meta_i[4]) if len(meta_i) > 4 else False
        predicted_ns, floor_ns = (float(v) for v in z["meta_f"])
        compute_dtype = bytes(z["compute_dtype"]).decode()
        seg_src = jnp.asarray(z["seg_src"]) if "seg_src" in z else None
        seg_dst = jnp.asarray(z["seg_dst"]) if "seg_dst" in z else None
        seg_w = jnp.asarray(z["seg_w"]) if "seg_w" in z else None
        res_fwd = _tile_from(z, "resf")
        res_bwd = _tile_from(z, "resb")

    src = np.asarray(src, np.int64)
    dst = np.asarray(dst, np.int64)
    norm_w = np.asarray(norm_w, np.float32)
    hot_rank = np.full(n_nodes, -1, np.int64)
    hot_rank[hot_ids] = np.arange(k)
    sel = hot_rank[src] >= 0
    n_rows = -(-n_nodes // 512) * 512 if (fused or dense_split) else n_nodes
    d_lo = None
    if jax.default_backend() == "cpu":
        d_host = dense_block_host(dst[sel], hot_rank[src[sel]], norm_w[sel],
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
        blocks = _scatter_dense_block(
            jnp.asarray(dst[sel], jnp.int32),
            jnp.asarray(hot_rank[src[sel]], jnp.int32),
            jnp.asarray(norm_w[sel]),
            jnp.asarray(hot_ids.astype(np.int32)),
            n_rows=n_rows, k=k, compute_dtype=compute_dtype,
            split=dense_split,
        )
        if dense_split:
            d_full, d_lo, a_hh = blocks
        else:
            d_full, a_hh = blocks
    return HybridPlan(
        hot_ids=jnp.asarray(hot_ids.astype(np.int32)),
        d_full=d_full, d_lo=d_lo, a_hh=a_hh,
        res_fwd=res_fwd, res_bwd=res_bwd,
        seg_src=seg_src, seg_dst=seg_dst, seg_w=seg_w,
        n_nodes=n_nodes, k=k, compute_dtype=compute_dtype,
        fused=bool(fused), predicted_spmm_ns=predicted_ns,
        floor_spmm_ns=floor_ns, n_resid=n_resid,
    )


def load_or_build(cache_dir: Optional[str], g, src, dst, norm_w, *,
                  hot_k, compute_dtype, fused, resid_mode, batch,
                  validate, h_hint: int = 128,
                  resid_f32_mode: Optional[str] = None):
    """Cache-through hybrid plan build (used by NormAdj.from_graph).

    ``cache_dir=None`` builds directly. The fingerprint covers the RAW
    edge arrays of ``g`` (normalization is deterministic), so hierarchy
    pipelines that only swap labels/masks hit the same entry.
    """
    from .hybrid import build_hybrid_plan
    from .spmm_pallas import RESID_F32_MODE, resid_geometry

    # the key must cover the EFFECTIVE residual geometry: the per-mode
    # RESID_GEOMS defaults are chip-swept constants, and a stale hit after
    # they change would silently pin the old kernel shape
    if resid_f32_mode is None:
        resid_f32_mode = RESID_F32_MODE
    resid_geom = resid_geometry(compute_dtype, resid_f32_mode) + (
        resid_f32_mode,)
    if cache_dir is None:
        return build_hybrid_plan(
            src, dst, norm_w, g.n_nodes, hot_k=hot_k,
            compute_dtype=compute_dtype, fused=fused, resid_mode=resid_mode,
            batch=batch, validate=validate, h_hint=h_hint,
            resid_f32_mode=resid_f32_mode,
        )
    fp = graph_fingerprint(
        np.asarray(g.edge_src), np.asarray(g.edge_dst),
        np.asarray(g.edge_w), g.n_nodes,
    )
    # 'auto' hot_k is keyed verbatim, so the entry pins whatever K the
    # cost model resolved WHEN IT WAS SAVED — fold the model version in
    # so recalibrations (r5: corrected bandwidth + split-dense rate moved
    # auto from 4096 to 8192 at bench scale) can't serve a stale K
    from .hybrid import COST_MODEL_VERSION

    key = _plan_key(fp, hot_k, compute_dtype, fused, resid_mode, batch,
                    h_hint, (resid_geom, COST_MODEL_VERSION))
    plan = load_plan(cache_dir, key, src, dst, norm_w)
    if plan is not None:
        return plan
    plan = build_hybrid_plan(
        src, dst, norm_w, g.n_nodes, hot_k=hot_k, compute_dtype=compute_dtype,
        fused=fused, resid_mode=resid_mode, batch=batch, validate=validate,
        h_hint=h_hint, resid_f32_mode=resid_f32_mode,
    )
    if plan is not None:
        save_plan(cache_dir, key, plan)
    return plan
