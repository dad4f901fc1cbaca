"""Sliding-window PMI word-word edge construction.

TPU-native replacement for the reference's Cython kernel
(/root/reference/textgcn/lib/clib/graphbuilder.pyx:23-211). The reference
walks a triple loop (documents x window starts x intra-window pairs) into a
packed O(V^2) triangular count array and then scans all V^2/2 pairs for PMI.
Here the same counts are produced *sparsely* by vectorized pair enumeration +
multi-key sort + run-length reduction — O(P log P) in the number of token
pairs, independent of vocabulary size — which runs on-device under ``jit``
(sorts and segment ops map onto the TPU's vector units; no data-dependent
shapes: documents are bucketed by length and chunks are padded).

Exact reference semantics reproduced (golden-tested against
textgcn/test/test_cfunc.py:81-99 values):

* window starts ``j in [0, seq_len - window_size]``; a window whose last slot
  is padding ends the document's windows unless ``j == 0``
  (graphbuilder.pyx:96-100),
* pair counts accumulate for all ``k <= l`` positions inside the window whose
  tokens are both non-padding (graphbuilder.pyx:103-113; padding is always a
  contiguous suffix, produced by ``encode_documents``, so the reference's
  ``break`` equals the mask used here),
* diagonal counts double as unigram window counts; ``p_i = c_ii / n_windows``
  (graphbuilder.pyx:146-147),
* ``pmi = log(p_ij / (p_i * p_j))``, computed in float32 with a float64 log
  exactly like the C code (float operands, libc double ``log``, result
  truncated to float — graphbuilder.pyx:156-161), kept iff ``pmi > 1e-10``,
* both edge directions emitted, interleaved in ascending ``(i, j)`` order
  (graphbuilder.pyx:181-191); no self-loops (the GCN adds them:
  graphbuilder.pyx:198-205).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SENTINEL = np.int32(2**31 - 1)


# --------------------------------------------------------------------------
# exact numpy oracle (reference-semantics clone, for golden tests / tiny data)
# --------------------------------------------------------------------------

def tri_diag_index(row: np.ndarray, col: np.ndarray, n: int) -> np.ndarray:
    """Index into a packed upper-triangular (incl. diagonal) array, matching
    ``SymMat_Diag_idx`` (graphbuilder.pyx:214-226)."""
    r = np.minimum(row, col).astype(np.int64)
    c = np.maximum(row, col).astype(np.int64)
    return r * n + c - ((r + 1) * r) // 2


def sliding_window_counts(tokens: np.ndarray, n_vocab: int, window_size: int):
    """Packed triangular pair counts + window count, exact clone of the
    reference's ``sliding_window`` (graphbuilder.pyx:71-115) including its
    break rules. Python-loop implementation — use only for tests/oracles.

    Returns: (c_ij uint32 [V(V+1)/2], n_windows int)
    """
    n_docs, seq_len = tokens.shape
    if seq_len < window_size:
        # The C code would loop over an underflowed unsigned range here
        # (graphbuilder.pyx:96 with unsigned ints); we define the safe
        # behavior instead: pad to one full window (j == 0 only).
        pad = np.full((n_docs, window_size - seq_len), -1, dtype=tokens.dtype)
        tokens = np.concatenate([tokens, pad], axis=1)
        seq_len = window_size
    size = (n_vocab * (n_vocab + 1)) // 2
    c_ij = np.zeros(size, dtype=np.uint32)
    n_windows = 0
    for i in range(n_docs):
        doc = tokens[i]
        for j in range(seq_len - window_size + 1):
            if doc[j + window_size - 1] == -1 and j != 0:
                break
            n_windows += 1
            for k in range(j, j + window_size):
                if k >= seq_len or doc[k] == -1:
                    break
                for l in range(k, j + window_size):
                    if l >= seq_len or doc[l] == -1:
                        break
                    c_ij[tri_diag_index(doc[k], doc[l], n_vocab)] += 1
    return c_ij, n_windows


# --------------------------------------------------------------------------
# PMI finalization (shared by all counting backends)
# --------------------------------------------------------------------------

def pmi_edges_from_pairs(
    pair_a: np.ndarray,
    pair_b: np.ndarray,
    counts: np.ndarray,
    n_vocab: int,
    n_windows: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sparse PMI pass over unique pairs ``a <= b`` with their counts.

    Float32 arithmetic with float64 log replicates the C float semantics of
    ``edges_from_counts`` (graphbuilder.pyx:146-166). Pairs must be sorted
    lexicographically so emission order matches the reference's row-major
    upper-triangle scan (graphbuilder.pyx:181-191).

    Returns (coo int32 [E, 2], weights float32 [E]) with both directions
    interleaved: (i, j), (j, i), ...
    """
    nw = np.float32(n_windows)
    diag = pair_a == pair_b
    p = np.zeros(n_vocab, dtype=np.float32)
    p[pair_a[diag]] = counts[diag].astype(np.float32) / nw

    a = pair_a[~diag]
    b = pair_b[~diag]
    p_ij = counts[~diag].astype(np.float32) / nw
    denom = p[a] * p[b]
    ok = (p_ij > 0) & (p[a] > 0) & (p[b] > 0)
    ratio = np.where(ok, p_ij / np.where(denom == 0, 1, denom), 1).astype(np.float32)
    pmi = np.log(ratio.astype(np.float64)).astype(np.float32)
    keep = ok & (pmi > np.float32(1e-10))

    a, b, w = a[keep], b[keep], pmi[keep]
    e = a.shape[0]
    coo = np.empty((2 * e, 2), dtype=np.int32)
    weights = np.empty(2 * e, dtype=np.float32)
    coo[0::2, 0] = a
    coo[0::2, 1] = b
    coo[1::2, 0] = b
    coo[1::2, 1] = a
    weights[0::2] = w
    weights[1::2] = w
    return coo, weights


# --------------------------------------------------------------------------
# on-device counting: vectorized pair enumeration + sort + run-length encode
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("window_size",))
def _pair_count_chunk(tokens: jax.Array, window_size: int):
    """Count word pairs for one fixed-shape chunk of documents on device.

    tokens: int32 [D, S] padded with -1 (padding is a contiguous suffix),
    S >= window_size.

    Returns (ua, ub, cnt, n_unique, n_windows): unique normalized pairs
    ``ua <= ub`` with multiplicities, padded to the static bound P with
    sentinel rows; plus the number of valid windows in the chunk.
    """
    d, s = tokens.shape
    w = window_size
    n_pos = s - w + 1

    # window validity incl. the j>0 break rule (graphbuilder.pyx:96-100)
    tail_valid = tokens[:, w - 1 :] != -1  # [D, n_pos]
    first = jax.lax.broadcasted_iota(jnp.int32, (d, n_pos), 1) == 0
    vw = jnp.cumprod(jnp.where(first, True, tail_valid), axis=1).astype(bool)
    n_windows = jnp.sum(vw.astype(jnp.int32))

    # enumerate intra-window pairs k <= l
    k_off, l_off = np.triu_indices(w)
    starts = np.arange(n_pos)
    ka = jnp.asarray(starts[:, None] + k_off[None, :])  # [n_pos, n_pairs]
    la = jnp.asarray(starts[:, None] + l_off[None, :])
    a = tokens[:, ka]  # [D, n_pos, n_pairs]
    b = tokens[:, la]
    valid = vw[:, :, None] & (a != -1) & (b != -1)
    lo = jnp.where(valid, jnp.minimum(a, b), _SENTINEL).reshape(-1)
    hi = jnp.where(valid, jnp.maximum(a, b), _SENTINEL).reshape(-1)

    # sort lexicographically; sentinels sink to the end
    lo, hi = jax.lax.sort((lo, hi), num_keys=2)

    p = lo.shape[0]
    ok = lo != _SENTINEL
    prev_differs = jnp.concatenate(
        [jnp.ones((1,), bool), (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])]
    )
    is_start = ok & prev_differs
    run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # [-1 .. n_unique)
    cnt = jax.ops.segment_sum(ok.astype(jnp.int32), jnp.maximum(run_id, 0), num_segments=p)
    scatter_idx = jnp.where(is_start, run_id, p)
    ua = jnp.full((p,), _SENTINEL, jnp.int32).at[scatter_idx].set(lo, mode="drop")
    ub = jnp.full((p,), _SENTINEL, jnp.int32).at[scatter_idx].set(hi, mode="drop")
    n_unique = jnp.sum(is_start.astype(jnp.int32))
    return ua, ub, cnt, n_unique, n_windows


def _merge_pair_lists(parts):
    """Host-side merge of per-chunk unique pair lists -> global sorted unique
    pairs with summed counts."""
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    # per-chunk counts are int32 (bounded by the chunk pair budget); the
    # MERGED totals can exceed 2^31 on huge corpora — widen before reduceat
    # so the device backend matches the native kernel's uint32+ semantics
    c = np.concatenate([p[2] for p in parts]).astype(np.int64)
    order = np.lexsort((b, a))
    a, b, c = a[order], b[order], c[order]
    if a.shape[0] == 0:
        return a, b, c
    new = np.empty(a.shape[0], dtype=bool)
    new[0] = True
    np.logical_or(a[1:] != a[:-1], b[1:] != b[:-1], out=new[1:])
    starts = np.flatnonzero(new)
    csum = np.add.reduceat(c, starts)
    return a[starts], b[starts], csum


def _length_buckets(lengths: np.ndarray, min_len: int):
    """Bucket document lengths to limit padded work: next power of two
    (>= min_len), clamped to the max length."""
    caps = []
    cap = max(min_len, 16)
    max_len = int(lengths.max()) if lengths.size else min_len
    while cap < max_len:
        caps.append(cap)
        cap *= 2
    caps.append(max(cap, max_len))
    return caps


def _iter_chunks(tokens: np.ndarray, window_size: int, chunk_pair_budget: int):
    """Yield fixed-shape, length-bucketed document chunks ``(chunk, n_real)``
    (padded with filler rows of -1) — the host-side scheduling shared by the
    single-device and document-sharded counting paths."""
    n_docs, seq_len = tokens.shape
    lengths = (tokens != -1).sum(axis=1)
    n_pairs = window_size * (window_size + 1) // 2
    order = np.argsort(lengths, kind="stable")
    caps = _length_buckets(lengths, window_size)
    lo_len = -1
    for cap in caps:
        sel = order[(lengths[order] > lo_len) & (lengths[order] <= cap)]
        lo_len = cap
        if sel.size == 0:
            continue
        s = max(cap, window_size)
        n_pos = s - window_size + 1
        per_doc = n_pos * n_pairs
        docs_per_chunk = max(1, chunk_pair_budget // per_doc)
        # round to powers of two to limit distinct jit shapes, and never pad
        # a small bucket up to a huge chunk
        docs_per_chunk = min(docs_per_chunk, 2 * sel.size - 1)
        docs_per_chunk = 1 << int(np.floor(np.log2(docs_per_chunk)))
        for off in range(0, sel.size, docs_per_chunk):
            idx = sel[off : off + docs_per_chunk]
            chunk = np.full((docs_per_chunk, s), -1, dtype=np.int32)
            ncols = min(s, seq_len)
            chunk[: idx.size, :ncols] = tokens[idx][:, :ncols]
            yield chunk, idx.size


def _materialize_counted(item):
    """Pull one chunk's device buffers to host, freeing them on device."""
    (ua, ub, cnt, n_unique, n_win), filler = item
    n_unique = int(n_unique)
    # every row — real or filler — counts its unconditional j==0
    # window (graphbuilder.pyx:98-101); subtract the filler rows'.
    return (
        np.asarray(ua[:n_unique]),
        np.asarray(ub[:n_unique]),
        np.asarray(cnt[:n_unique]),
        int(n_win) - filler,
    )


def _finalize_counted(pending, n_vocab: int):
    """Materialize per-chunk device results, merge pair lists, run PMI."""
    materialized = [_materialize_counted(item) for item in pending]
    return _finalize_materialized(materialized, n_vocab)


def _finalize_materialized(materialized, n_vocab: int):
    total_windows = sum(w for *_, w in materialized)
    parts = [(a, b, c) for a, b, c, _ in materialized]
    if not parts:
        return np.zeros((0, 2), np.int32), np.zeros(0, np.float32), 0
    a, b, c = _merge_pair_lists(parts)
    coo, wgt = pmi_edges_from_pairs(a, b, c, n_vocab, total_windows)
    return coo, wgt, total_windows


def word_word_edges_device(
    tokens: np.ndarray,
    n_vocab: int,
    window_size: int = 20,
    chunk_pair_budget: int = 1 << 24,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Production counting path: JAX on-device, bucketed + chunked.

    tokens: int32 [n_docs, seq_len] padded with -1 (contiguous suffix).
    Returns (coo [E,2] int32, weights [E] float32, n_windows).
    """
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    # bounded pipeline: keep two chunks in flight (dispatch overlaps the
    # previous chunk's host pull) but never more — each chunk's unique-pair
    # buffers are budget-sized, so unbounded retention can exhaust HBM on
    # single-device runs with many chunks
    in_flight, materialized = [], []
    for chunk, n_real in _iter_chunks(tokens, window_size, chunk_pair_budget):
        out = _pair_count_chunk(jnp.asarray(chunk), window_size)
        in_flight.append((out, chunk.shape[0] - n_real))
        if len(in_flight) >= 2:
            materialized.append(_materialize_counted(in_flight.pop(0)))
    materialized.extend(_materialize_counted(item) for item in in_flight)
    return _finalize_materialized(materialized, n_vocab)


def word_word_edges_sharded(
    tokens: np.ndarray,
    n_vocab: int,
    window_size: int = 20,
    mesh=None,
    chunk_pair_budget: int = 1 << 24,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Document-sharded distributed window counting (SURVEY.md §5(a)).

    Windows never cross document boundaries (graphbuilder.pyx:96: window
    starts live within one document's token row), so sharding documents
    across devices is EXACT: each device of the mesh counts the windows of
    its contiguous doc shard, per-shard unique-pair lists are merged on the
    host (the same associative merge the chunked single-device path uses),
    and window totals are summed. Chunks are dispatched round-robin across
    the devices so they count concurrently, but at most two chunks stay in
    flight per device — the same bound the single-device path applies, for
    the same reason: each chunk's unique-pair buffers are budget-sized, and
    retaining every chunk of a large shard would exhaust device memory.
    """
    devices = (
        list(mesh.devices.flat) if mesh is not None else jax.local_devices()
    )
    tokens = np.ascontiguousarray(tokens, dtype=np.int32)
    n_docs = tokens.shape[0]
    bounds = np.linspace(0, n_docs, len(devices) + 1).astype(np.int64)
    streams = [
        (dev, _iter_chunks(tokens[lo:hi], window_size, chunk_pair_budget))
        for dev, lo, hi in zip(devices, bounds[:-1], bounds[1:])
        if hi > lo
    ]
    in_flight = [[] for _ in streams]
    materialized = []
    exhausted = [False] * len(streams)
    while not all(exhausted):
        for i, (dev, chunks) in enumerate(streams):
            if exhausted[i]:
                continue
            nxt = next(chunks, None)
            if nxt is None:
                exhausted[i] = True
                continue
            chunk, n_real = nxt
            out = _pair_count_chunk(jax.device_put(chunk, dev), window_size)
            in_flight[i].append((out, chunk.shape[0] - n_real))
            if len(in_flight[i]) >= 2:
                materialized.append(_materialize_counted(in_flight[i].pop(0)))
    for q in in_flight:
        materialized.extend(_materialize_counted(item) for item in q)
    return _finalize_materialized(materialized, n_vocab)


def word_word_edges(
    tokens: np.ndarray,
    n_vocab: int,
    window_size: int = 20,
    backend: str = "auto",
    n_jobs: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Compute word-word PMI edges. ``backend``: 'native' (multithreaded C++
    host kernel), 'device' (JAX sort/segment ops), 'sharded' (document-
    sharded over all local devices — see :func:`word_word_edges_sharded`),
    or 'oracle' (python-loop clone; tiny inputs only). 'auto' prefers native — graph construction is
    one-time host preprocessing and the C++ kernel avoids device round-trips
    (which are very expensive on tunneled TPU backends) — falling back to the
    device path if the toolchain is unavailable.

    ``n_jobs``: native-kernel thread count; 0 = hardware concurrency. (The
    reference documents ``n_jobs`` on its Cython kernel but never uses it —
    graphbuilder.pyx:36; here it is honored.)

    Max-vocab policy: the native kernel (like the reference's Cython one,
    graphbuilder.pyx:44) accumulates into a packed V(V+1)/2 triangle —
    4 bytes per cell, i.e. ~5 GB at V=50k and ~20 GB at V=100k, plus
    per-thread private copies. 'auto' therefore routes vocabularies whose
    triangle would exceed ``PYTEXTGCN_NATIVE_TRI_BYTES`` (default 2 GB,
    ~V=31.6k) to the *sparse* device path, which scales with the number of
    distinct co-occurring pairs instead of V^2. Forcing ``backend='native'``
    overrides the policy (the kernel itself is int64/uint64-indexed and
    correct at any size that fits in RAM)."""
    if backend == "auto":
        tri_bytes = n_vocab * (n_vocab + 1) // 2 * 4
        limit = int(os.environ.get("PYTEXTGCN_NATIVE_TRI_BYTES", 2_000_000_000))
        if tri_bytes > limit:
            return word_word_edges_device(tokens, n_vocab, window_size)
        try:
            from .native_bridge import native_word_word_edges

            return native_word_word_edges(tokens, n_vocab, window_size, n_jobs)
        except Exception:
            return word_word_edges_device(tokens, n_vocab, window_size)
    if backend == "device":
        return word_word_edges_device(tokens, n_vocab, window_size)
    if backend == "sharded":
        return word_word_edges_sharded(tokens, n_vocab, window_size)
    if backend == "native":
        from .native_bridge import native_word_word_edges

        return native_word_word_edges(tokens, n_vocab, window_size, n_jobs)
    if backend == "oracle":
        c_ij, n_windows = sliding_window_counts(tokens, n_vocab, window_size)
        # expand packed triangle into sparse pair lists
        idx = np.flatnonzero(c_ij)
        rows, cols = _tri_unpack(idx, n_vocab)
        coo, wgt = pmi_edges_from_pairs(
            rows.astype(np.int32), cols.astype(np.int32), c_ij[idx], n_vocab, n_windows
        )
        return coo, wgt, n_windows
    raise ValueError(f"unknown backend {backend!r}")


def _tri_unpack(flat_idx: np.ndarray, n: int):
    """Invert ``tri_diag_index`` for a packed upper triangle incl. diagonal,
    returning (row, col) with row <= col, in ascending flat order."""
    # row r starts at offset r*n - r(r-1)/2; solve for r by searchsorted.
    r = np.arange(n, dtype=np.int64)
    row_starts = r * n - (r * (r - 1)) // 2
    rows = np.searchsorted(row_starts, flat_idx, side="right") - 1
    cols = flat_idx - row_starts[rows] + rows
    return rows, cols
