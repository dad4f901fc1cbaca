"""Graph container for TextGCN — a JAX pytree with static metadata.

Plays the role of ``torch_geometric.data.Data`` in the reference
(built at /root/reference/textgcn/lib/text2graph.py:192-193), re-designed for
XLA: all arrays are fixed-shape device arrays, node features are *implicit*
(identity + optional low-rank per-document "hierarchy" columns) so the first
GCN layer never materializes the N x N identity — ``I @ W == W`` — which
replaces the reference's sparse identity feature matrix
(text2graph.py:179,226-246) with structure the compiler can use.

Node-id layout matches the reference (text2graph.py:167-171):
words occupy ids ``[0, n_vocab)``, documents ``[n_vocab, n_nodes)``.
"""

from __future__ import annotations

import dataclasses
import json
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "edge_src",
        "edge_dst",
        "edge_w",
        "y",
        "train_mask",
        "val_mask",
        "test_mask",
        "hierarchy_feats",
        "x",
    ],
    meta_fields=["n_vocab", "n_docs", "weight_symmetric"],
)
@dataclasses.dataclass
class TextGraph:
    """Heterogeneous word/document graph over a corpus.

    A **host-side artifact**: leaves are numpy arrays by convention. The
    build layer produces it, checkpoints serialize it, and the device
    objects (:class:`~pytextgcn_tpu.ops.NormAdj`,
    :class:`~pytextgcn_tpu.ops.NodeFeatures`, the Trainer's label/mask
    tensors) are created from it exactly once per training run. Keeping the
    canonical copy on host means finalization (normalization, Pallas plans,
    sharding splits) never round-trips device->host — on remote-tunneled
    TPU backends that path is orders of magnitude slower than host RAM.

    Attributes:
      edge_src: int32 [E] — source node id per edge.
      edge_dst: int32 [E] — destination node id per edge.
      edge_w:   float32 [E] — edge weight (PMI for word-word, TF-IDF for
                doc-word; both directions are stored explicitly, mirroring
                text2graph.py:148-171).
      y:        int32 [N] — node labels; word nodes carry pseudo-label 0
                exactly like the reference (text2graph.py:189-191) so masks
                can be applied directly.
      train_mask/val_mask/test_mask: bool [N] — split bitmaps over nodes
                (word rows are False in all of them for train via the same
                rule as text2graph.py:180-188).
      hierarchy_feats: optional float32 [n_docs, F] — extra per-document
                feature columns appended to the identity features
                (text2graph.py:226-246). ``None`` for flat classification.
      x:        optional float32 [N, D] — explicit dense node features.
                ``None`` (the default) means implicit identity features.
      n_vocab, n_docs: static python ints (pytree metadata).
    """

    edge_src: jax.Array
    edge_dst: jax.Array
    edge_w: jax.Array
    y: jax.Array
    train_mask: jax.Array
    val_mask: jax.Array
    test_mask: jax.Array
    n_vocab: int
    n_docs: int
    hierarchy_feats: Optional[jax.Array] = None
    x: Optional[jax.Array] = None
    # True when construction GUARANTEES every edge (i, j, w) is mirrored as
    # (j, i, w) — Text2Graph emits PMI and TF-IDF edges in both directions
    # (text2graph.py:162-171), and symmetric normalization preserves it.
    # The hybrid SpMM's full O(E log E) symmetry audit is then replaced by
    # an O(E) randomized spot-check (ops/hybrid.py::check_weight_symmetric_fast)
    weight_symmetric: bool = False

    @property
    def n_nodes(self) -> int:
        return self.n_vocab + self.n_docs

    @property
    def n_edges(self) -> int:
        return int(self.edge_src.shape[0])

    @property
    def in_dim(self) -> int:
        """Input feature dimension seen by a model consuming this graph."""
        if self.x is not None:
            return int(self.x.shape[1])
        extra = 0 if self.hierarchy_feats is None else int(self.hierarchy_feats.shape[1])
        return self.n_nodes + extra

    # ------------------------------------------------------------------ io

    def save(self, path: str) -> None:
        """Serialize to an .npz artifact (the TPU-native analogue of the
        reference's graph pickle, text2graph.py:195-202)."""
        arrays = {
            "edge_src": np.asarray(self.edge_src),
            "edge_dst": np.asarray(self.edge_dst),
            "edge_w": np.asarray(self.edge_w),
            "y": np.asarray(self.y),
            "train_mask": np.asarray(self.train_mask),
            "val_mask": np.asarray(self.val_mask),
            "test_mask": np.asarray(self.test_mask),
        }
        if self.hierarchy_feats is not None:
            arrays["hierarchy_feats"] = np.asarray(self.hierarchy_feats)
        if self.x is not None:
            arrays["x"] = np.asarray(self.x)
        meta = json.dumps({"n_vocab": self.n_vocab, "n_docs": self.n_docs,
                           "weight_symmetric": bool(self.weight_symmetric)})
        arrays["meta"] = np.frombuffer(meta.encode(), dtype=np.uint8)
        # np.savez silently appends '.npz' to extension-less paths; load()
        # mirrors the same normalization so save(p) -> load(p) always works
        np.savez_compressed(path, **arrays)

    @staticmethod
    def load(path: str) -> "TextGraph":
        import os

        if not os.path.exists(path) and not path.endswith(".npz"):
            path = path + ".npz"  # np.savez appended it at save time
        with np.load(path) as z:
            meta = json.loads(bytes(z["meta"]).decode())
            return TextGraph(
                edge_src=z["edge_src"],
                edge_dst=z["edge_dst"],
                edge_w=z["edge_w"],
                y=z["y"],
                train_mask=z["train_mask"],
                val_mask=z["val_mask"],
                test_mask=z["test_mask"],
                n_vocab=int(meta["n_vocab"]),
                n_docs=int(meta["n_docs"]),
                hierarchy_feats=z["hierarchy_feats"] if "hierarchy_feats" in z else None,
                x=z["x"] if "x" in z else None,
                weight_symmetric=bool(meta.get("weight_symmetric", False)),
            )


def gcn_normalize_np(edge_src, edge_dst, edge_w, n_nodes: int):
    """Host (numpy) version of :func:`gcn_normalize` — graph finalization is
    one-time preprocessing, so it must not issue eager device ops (on remote
    TPU backends every eager op is a separate compile)."""
    src = np.asarray(edge_src)
    dst = np.asarray(edge_dst)
    w = np.asarray(edge_w, dtype=np.float32)
    deg = np.ones(n_nodes, dtype=np.float32)
    np.add.at(deg, dst, w)
    inv_sqrt = 1.0 / np.sqrt(deg)
    norm_w = w * inv_sqrt[src] * inv_sqrt[dst]
    self_w = inv_sqrt * inv_sqrt
    return norm_w, self_w


def gcn_normalize(edge_src, edge_dst, edge_w, n_nodes: int):
    """Symmetric GCN normalization with implicit self-loops.

    Computes the weights of ``A_hat = D^-1/2 (A + I) D^-1/2`` where ``A`` is
    given in COO form. This reproduces what torch-geometric 1.6.3's
    ``gcn_norm(add_self_loops=True)`` recomputes inside every GCNConv forward
    (see /root/reference/textgcn/lib/models.py:11 and SURVEY.md §3.3); because
    the graph is static we compute it once.

    Returns:
      (norm_w, self_w): float32 [E] normalized edge weights and float32 [N]
      self-loop weights (``1 / deg[i]``), to be applied as
      ``out[i] = self_w[i] * x[i] + sum_e{dst==i} norm_w[e] * x[src[e]]``.
    """
    deg = jnp.ones((n_nodes,), dtype=jnp.float32)
    deg = deg.at[edge_dst].add(edge_w.astype(jnp.float32))
    inv_sqrt = jax.lax.rsqrt(deg)
    # deg > 0 always (self-loop contributes 1), so no zero-guard is needed.
    norm_w = edge_w.astype(jnp.float32) * inv_sqrt[edge_src] * inv_sqrt[edge_dst]
    self_w = inv_sqrt * inv_sqrt
    return norm_w, self_w
