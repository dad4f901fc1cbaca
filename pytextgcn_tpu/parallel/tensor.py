"""Tensor parallelism for the wide EGCN embedding.

The reference's EGCN puts a ``Linear(in_features, 2000)`` dense embedding in
front of the GCN stack (/root/reference/textgcn/lib/models.py:35-38) — with
identity node features that weight matrix is [N, 2000], by far the largest
tensor in any model here (N=50k docs+vocab -> 400 MB in f32, plus Adam's
two moment buffers). SURVEY.md §2.4 marks tensor parallelism as the
secondary axis for exactly this matrix.

The TPU-native design is pure GSPMD: the embedding weight is laid out
column-sharded over the mesh's ``model`` axis and the first GCN-stack
weight row-sharded, and XLA propagates the shardings through the forward —
the embedding activation [N, 2000] comes out column-sharded (so the SELU /
dropout run shard-local), and the contraction into the first hidden layer
becomes a shard-local matmul followed by one ``all_reduce`` over the model
axis. No hand-written collectives; the optimizer update runs sharded too
because optax moment buffers inherit the parameter shardings.

Composes with the graph-partitioned aggregation: activations after the
first contraction are [N, hidden] with small hidden, which is where the
edge/halo sharding (parallel/sharded.py, parallel/halo.py) takes over.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for a model's params.

    EGCN: ``embed.w`` [in, E] column-sharded, ``embed.b`` [E] sharded,
    ``layers[0].w`` [E, hidden] row-sharded (contracting dim matches the
    embedding's sharded output => one psum), everything else replicated.
    Models without an ``embed`` entry (plain GCN/JK/MLP param trees) get
    fully replicated shardings — their matrices are small.
    """
    rep = NamedSharding(mesh, P())

    shardings = jax.tree.map(lambda _: rep, params)
    if isinstance(params, dict) and "embed" in params:
        shardings["embed"]["w"] = NamedSharding(mesh, P(None, axis))
        shardings["embed"]["b"] = NamedSharding(mesh, P(axis))
        shardings["layers"][0]["w"] = NamedSharding(mesh, P(axis, None))
    return shardings


def apply_tp(params, mesh: Mesh, axis: str = "model"):
    """Lay out params over the mesh. Initialize (or re-initialize) the
    optimizer from the returned tree — ``optax``'s ``init`` builds moment
    buffers with ``zeros_like``, which inherits the shardings, so the
    optimizer state comes out correctly distributed for free."""
    return jax.device_put(params, tp_param_shardings(params, mesh, axis))


def apply_tp_state(opt_state, params, mesh: Mesh, axis: str = "model"):
    """Lay out an existing optimizer state (e.g. loaded by
    ``Trainer.restore``, which materializes replicated host arrays) to
    match the params' TP shardings. Optax moment buffers mirror the param
    tree leaf-for-leaf but live inside optimizer-specific containers, so
    leaves are matched to their param counterpart *by shape*: a moment
    buffer of the embedding's [in, E] shape gets the embedding's sharding.
    A shape collision with a replicated param only costs a resharding
    inside the first jitted step, never correctness."""
    rep = NamedSharding(mesh, P())
    by_shape = {}
    for p, s in zip(
        jax.tree_util.tree_leaves(params),
        jax.tree_util.tree_leaves(tp_param_shardings(params, mesh, axis)),
    ):
        by_shape.setdefault(tuple(p.shape), s)

    def place(leaf):
        return jax.device_put(leaf, by_shape.get(tuple(leaf.shape), rep))

    return jax.tree.map(place, opt_state)
