"""TF-IDF + MLP baseline.

Re-design of the reference's ``MLP`` (models.py:83-102): Linear stack with
SELU + dropout between layers, whose first layer consumes sparse TF-IDF
document features. Here the sparse first layer is an SpMM over the
document-term matrix using the same machinery as the GCN aggregation
(ops/spmm.py) — one sparse engine for the whole framework.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse as sp

from .layers import dropout, linear_init


class SparseMatrix:
    """Minimal COO sparse matrix for MLP inputs (doc-term TF-IDF).

    Registered as a pytree so it can be closed over / passed through jit.
    With ``use_pallas=True`` the product runs in the same Pallas tile kernel
    as the GCN aggregation (one sparse engine for the whole framework); the
    kernel's transpose plan supplies the dense operand's gradient
    ``S^T @ g`` in backward.
    """

    def __init__(self, row, col, data, shape, plan=None, compute_dtype="float32"):
        self.row = row
        self.col = col
        self.data = data
        self.shape = shape
        self.plan = plan  # optional (fwd TilePlan, bwd TilePlan)
        self.compute_dtype = compute_dtype

    @staticmethod
    def from_scipy(
        m: sp.spmatrix, use_pallas: bool = False, compute_dtype: str = "float32"
    ) -> "SparseMatrix":
        coo = m.tocoo()
        plan = None
        if use_pallas:
            from ..ops.spmm_pallas import _build_tile_plan

            row = coo.row.astype(np.int64)
            col = coo.col.astype(np.int64)
            data = coo.data.astype(np.float32)
            plan = (
                _build_tile_plan(col, row, data, m.shape[0]),  # S: w rows -> docs
                _build_tile_plan(row, col, data, m.shape[1]),  # S^T: docs -> w rows
            )
        return SparseMatrix(
            jnp.asarray(coo.row.astype(np.int32)),
            jnp.asarray(coo.col.astype(np.int32)),
            jnp.asarray(coo.data.astype(np.float32)),
            tuple(m.shape),
            plan,
            compute_dtype,
        )

    def matmul(self, w: jax.Array) -> jax.Array:
        """(sparse [B, D]) @ (dense [D, H])."""
        if self.plan is not None:
            from ..ops.spmm_pallas import _spmm_pallas

            return _spmm_pallas(
                w, self.plan[0], self.plan[1], jnp.dtype(self.compute_dtype).type
            )
        contrib = self.data[:, None] * jnp.take(w, self.col, axis=0)
        return jax.ops.segment_sum(contrib, self.row, num_segments=self.shape[0])

    def slice_rows(self, idx: np.ndarray) -> "SparseMatrix":
        """Host-side row selection (for batching / split handling)."""
        m = sp.csr_matrix(
            (np.asarray(self.data), (np.asarray(self.row), np.asarray(self.col))),
            shape=self.shape,
        )
        return SparseMatrix.from_scipy(
            m[idx], use_pallas=self.plan is not None, compute_dtype=self.compute_dtype
        )


jax.tree_util.register_pytree_node(
    SparseMatrix,
    lambda m: ((m.row, m.col, m.data, m.plan), (m.shape, m.compute_dtype)),
    lambda aux, kids: SparseMatrix(kids[0], kids[1], kids[2], aux[0], kids[3], aux[1]),
)


class MLP:
    """Matches reference ``MLP(in_channels, out_channels, hidden, dropout)``
    (models.py:83-102): SELU activations, dropout between layers."""

    def __init__(self, in_dim: int, out_dim: int, hidden: List[int], dropout: float = 0.5):
        assert hidden
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.hidden = list(hidden)
        self.dropout = dropout

    def config_key(self):
        return (type(self).__name__, self.in_dim, self.out_dim, tuple(self.hidden), self.dropout)

    def init(self, key) -> dict:
        dims = [self.in_dim] + self.hidden + [self.out_dim]
        keys = jax.random.split(key, len(dims) - 1)
        return {
            "layers": [
                linear_init(k, d_in, d_out)
                for k, d_in, d_out in zip(keys, dims[:-1], dims[1:])
            ]
        }

    def apply(self, params, x, *, train=False, rng=None):
        """``x``: dense [B, D] array or :class:`SparseMatrix`."""
        layers = params["layers"]
        first = layers[0]
        if isinstance(x, SparseMatrix):
            h = x.matmul(first["w"]) + first["b"]
        else:
            h = x @ first["w"] + first["b"]
        for i, layer in enumerate(layers[1:]):
            h = jax.nn.selu(h)
            if train:
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, self.dropout, train)
            h = h @ layer["w"] + layer["b"]
        return h
