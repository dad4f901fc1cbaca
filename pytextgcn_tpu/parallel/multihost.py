"""Multi-host bootstrap and mesh construction.

The reference has no distributed support at all (SURVEY.md §2.4). The
TPU-native story: one process per host, `jax.distributed.initialize` for the
process group, a global mesh over all devices, and the same
:mod:`pytextgcn_tpu.parallel.sharded` edge partition — XLA routes the
all_gather over ICI within a slice and DCN across slices.

Single-host multi-chip needs none of this (just `make_mesh()`); call
:func:`init_distributed` once at startup on multi-host pods (or rely on the
TPU metadata auto-detection by passing no arguments).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


_init_done = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX process group (idempotent).

    With no arguments, JAX auto-detects the topology from the TPU metadata
    server (the standard Cloud TPU pod path). Explicit arguments support
    bring-your-own clusters.

    Must run before any JAX computation — so no jax API that would
    instantiate the backend (e.g. ``jax.process_count``) may be called
    first; idempotence is tracked with a module flag instead.
    """
    global _init_done
    if _init_done:
        return
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
        _init_done = True
    except (ValueError, RuntimeError) as e:
        if "already" in str(e).lower():
            _init_done = True
            return
        if coordinator_address is not None:
            # an explicitly requested cluster that fails to form is a real
            # failure (wrong address, dead coordinator) — never swallow it
            raise
        # auto-detect path only: no cluster metadata means a plain
        # single-process environment — run standalone
        _init_done = True


def global_mesh(axis: str = "graph"):
    """1D mesh over every device of every process (edges/s scales with the
    total chip count; the row partition is oblivious to host boundaries —
    boundary all_gather segments ride ICI within a slice, DCN across)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis,))


def host_local_mesh(axis: str = "graph"):
    """Mesh over this process's local devices only (for per-host ensembles:
    each host trains an independent per-label classifier set)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.local_devices()), (axis,))
