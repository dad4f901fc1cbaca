"""Tracing / profiling utilities.

The reference's only instrumentation is manual wall-clock deltas around
training (flat_amazon.py:98,141-142) and graph-build stages
(test_cfunc.py:39-45). Here:

* ``StageTimer`` — structured phase timers (graph build, train, eval) that
  emit JSONL records, the framework-wide replacement for those ad-hoc
  prints;
* ``trace`` — context manager around ``jax.profiler`` for device traces
  (view in TensorBoard / xprof);
* ``spmm_roofline`` — per-kernel accounting for the SpMM: bytes moved,
  FLOPs issued, and the fraction of speed-of-light achieved on the current
  chip (the BASELINE.json north-star metric).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

# v5e (TPU v5 lite) per-chip peaks; used when the backend reports no better.
# ``hbm_gbps_measured`` is this environment's measured streaming ceiling
# (experiments/chip_probe.py — dense reads cap at ~220 GB/s here; the 820
# paper number is unobtainable even by dense matmul reads, RESULTS.md), so
# fractions are reported against both.
_DEFAULT_PEAK = {
    "hbm_gbps": 820.0,
    "hbm_gbps_measured": 220.0,
    "bf16_tflops": 394.0,
    "f32_tflops": 197.0,
}


@dataclass
class StageTimer:
    """Accumulates named stage timings; optionally mirrors to a JSONL file."""

    path: Optional[str] = None
    records: List[Dict] = field(default_factory=list)

    @contextlib.contextmanager
    def stage(self, name: str, **meta):
        t0 = time.time()
        try:
            yield
        finally:
            rec = {"stage": name, "seconds": time.time() - t0, **meta, "ts": t0}
            self.records.append(rec)
            if self.path:
                with open(self.path, "a") as f:
                    f.write(json.dumps(rec) + "\n")

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for r in self.records:
            out[r["stage"]] = out.get(r["stage"], 0.0) + r["seconds"]
        return out


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace around a code block (jax.profiler)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def spmm_roofline(
    n_edges: int,
    n_nodes: int,
    feat_dim: int,
    seconds: float,
    peak: Optional[Dict[str, float]] = None,
) -> Dict[str, float]:
    """Roofline accounting for one SpMM application.

    Memory model (the op is bandwidth-bound): each edge reads its (src, w)
    pair plus a feat_dim row of X, and each output row is written once.
    Returns achieved GB/s, effective edges/s, and fraction of the HBM
    speed-of-light.
    """
    peak = peak or _DEFAULT_PEAK
    bytes_edges = n_edges * (4 + 4)  # src id + weight
    bytes_gather = n_edges * feat_dim * 4  # gathered X rows (uncached model)
    bytes_out = n_nodes * feat_dim * 4
    total_bytes = bytes_edges + bytes_gather + bytes_out
    gbps = total_bytes / seconds / 1e9
    out = {
        "edges_per_s": n_edges / seconds,
        "achieved_gbps": gbps,
        "fraction_of_roofline": gbps / peak["hbm_gbps"],
        "total_bytes": float(total_bytes),
    }
    if "hbm_gbps_measured" in peak:
        out["fraction_of_measured_roofline"] = gbps / peak["hbm_gbps_measured"]
    return out
