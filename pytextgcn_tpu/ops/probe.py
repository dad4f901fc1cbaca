"""Run-time chip micro-probes for the SpMM floor accounting.

VERDICT r2 item 3: the hybrid plan's ``floor_spmm_ns`` was computed from
constants in ops/hybrid.py calibrated once against
experiments/chip_probe.py. This module measures the same three quantities
*fresh in-process* (~hundreds of ms of device time, a handful of small
compiles) so bench.py can derive ``fraction_of_achievable`` from what THIS
chip does TODAY, reporting the probed values alongside:

  * ``gather_ns``   — ns per random H-row gather (the hard per-edge floor
                      of any gather-formulated residual; chip_probe
                      measured 2.34 ns/row),
  * ``hbm_bps``     — streaming read bandwidth of a byte-bound dense
                      (N, K) @ (K, h) matmul (H=16 keeps arithmetic
                      intensity at 8 flops/byte, far under the ridge),
  * ``mxu_f32_fps`` / ``mxu_bf16_fps`` — effective matmul FLOP rates at a
                      flop-bound shape (H=512: 256 flops/byte).

The floor formula mirrors ops/hybrid.py::build_hybrid_plan —
``dense_roofline(resid=0) + n_resid * gather_ns`` — with the probed values
substituted for ``_HBM_BPS`` / ``_MXU_*`` / ``_GATHER_NS``.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


def _sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(x[:2, :2])))


def _timed(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    _sync(out)  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _sync(out)
        best = min(best, time.time() - t0)
    return best


@dataclasses.dataclass
class ChipProbe:
    gather_ns: float  # per random f32 H=128 row
    hbm_bps: float  # streaming read bandwidth (payload bytes / s)
    mxu_f32_fps: float  # f32 HIGHEST effective FLOP/s at H=512
    mxu_bf16_fps: float  # bf16 effective FLOP/s at H=512
    probe_s: float  # wall time spent probing (incl. compiles)

    def dense_ns(self, n_nodes: int, k: int, h: int, itemsize: int,
                 d_reads: int = 2) -> float:
        """Dense-half roofline term of one hybrid SpMM application, from
        the probed ceilings (same formula as ops/hybrid.py)."""
        dense_bytes = (d_reads * n_nodes * k + k * k) * itemsize
        dense_flops = 2 * (2 * n_nodes * k + k * k) * h
        mxu = self.mxu_f32_fps if itemsize == 4 else self.mxu_bf16_fps
        return max(dense_bytes / self.hbm_bps, dense_flops / mxu) * 1e9

    def hybrid_floor_ns(self, plan, h: int) -> float:
        """Probed-floor for one application of a HybridPlan: the dense
        roofline term + the cold residual at the probed gather issue rate
        (the ops/hybrid.py floor with run-time ceilings substituted)."""
        itemsize = 2 if str(plan.compute_dtype) == "bfloat16" else 4
        d_reads = 1 if plan.fused else 2
        return (
            self.dense_ns(plan.n_nodes, plan.k, h, itemsize, d_reads)
            + plan.n_resid * self.gather_ns
        )


def probe_chip(reps: int = 3, seed: int = 0) -> ChipProbe:
    """Measure this device's gather/stream/MXU ceilings. ~200 ms of device
    time; a few small one-off compiles (cached within the process)."""
    import jax
    import jax.numpy as jnp

    t_start = time.time()
    rng = np.random.default_rng(seed)
    n, e, h = 50_000, 2_000_000, 128
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    x0 = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    r = 8

    @jax.jit
    def many_gather(x, idx):
        def body(x, _):
            g = jnp.take(x, idx, axis=0)
            return x + 1e-12 * g[:2].sum(0, keepdims=True), None

        x, _ = jax.lax.scan(body, x, None, length=r)
        return x

    gather_ns = _timed(many_gather, x0, idx, reps=reps) / r / e * 1e9

    nk, k = 50_048, 2_048
    d32 = jnp.asarray((rng.standard_normal((nk, k)) / 100).astype(np.float32))

    def make_dense(d, h_, prec):
        x = jnp.asarray(rng.standard_normal((k, h_)), d.dtype)

        @jax.jit
        def many(d, x):
            def body(x, _):
                out = jnp.dot(d, x, preferred_element_type=jnp.float32,
                              precision=prec)
                nxt = jax.lax.dot_general(
                    d, out, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ) / nk
                return nxt.astype(x.dtype), None

            x, _ = jax.lax.scan(body, x, None, length=r)
            return x

        return _timed(many, d, x, reps=reps) / (2 * r)  # per matmul

    # byte-bound: H=16 -> 8 flops/byte, far below the ridge -> bandwidth
    dt = make_dense(d32, 16, jax.lax.Precision.HIGHEST)
    hbm_bps = nk * k * 4 / dt
    # flop-bound: H=512 -> 256 flops/byte -> MXU rate
    dt = make_dense(d32, 512, jax.lax.Precision.HIGHEST)
    mxu_f32 = 2 * nk * k * 512 / dt
    d16 = d32.astype(jnp.bfloat16)
    dt = make_dense(d16, 512, jax.lax.Precision.DEFAULT)
    mxu_bf16 = 2 * nk * k * 512 / dt

    return ChipProbe(
        gather_ns=float(gather_ns),
        hbm_bps=float(hbm_bps),
        mxu_f32_fps=float(mxu_f32),
        mxu_bf16_fps=float(mxu_bf16),
        probe_s=float(time.time() - t_start),
    )
