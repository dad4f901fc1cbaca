"""ops/probe.py: the run-time chip micro-probe behind bench.py's
probed-floor account (VERDICT r2 item 3). On the CPU test backend the
absolute numbers are meaningless — these tests pin that the probe runs,
returns sane positive ceilings, and that the floor formula matches the
ops/hybrid.py structure it substitutes into."""

import numpy as np

from pytextgcn_tpu.ops.probe import ChipProbe, probe_chip


def test_probe_chip_runs():
    pr = probe_chip(reps=1, e=100_000, nk=4_096)
    assert pr.gather_ns > 0
    assert pr.hbm_bps > 0
    assert pr.mxu_f32_fps > 0 and pr.mxu_bf16_fps > 0
    assert pr.probe_s > 0


def test_slope_time_cancels_constant_overhead():
    # the r3 probe's defect: ~10 ms of relay dispatch per timed call
    # inflated per-iteration times by 25-34%. slope_time subtracts two
    # chain lengths, so any constant per-call cost drops out exactly —
    # pinned here on synthetic clocks (no sleeping, no flakiness).
    from pytextgcn_tpu.ops import probe

    per_iter, overhead = 1e-3, 50e-3  # heavy constant overhead
    calls = []

    def make_fn(length):
        def fn():
            calls.append(length)
            return np.ones((2, 2))

        return fn, ()

    ticks = iter(np.cumsum([0.0] + [overhead + 8 * per_iter,
                                    overhead + 8 * per_iter,
                                    overhead + 40 * per_iter,
                                    overhead + 40 * per_iter]).tolist())

    class FakeTime:  # swaps only probe.py's module-level `time` binding
        time = staticmethod(lambda: next(ticks))

    orig = probe.time
    probe.time = FakeTime
    try:
        got = probe.slope_time(make_fn, reps=1)
    finally:
        probe.time = orig
    # naive per-call/8 timing would give 7.25 ms/iter; the slope recovers
    # the true 1 ms exactly
    np.testing.assert_allclose(got, per_iter, rtol=1e-9)
    assert calls == [8, 8, 40, 40]  # warmup + 1 rep per length


def test_floor_formula_matches_hybrid_constants():
    # with the probe's ceilings set to the ops/hybrid.py constants, the
    # probed floor must equal the plan's frozen floor_spmm_ns exactly
    from pytextgcn_tpu.ops import hybrid

    class FakePlan:
        n_nodes, k, n_resid = 60_000, 2048, 400_000
        compute_dtype, fused = "float32", False

    pr = ChipProbe(
        gather_ns=hybrid._GATHER_NS,
        hbm_bps=hybrid._HBM_BPS,
        mxu_f32_fps=hybrid._MXU_F32_HIGHEST,
        mxu_bf16_fps=hybrid._MXU_BF16_FACTOR * hybrid._MXU_F32_HIGHEST,
        probe_s=0.1,
    )
    want = (
        hybrid._predict_cost_ns(
            FakePlan.n_nodes, 10**7, 0, FakePlan.k, 128, 4, d_reads=2
        )
        + FakePlan.n_resid * hybrid._GATHER_NS
    )
    got = pr.hybrid_floor_ns(FakePlan, h=128)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # a wider head can only raise the dense term
    assert pr.hybrid_floor_ns(FakePlan, h=512) >= got


def test_plan_carries_n_resid():
    from pytextgcn_tpu.core.graph import TextGraph
    from pytextgcn_tpu.ops.hybrid import build_hybrid_plan

    rng = np.random.default_rng(0)
    n = 400
    m = 4000
    a = rng.integers(0, n, m).astype(np.int32)
    b = rng.integers(0, n, m).astype(np.int32)
    w = (rng.random(m) + 0.1).astype(np.float32)
    zeros = np.zeros(n, bool)
    g = TextGraph(
        edge_src=np.concatenate([a, b]), edge_dst=np.concatenate([b, a]),
        edge_w=np.concatenate([w, w]), y=np.zeros(n, np.int32),
        train_mask=zeros, val_mask=zeros, test_mask=zeros,
        n_vocab=n // 2, n_docs=n - n // 2,
    )
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    ww = np.concatenate([w, w])
    plan = build_hybrid_plan(src, dst, ww, n, hot_k=64)
    hot = np.zeros(n, bool)
    hot[np.asarray(plan.hot_ids)] = True
    want_resid = int((~hot[src] & ~hot[dst]).sum())
    assert plan.n_resid == want_resid > 0
