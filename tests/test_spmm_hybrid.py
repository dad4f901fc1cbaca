"""Hybrid dense-hot / sparse-cold SpMM (ops/hybrid.py) vs the segment oracle:
forward + VJP equality, hot-set edge cases, end-to-end training."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytextgcn_tpu.core.graph import TextGraph, gcn_normalize_np
from pytextgcn_tpu.ops.adjacency import NormAdj
from pytextgcn_tpu.ops.hybrid import HybridPlan, build_hybrid_plan, spmm_hybrid
from pytextgcn_tpu.ops.spmm import spmm, spmm_segment


def _rand_graph(n_vocab=300, n_docs=200, n_edges=8000, seed=0, zipf=True):
    rng = np.random.default_rng(seed)
    n = n_vocab + n_docs
    if zipf:
        # skewed endpoints + symmetric pairs, like a real normalized adjacency
        p = 1.0 / np.arange(1, n + 1) ** 1.1
        p /= p.sum()
        a = rng.choice(n, n_edges // 2, p=p).astype(np.int32)
        b = rng.choice(n, n_edges // 2, p=p).astype(np.int32)
    else:
        a = rng.integers(0, n, n_edges // 2).astype(np.int32)
        b = rng.integers(0, n, n_edges // 2).astype(np.int32)
    w_half = (rng.random(n_edges // 2) + 0.05).astype(np.float32)
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    w = np.concatenate([w_half, w_half])
    zeros = np.zeros(n, bool)
    tm = zeros.copy()
    tm[n_vocab:] = True
    return TextGraph(
        edge_src=src, edge_dst=dst, edge_w=w,
        y=rng.integers(0, 3, n).astype(np.int32),
        train_mask=tm, val_mask=zeros, test_mask=zeros,
        n_vocab=n_vocab, n_docs=n_docs,
    )


@pytest.mark.parametrize("k", [128, 256])
def test_hybrid_forward_matches_segment(k):
    g = _rand_graph()
    adj_ref = NormAdj.from_graph(g)
    adj_h = NormAdj.from_graph(g, hybrid_k=k)
    assert isinstance(adj_h.plan, HybridPlan)
    assert adj_h.plan.res_fwd is not None  # residual non-empty at this K
    x = jnp.asarray(np.random.default_rng(1).standard_normal((g.n_nodes, 16)), jnp.float32)
    ref = spmm_segment(adj_ref, x)
    got = jax.jit(spmm)(adj_h, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_hybrid_split2_dense_split_forward_and_vjp():
    """f32 'split2' now routes the dense pair through the hi/lo bf16
    split-fused kernel (fused_dual.py v2): the plan must carry the bf16
    pair, and forward + VJP must match the segment-f32 oracle within the
    split2 band (~2^-18 relative)."""
    g = _rand_graph()
    adj_ref = NormAdj.from_graph(g)
    adj_h = NormAdj.from_graph(g, hybrid_k=256, hybrid_f32_mode="split2")
    assert isinstance(adj_h.plan, HybridPlan)
    assert adj_h.plan.d_lo is not None  # dense split engaged
    assert adj_h.plan.d_full.dtype == jnp.bfloat16
    assert adj_h.plan.a_hh.dtype == jnp.float32
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((g.n_nodes, 16)), jnp.float32)
    ref = spmm_segment(adj_ref, x)
    got = jax.jit(spmm)(adj_h, x)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(got - ref).max()) / scale < 3e-5

    g_ref = jax.grad(lambda x: (spmm_segment(adj_ref, x) ** 2).sum())(x)
    g_got = jax.grad(lambda x: (spmm(adj_h, x) ** 2).sum())(x)
    gscale = float(jnp.abs(g_ref).max())
    assert float(jnp.abs(g_got - g_ref).max()) / gscale < 3e-5

    # 'highest' mode must NOT engage the split (exact-parity default)
    adj_hi = NormAdj.from_graph(g, hybrid_k=256, hybrid_f32_mode="highest")
    assert adj_hi.plan.d_lo is None


def test_hybrid_covers_all_hot_case():
    # K large enough that no residual edges remain: pure dense decomposition
    g = _rand_graph(n_vocab=40, n_docs=40, n_edges=1200)
    plan = build_hybrid_plan(
        np.asarray(g.edge_src), np.asarray(g.edge_dst),
        gcn_normalize_np(g.edge_src, g.edge_dst, g.edge_w, g.n_nodes)[0],
        g.n_nodes, hot_k=256,
    )
    # n_nodes=80 but K is clamped and aligned; with K >= ... residual may be
    # empty or not — just check correctness either way
    adj_ref = NormAdj.from_graph(g)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((g.n_nodes, 8)), jnp.float32)
    got = spmm_hybrid(plan, x) + adj_ref.self_w[:, None] * x
    ref = spmm_segment(adj_ref, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_hybrid_vjp_matches_segment():
    g = _rand_graph(seed=3)
    adj_ref = NormAdj.from_graph(g)
    adj_h = NormAdj.from_graph(g, hybrid_k=128)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((g.n_nodes, 8)), jnp.float32)
    ct = jnp.asarray(np.random.default_rng(5).standard_normal((g.n_nodes, 8)), jnp.float32)

    def f_ref(v):
        return jnp.vdot(spmm_segment(adj_ref, v), ct)

    def f_h(v):
        return jnp.vdot(spmm(adj_h, v), ct)

    g_ref = jax.grad(f_ref)(x)
    g_h = jax.jit(jax.grad(f_h))(x)
    np.testing.assert_allclose(np.asarray(g_h), np.asarray(g_ref), rtol=2e-5, atol=2e-5)


def test_hybrid_auto_returns_plan_or_none():
    g = _rand_graph(seed=6)
    norm_w, _ = gcn_normalize_np(g.edge_src, g.edge_dst, g.edge_w, g.n_nodes)
    plan = build_hybrid_plan(
        np.asarray(g.edge_src), np.asarray(g.edge_dst), norm_w, g.n_nodes,
        hot_k="auto",
    )
    if plan is not None:
        x = jnp.asarray(
            np.random.default_rng(7).standard_normal((g.n_nodes, 8)), jnp.float32
        )
        adj_ref = NormAdj.from_graph(g)
        got = spmm_hybrid(plan, x) + adj_ref.self_w[:, None] * x
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(spmm_segment(adj_ref, x)), rtol=2e-5, atol=2e-5
        )
    # NormAdj falls back to a non-hybrid plan rather than None
    adj = NormAdj.from_graph(g, hybrid_k="auto")
    assert adj.plan is not None


def test_hybrid_end_to_end_training():
    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.train import Trainer

    g = _rand_graph(seed=8)
    t_ref = Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5), seed=2)
    t_h = Trainer(
        GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.5), seed=2, hybrid_k=128
    )
    h_ref = t_ref.fit(g, epochs=8, n_classes=3)
    h_h = t_h.fit(g, epochs=8, n_classes=3)
    np.testing.assert_allclose(
        [r["loss"] for r in h_ref], [r["loss"] for r in h_h], rtol=5e-4, atol=1e-5
    )


def test_hybrid_rejects_asymmetric_adjacency():
    # the D^T hot-destination term is only exact for weight-symmetric edge
    # lists; a directed/half-stored one must raise, not silently be wrong
    rng = np.random.default_rng(3)
    n = 400
    src = rng.integers(0, n, 5000).astype(np.int32)
    dst = rng.integers(0, n, 5000).astype(np.int32)
    w = rng.random(5000).astype(np.float32) + 0.05
    with pytest.raises(ValueError, match="weight-symmetric"):
        build_hybrid_plan(src, dst, w, n, hot_k=64)


def test_hybrid_k_zero_means_off():
    g = _rand_graph(seed=9)
    from pytextgcn_tpu.core.graph import gcn_normalize_np as _norm

    w, _ = _norm(np.asarray(g.edge_src), np.asarray(g.edge_dst), g.edge_w, g.n_nodes)
    assert build_hybrid_plan(g.edge_src, g.edge_dst, w, g.n_nodes, hot_k=0) is None

    from pytextgcn_tpu.config import TrainConfig, hybrid_k_arg

    assert hybrid_k_arg(TrainConfig(hybrid_k="0")) is None
    assert hybrid_k_arg(TrainConfig(hybrid_k="off")) is None
    assert hybrid_k_arg(TrainConfig(hybrid_k="128")) == 128


def test_hybrid_auto_falls_back_on_asymmetric_adjacency():
    # under 'auto' (the TPU default) an asymmetric edge list must select the
    # pure sparse path (None), not crash the trainer. The graph is skewed so
    # the cost model genuinely picks a hot set first (all sources hot).
    rng = np.random.default_rng(4)
    n, e = 2000, 20000
    src = rng.integers(0, 64, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32) + 0.05
    with pytest.warns(UserWarning, match="weight-symmetric"):
        plan = build_hybrid_plan(src, dst, w, n, hot_k="auto")
    assert plan is None  # fallback, never a wrong plan


def test_hybrid_fused_matches_unfused():
    # the fused one-pass-over-D kernel (interpret mode on CPU) must produce
    # the same SpMM and the same gradients as the two-XLA-matmul path
    import jax
    import jax.numpy as jnp
    from pytextgcn_tpu.core.graph import gcn_normalize_np as _norm
    from pytextgcn_tpu.ops.hybrid import spmm_hybrid

    g = _rand_graph(seed=11, n_vocab=300, n_docs=200, n_edges=9000)
    w, _ = _norm(np.asarray(g.edge_src), np.asarray(g.edge_dst), g.edge_w, g.n_nodes)
    plans = {
        fused: build_hybrid_plan(
            g.edge_src, g.edge_dst, w, g.n_nodes, hot_k=128, fused=fused
        )
        for fused in (False, True)
    }
    assert plans[True].fused and not plans[False].fused
    assert plans[True].d_full.shape[0] % 512 == 0  # built padded, not copied

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.n_nodes, 48)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((g.n_nodes, 48)), jnp.float32)

    outs, grads = {}, {}
    for fused, plan in plans.items():
        outs[fused] = spmm_hybrid(plan, x)
        grads[fused] = jax.grad(lambda xx: jnp.sum(spmm_hybrid(plan, xx) * t))(x)
    np.testing.assert_allclose(
        np.asarray(outs[True]), np.asarray(outs[False]), rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(grads[True]), np.asarray(grads[False]), rtol=1e-5, atol=1e-4
    )


def test_choose_hot_k_fused_monotone():
    # A fused dense half (D streamed once, d_reads=1) is never costlier than
    # the two-matmul one, so the chosen K can only grow when fused is on.
    from pytextgcn_tpu.ops.hybrid import _predict_cost_ns, choose_hot_k

    g = _rand_graph(n_vocab=3000, n_docs=2000, n_edges=200_000, seed=3)
    src, dst = np.asarray(g.edge_src), np.asarray(g.edge_dst)
    k2 = choose_hot_k(src, g.n_nodes, h=128, dst=dst, d_reads=2)
    k1 = choose_hot_k(src, g.n_nodes, h=128, dst=dst, d_reads=1)
    assert k1 >= k2 > 0
    # never costlier; strictly cheaper while the dense half is
    # bandwidth-bound. With the r5-corrected D-read bandwidth (420 GB/s,
    # docs/hybrid_parts_r5.log) the f32 pair at h=128 is MXU-bound at
    # every K (the modes tie — fusing saves traffic, not flops); the
    # strictly-cheaper regime needs a skinnier operand, e.g. h=32.
    for k in (512, 1024, 4096):
        c1 = _predict_cost_ns(g.n_nodes, len(src), 10_000, k, 128, 4, d_reads=1)
        c2 = _predict_cost_ns(g.n_nodes, len(src), 10_000, k, 128, 4, d_reads=2)
        assert c1 <= c2
    assert _predict_cost_ns(g.n_nodes, len(src), 10_000, 512, 32, 4,
                            d_reads=1) < _predict_cost_ns(
        g.n_nodes, len(src), 10_000, 512, 32, 4, d_reads=2)


def test_hybrid_fused_knob_plumbing():
    # config knob -> Trainer -> NormAdj -> HybridPlan.fused
    import pytest

    from pytextgcn_tpu.config import TrainConfig, hybrid_fused_arg
    from pytextgcn_tpu.ops.adjacency import NormAdj

    assert hybrid_fused_arg(TrainConfig(hybrid_fused="auto")) is None
    assert hybrid_fused_arg(TrainConfig(hybrid_fused="on")) is True
    assert hybrid_fused_arg(TrainConfig(hybrid_fused="off")) is False
    with pytest.raises(SystemExit):
        hybrid_fused_arg(TrainConfig(hybrid_fused="maybe"))

    g = _rand_graph(seed=12)
    adj = NormAdj.from_graph(g, hybrid_k=128, hybrid_fused=True)
    assert isinstance(adj.plan, HybridPlan) and adj.plan.fused
    adj_off = NormAdj.from_graph(g, hybrid_k=128, hybrid_fused=False)
    assert isinstance(adj_off.plan, HybridPlan) and not adj_off.plan.fused


def test_plan_carries_calibrated_floor():
    # build_hybrid_plan stamps the cost model's per-application floor on the
    # plan (bench.py reports measured/floor as fraction_of_achievable)
    from pytextgcn_tpu.ops.hybrid import _predict_cost_ns

    g = _rand_graph(seed=21)
    src, dst = np.asarray(g.edge_src), np.asarray(g.edge_dst)
    w, _ = gcn_normalize_np(src, dst, g.edge_w, g.n_nodes)
    plan = build_hybrid_plan(src, dst, w, g.n_nodes, hot_k=128)
    assert plan.predicted_spmm_ns > 0
    # the floor is at least the dense half's modeled cost for the chosen K,
    # priced with the SAME mode flags the plan was built with (the default
    # f32 mode is split2 + dense_split since r5)
    dense_split = plan.d_lo is not None
    assert plan.predicted_spmm_ns >= _predict_cost_ns(
        g.n_nodes, len(src), 0, plan.k, 128, 4,
        d_reads=1 if (plan.fused or dense_split) else 2,
        dense_split=dense_split,
    )
    # a fused plan of the same K predicts no more than the two-matmul one
    plan_f = build_hybrid_plan(src, dst, w, g.n_nodes, hot_k=128, fused=True)
    assert plan_f.predicted_spmm_ns <= plan.predicted_spmm_ns
    # the hard floor (gather-issue-rate residual, no pad inflation) can
    # never exceed the calibrated prediction
    assert 0 < plan.floor_spmm_ns <= plan.predicted_spmm_ns


def test_scatter_dense_block_device_path():
    # the jitted device-side D build (the TPU branch of build_hybrid_plan /
    # build_hybrid_sharded_adj, which CPU runs never take) must match the
    # host np.add.at accumulation, including fused-mode row padding
    import jax.numpy as jnp

    from pytextgcn_tpu.ops.hybrid import _scatter_dense_block

    g = _rand_graph(seed=31)
    src, dst = np.asarray(g.edge_src), np.asarray(g.edge_dst)
    w, _ = gcn_normalize_np(src, dst, g.edge_w, g.n_nodes)
    k = 32
    deg = np.bincount(src, minlength=g.n_nodes)
    hot_ids = np.sort(np.argsort(-deg, kind="stable")[:k]).astype(np.int32)
    hot_rank = np.full(g.n_nodes, -1, np.int64)
    hot_rank[hot_ids] = np.arange(k)
    sel = hot_rank[src] >= 0

    for n_rows in (g.n_nodes, -(-g.n_nodes // 512) * 512):  # plain / fused-padded
        d_dev, a_dev = _scatter_dense_block(
            jnp.asarray(dst[sel], jnp.int32),
            jnp.asarray(hot_rank[src[sel]], jnp.int32),
            jnp.asarray(w[sel], jnp.float32),
            jnp.asarray(hot_ids),
            n_rows=n_rows, k=k, compute_dtype="float32",
        )
        d_host = np.zeros((n_rows, k), np.float32)
        np.add.at(d_host, (dst[sel], hot_rank[src[sel]]), w[sel])
        np.testing.assert_allclose(np.asarray(d_dev), d_host, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a_dev), d_host[hot_ids], rtol=1e-6)
        assert not np.asarray(d_dev)[g.n_nodes :].any()  # padded rows stay zero


def test_hybrid_k_zero_means_segment_path():
    # explicit hybrid_k=0 disables the decomposition entirely: no hybrid
    # plan AND no pallas fallback unless use_pallas asked for it
    g = _rand_graph(seed=41)
    adj = NormAdj.from_graph(g, use_pallas=False, hybrid_k=0)
    assert adj.plan is None
    adj_p = NormAdj.from_graph(g, use_pallas=True, hybrid_k=0)
    assert adj_p.plan is not None and not isinstance(adj_p.plan, HybridPlan)


@pytest.mark.parametrize("mode", ["segment", "auto"])
def test_hybrid_segment_residual_matches(mode):
    # resid_mode='segment' routes the cold-cold residual through
    # jax.ops.segment_sum instead of the tile kernel — same numbers,
    # forward and backward (the EP ensemble step trains on this form)
    g = _rand_graph(seed=51)
    adj_ref = NormAdj.from_graph(g)
    adj_s = NormAdj.from_graph(g, hybrid_k=128, hybrid_resid=mode)
    plan = adj_s.plan
    assert isinstance(plan, HybridPlan)
    if mode == "segment":
        assert plan.res_fwd is None and plan.seg_src is not None
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((g.n_nodes, 16)), jnp.float32
    )
    ref = spmm_segment(adj_ref, x)
    got = jax.jit(spmm)(adj_s, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    cot = jnp.asarray(
        np.random.default_rng(4).standard_normal((g.n_nodes, 16)), jnp.float32
    )
    g_ref = jax.grad(lambda v: jnp.sum(spmm_segment(adj_ref, v) * cot))(x)
    g_got = jax.grad(lambda v: jnp.sum(spmm(adj_s, v) * cot))(x)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=2e-4, atol=2e-5
    )


def test_hybrid_segment_residual_vmaps():
    # the segment-residual hybrid must compose with jax.vmap (the vmapped
    # EP train step maps it over ensemble members)
    g = _rand_graph(seed=61)
    adj_ref = NormAdj.from_graph(g)
    adj_s = NormAdj.from_graph(g, hybrid_k=128, hybrid_resid="segment")
    xs = jnp.asarray(
        np.random.default_rng(5).standard_normal((3, g.n_nodes, 8)), jnp.float32
    )
    ref = jax.vmap(lambda x: spmm_segment(adj_ref, x))(xs)
    got = jax.jit(jax.vmap(lambda x: spmm(adj_s, x)))(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_choose_hot_k_batch_monotone():
    # A vmapped EP ensemble (batch > 1) shares the dense D stream across
    # members but pays the residual per member, so the chosen K can only
    # grow with the ensemble size.
    from pytextgcn_tpu.ops.hybrid import _predict_cost_ns, choose_hot_k

    g = _rand_graph(n_vocab=3000, n_docs=2000, n_edges=200_000, seed=4)
    src, dst = np.asarray(g.edge_src), np.asarray(g.edge_dst)
    k1 = choose_hot_k(src, g.n_nodes, h=128, dst=dst, segment_resid=True)
    k6 = choose_hot_k(src, g.n_nodes, h=128, dst=dst, batch=6,
                      segment_resid=True)
    assert k6 >= k1 > 0
    # residual cost scales with batch; the dense byte term does not (only
    # its MXU-flop term does), so per-candidate cost grows sublinearly.
    # Derive the expected structure from the model itself instead of a
    # hard-coded 6x bound (which held by ~1% and would flip on any
    # _HBM_BPS/_MXU recalibration): cost(b) == dense(b) + b * resid(1).
    b = 6
    c1 = _predict_cost_ns(g.n_nodes, len(src), 50_000, 1024, 128, 4)
    cb = _predict_cost_ns(g.n_nodes, len(src), 50_000, 1024, 128, 4, batch=b)
    dense1 = _predict_cost_ns(g.n_nodes, len(src), 0, 1024, 128, 4)
    denseb = _predict_cost_ns(g.n_nodes, len(src), 0, 1024, 128, 4, batch=b)
    assert c1 < cb
    np.testing.assert_allclose(cb - denseb, b * (c1 - dense1), rtol=1e-9)
    assert denseb <= b * dense1 * (1 + 1e-9)
    # byte-bound anywhere -> strictly sublinear IN THE DENSE TERM; the
    # total cb vs b*c1 comparison is float-cancellation-fragile when the
    # dense gap is tiny relative to the resid term (the r5 kk_ns term
    # scales linearly with batch and shrank the gap to rounding noise),
    # so assert sublinearity where it structurally lives
    if denseb < b * dense1:
        assert cb <= b * c1 * (1 + 1e-12)


def test_hybrid_split2_trajectory_tracks_segment():
    """'split2' residual mode (two exact-one-hot bf16 passes, ~3e-6 max rel
    error per SpMM — probe_resid_kernel.py) must track the segment-f32
    oracle's *training trajectory*, not just a single forward: same init,
    dropout 0, per-epoch losses and final parameters within float-noise
    accumulation. This is what licenses bench.py to count the split2 step
    as a parity-class f32 path."""
    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.train import Trainer

    g = _rand_graph(seed=11)

    def mk(**kw):
        return Trainer(GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.0),
                       seed=3, **kw)

    t_seg = mk()
    t_s2 = mk(hybrid_k=128, hybrid_f32_mode="split2")
    h_seg = t_seg.fit(g, epochs=15, n_classes=3)
    h_s2 = t_s2.fit(g, epochs=15, n_classes=3)
    # the knob must actually reach the residual tile plans
    assert t_s2._adj.plan.res_fwd is not None
    assert t_s2._adj.plan.res_fwd.f32_mode == "split2"
    np.testing.assert_allclose(
        [r["loss"] for r in h_seg], [r["loss"] for r in h_s2],
        rtol=1e-3, atol=1e-5,
    )
    for a, b in zip(jax.tree_util.tree_leaves(t_seg.params),
                    jax.tree_util.tree_leaves(t_s2.params)):
        scale = max(float(np.abs(np.asarray(a)).max()), 1e-6)
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) / scale < 5e-3
