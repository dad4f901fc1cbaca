"""Benchmark: full-batch TextGCN training-step throughput on one chip.

Measures the per-epoch hot path (SURVEY.md §3.1/§3.3): a jitted train step —
2-layer GCN forward, masked-CE backward, Adam(amsgrad) update — on a graph
built by the framework's own pipeline (Text2Graph over a Zipfian corpus, so
the hub-word degree skew that stresses the SpMM paths is real), at two graph
scales. One GCN train step traverses every edge 4x (2 layers forward + 2
transposed SpMMs in backward), so the headline metric is edge-traversals/s
for the fastest parity-exact (f32) path.

``vs_baseline`` is the speedup over the identical train step with the
aggregation on XLA's gather/scatter path (jax.ops.segment_sum) — the role
torch-scatter plays in the reference; the reference itself publishes no
wall-clock numbers (BASELINE.md). ``fraction_of_roofline`` reports the
dominant SpMM against the *measured* streaming speed-of-light of this chip
(~220 GB/s payload bandwidth; experiments/chip_probe.py — the 820 GB/s
paper number is not achievable even by dense reads here, see RESULTS.md).

Prints exactly one JSON line on stdout; progress goes to stderr.
"""

import json
import os
import sys
import time

import numpy as np

N_HIDDEN = 100
N_CLASSES = 43  # Amazon Cat2
EPOCHS_MEASURED = 20
SCALES = [8_000, 20_000]  # corpus sizes (docs); E ~ 3M / ~8M edges
MEASURED_HBM_GBPS = 220.0  # chip_probe: f32 gather payload == dense-read cap
# persisted hybrid plans (ops/plan_cache.py): cold host builds cost 13-38 s
# per configuration at the recorded scale; a warm process rebuilds only the
# on-device dense blocks (VERDICT r3 item 5)
PLAN_CACHE = ".plan_cache"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def zipf_corpus(n_docs, v_draw=40_000, alpha=1.05, seed=0):
    """Zipf-distributed corpus: real hub-word structure for Text2Graph."""
    rng = np.random.default_rng(seed)
    p = 1.0 / np.arange(1, v_draw + 1) ** alpha
    cum = np.cumsum(p / p.sum())
    docs = []
    lengths = np.clip(np.exp(rng.normal(4.0, 0.6, n_docs)).astype(int), 5, 400)
    for i in range(n_docs):
        idx = np.searchsorted(cum, rng.random(lengths[i])).clip(0, v_draw - 1)
        docs.append(" ".join(f"w{j}" for j in idx))
    return docs


def build_graph(n_docs):
    from pytextgcn_tpu import Text2Graph

    docs = zipf_corpus(n_docs)
    t0 = time.time()
    t2g = Text2Graph(min_df=5, window_size=20, rm_stopwords=False)
    g = t2g.fit_transform(docs, [0] * len(docs))
    # benchmark labels/masks (the generator gives one class; spread labels
    # so the CE/metrics path does real work)
    rng = np.random.default_rng(1)
    n = g.n_nodes
    g.y = rng.integers(0, N_CLASSES, n).astype(np.int32)
    g.train_mask = np.zeros(n, bool)
    g.train_mask[g.n_vocab : g.n_vocab + int(g.n_docs * 0.7)] = True
    log(
        f"graph(docs={n_docs}): N={g.n_nodes} (vocab {g.n_vocab}) "
        f"E={g.n_edges} built in {time.time() - t0:.0f}s"
    )
    return g


TIMING_BLOCKS = 3  # independent timed blocks per variant (spread reporting)


def time_step(step_fn, params, opt_state, rng, repeats, blocks=TIMING_BLOCKS):
    # compile + warmup (remote backends need several steps to settle); the
    # float() fetches force real synchronization — block_until_ready alone
    # under-reports through relay tunnels. Each BLOCK repeats the r1-r4
    # estimator (`repeats` steps + one sync fetch) so the median is
    # round-over-round comparable while min/max expose the relay session's
    # step-to-step variance (VERDICT r4 Weak #2: r3 vs r4 differed ~7%
    # across sessions with nothing recording the spread).
    p, s, loss = step_fn(params, opt_state, rng)
    for _ in range(4):
        p, s, loss = step_fn(p, s, rng)
    _ = float(loss)
    times = []
    for _ in range(blocks):
        t0 = time.time()
        for _ in range(repeats):
            p, s, loss = step_fn(p, s, rng)
        final = float(loss)
        times.append((time.time() - t0) / repeats)
    times.sort()
    return times[len(times) // 2], times, final


def bench_scale(g, variants):
    import jax
    import jax.numpy as jnp
    import optax
    from pytextgcn_tpu.train.optim import torch_amsgrad

    from pytextgcn_tpu.models import GCN
    from pytextgcn_tpu.ops import NodeFeatures, NormAdj
    from pytextgcn_tpu.train.metrics import masked_cross_entropy

    feats = NodeFeatures.from_graph(g)
    model = GCN(in_dim=g.in_dim, out_dim=N_CLASSES, n_hidden_gcn=N_HIDDEN, dropout=0.5)
    y = jnp.asarray(g.y)
    mask = jnp.asarray(g.train_mask)
    opt = torch_amsgrad(0.05)

    # adj rides as a jit ARGUMENT: closed-over arrays would be embedded as
    # constants in the compiled program (and in the remote-compile request
    # body, which has a hard size limit on tunneled backends)
    @jax.jit
    def step_fn(adj, params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(p, adj, feats, train=True, rng=rng)
            return masked_cross_entropy(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    params = model.init(jax.random.PRNGKey(0))
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)

    # masked-head step (ops/restricted.py): the final layer aggregates into
    # the train rows only — the exact same gradients (GCN dropout sits on
    # hidden), with 2 of the 4 SpMMs cut to the train-incident edge subset
    rows = np.flatnonzero(np.asarray(g.train_mask))
    y_r = jnp.asarray(np.asarray(g.y)[rows])
    mask_r = jnp.ones(len(rows), bool)

    @jax.jit
    def step_fn_masked(adj, adj_out, params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(p, adj, feats, train=True, rng=rng,
                                 adj_out=adj_out)
            return masked_cross_entropy(logits, y_r, mask_r)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    results, preds, build_times, spreads = {}, {}, {}, {}
    for name, kwargs in variants:
        masked = kwargs.pop("masked_head", False)
        t0 = time.time()
        try:
            adj = NormAdj.from_graph(g, **kwargs)
            adj_out = None
            if masked:
                from pytextgcn_tpu.ops.restricted import build_restricted_adj

                adj_out = build_restricted_adj(
                    g, rows, hot_k="auto",
                    compute_dtype=kwargs.get("pallas_dtype", "float32"),
                    resid_f32_mode=kwargs.get("hybrid_f32_mode"),
                )
        except Exception as e:
            log(f"  {name}: adjacency build failed ({type(e).__name__}: {e})")
            continue
        build_s = time.time() - t0
        try:
            if masked:
                run = lambda p, s, r: step_fn_masked(adj, adj_out, p, s, r)
            else:
                run = lambda p, s, r: step_fn(adj, p, s, r)
            dt, dts, loss = time_step(run, params, opt_state, rng, EPOCHS_MEASURED)
        except Exception as e:
            log(f"  {name}: step failed ({type(e).__name__}: {e})")
            continue
        results[name] = dt
        spreads[name] = dts
        build_times[name] = build_s
        # hard per-SpMM-equivalent floor of the variant's decomposition
        # (hybrid plans carry it; the masked step runs 2 full + 2 restricted
        # applications, so its per-application floor is the mean of the two)
        floor = getattr(adj.plan, "floor_spmm_ns", None)
        if masked and floor is not None and adj_out is not None:
            floor = (2 * floor + 2 * adj_out.floor_spmm_ns) / 4
        preds[name] = (floor, getattr(adj.plan, "k", None))
        from pytextgcn_tpu.ops.hybrid import HybridPlan

        if isinstance(adj.plan, HybridPlan):
            # kept for the run-time probed-floor account in main()
            preds["_plan_" + name] = adj.plan
        log(
            f"  {name}: {dt * 1e3:.2f} ms/step "
            f"[{dts[0] * 1e3:.2f}-{dts[-1] * 1e3:.2f} over {len(dts)} blocks] "
            f"({4 * g.n_edges / dt / 1e9:.3f} G edge-trav/s; "
            f"plan {build_s:.0f}s; loss {loss:.3f})"
        )
    return results, preds, build_times, spreads


def main():
    import jax

    # persistent XLA compile cache: cross-PROCESS warm runs skip the
    # remote-compile service (measured 54 s -> 1.6 s for a first jit on
    # the tunneled backend; compiled programs are keyed by HLO, so plan
    # shapes from .plan_cache line up with their cached executables)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")
    on_accel = jax.default_backend() in ("tpu", "axon")
    scales = SCALES if on_accel else [2_000]
    global EPOCHS_MEASURED
    if not on_accel:
        EPOCHS_MEASURED = 3

    all_results = {}
    for n_docs in scales:
        g = build_graph(n_docs)
        variants = [
            ("segment f32", dict()),
            ("pallas f32", dict(use_pallas=True)),
            # the library's f32 default: 'split2' since its round-5
            # protocol-scale license (seed-for-seed identical 500-epoch
            # flat landings vs 'highest' — RESULTS.md round 5; trajectory
            # pin in tests/test_spmm_hybrid.py). Two exact-one-hot bf16
            # residual passes + the hi/lo split-fused dense pair
            # (ops/fused_dual.py), ~2e-5 relative per SpMM.
            ("hybrid f32", dict(hybrid_k="auto", plan_cache=PLAN_CACHE,
                                hybrid_f32_mode="split2")),
            ("hybrid f32 masked-head",
             dict(hybrid_k="auto", plan_cache=PLAN_CACHE,
                  hybrid_f32_mode="split2", masked_head=True)),
            # strict-exactness 3-pass f32 path (~1e-7), one knob away
            ("hybrid f32.highest",
             dict(hybrid_k="auto", plan_cache=PLAN_CACHE,
                  hybrid_f32_mode="highest")),
            ("hybrid f32.highest masked-head",
             dict(hybrid_k="auto", plan_cache=PLAN_CACHE,
                  hybrid_f32_mode="highest", masked_head=True)),
            ("hybrid bf16", dict(hybrid_k="auto", plan_cache=PLAN_CACHE,
                                 pallas_dtype="bfloat16")),
            ("hybrid bf16 masked-head",
             dict(hybrid_k="auto", plan_cache=PLAN_CACHE,
                  pallas_dtype="bfloat16", masked_head=True)),
        ]
        if n_docs != scales[0]:
            variants = [v for v in variants if v[0] != "pallas f32"]
        res, preds, builds, spreads = bench_scale(g, variants)
        all_results[n_docs] = (g, res, preds, builds, spreads)

    # headline: fastest parity-exact (f32) path at the largest scale
    n_docs = scales[-1]
    g, res, preds, builds, spreads = all_results[n_docs]
    seg_dt = res.get("segment f32")
    # every f32 variant (including the segment baseline) is parity-exact;
    # if all f32 candidates failed, fall back to whatever ran — the
    # best_path field makes the non-parity fallback visible
    f32 = {k: v for k, v in res.items() if "f32" in k}
    candidates = f32 or res
    if not candidates:
        log("all variants failed — no benchmark result")
        sys.exit(1)
    best_name, best_dt = min(candidates.items(), key=lambda kv: kv[1])
    # headline honesty (VERDICT r3 item 9): the masked-head step computes
    # strictly less (logits at train rows only), so it only headlines when
    # its gain over the full step is material (>=10%) at this scale —
    # otherwise the headline is the step every user of the full protocol
    # gets, and the masked-head gain stays visible in masked_head_speedup
    if best_name.endswith("masked-head"):
        full_name = best_name.replace(" masked-head", "")
        if full_name in res and res[full_name] / best_dt < 1.10:
            best_name, best_dt = full_name, res[full_name]
    traversals = 4 * g.n_edges
    value = traversals / best_dt
    # roofline: ideal streaming traffic of the step's 4 SpMMs at the
    # measured ceiling (x read once + out written once + edge list per SpMM)
    h = N_HIDDEN
    ideal_bytes = 4 * (2 * g.n_nodes * h * 4 + g.n_edges * 8)
    ideal_s = ideal_bytes / (MEASURED_HBM_GBPS * 1e9)
    fraction = ideal_s / best_dt
    # formulation-level floor: any per-edge-gather SpMM pays the measured
    # 0.427 Grows/s gather issue rate (chip_probe); >1.0 means the hybrid
    # decomposition runs faster than gathering alone could
    gather_floor_s = traversals / 0.427e9
    x_of_gather_floor = gather_floor_s / best_dt
    # achievable floor for the full-output hybrid decomposition: per SpMM,
    # the dense half's roofline term (max of HBM stream and measured H=128
    # MXU rate) plus the residual at the chip's measured gather issue rate,
    # x 4 applications (probes: chip_probe.py, probe_fused.py; constants at
    # ops/hybrid.py). Unlike the pure-stream "roofline" above, this floor
    # respects what the hardware can actually do for this formulation.
    # Reported against the full-output hybrid step — the decomposition the
    # floor models; the masked-head step does strictly LESS work (its own
    # floor is far lower), so its speed shows up in `value` and
    # `masked_head_speedup`, not as a floor fraction.
    frac_name = "hybrid f32" if "hybrid f32" in res else best_name
    floor_ns, _ = preds.get(frac_name, (None, None))
    fraction_of_achievable = (
        round(4 * floor_ns * 1e-9 / res[frac_name], 4) if floor_ns else None
    )
    # RUN-TIME floor (VERDICT r2 item 3): re-measure the chip's gather
    # issue rate / streaming bandwidth / MXU rates fresh (ops/probe.py) and
    # derive the floor from those instead of the ops/hybrid.py constants.
    # The probed floor accounts the step's actual four applications (2 at
    # h=N_HIDDEN forward+backward of layer 1, 2 at h=N_CLASSES for layer
    # 2), where the frozen-constant floor uses the plan's h_hint=128.
    probe_fields = {}
    plan = all_results[n_docs][2].get("_plan_" + frac_name)
    if plan is not None:
        try:
            from pytextgcn_tpu.ops.probe import probe_chip

            pr = probe_chip()
            floor_probed_s = (
                2 * pr.hybrid_floor_ns(plan, N_HIDDEN)
                + 2 * pr.hybrid_floor_ns(plan, N_CLASSES)
            ) * 1e-9
            # a floor above the measured step is not a floor (VERDICT r3
            # Weak #1): flag it loudly instead of reporting a >1 fraction
            # as if it meant something
            floor_ok = floor_probed_s <= res[frac_name] * 1.02
            probe_fields = {
                "probed_gather_ns": round(pr.gather_ns, 3),
                "probed_hbm_bps": round(pr.hbm_bps, 1),
                "probed_stream_bps": round(pr.stream_bps, 1),
                # the streaming roofline fraction against THIS RUN's pure
                # copy bandwidth (fraction_of_roofline keeps the frozen
                # 220 GB/s constant for round-over-round comparability)
                "fraction_of_roofline_probed": round(
                    ideal_bytes / pr.stream_bps / best_dt, 4
                ) if pr.stream_bps else None,
                "probed_mxu_f32_fps": round(pr.mxu_f32_fps, 1),
                "probed_mxu_bf16_fps": round(pr.mxu_bf16_fps, 1),
                "probe_s": round(pr.probe_s, 1),
                "fraction_of_achievable_probed": round(
                    floor_probed_s / res[frac_name], 4
                ),
                "floor_check": "ok" if floor_ok else "VIOLATED",
            }
            log(
                f"probe: gather {pr.gather_ns:.2f} ns/row, copy "
                f"{pr.stream_bps / 1e9:.0f} GB/s, D-read "
                f"{pr.hbm_bps / 1e9:.0f} GB/s, MXU f32 "
                f"{pr.mxu_f32_fps / 1e12:.1f} TF/s (bf16 "
                f"{pr.mxu_bf16_fps / 1e12:.1f}); probed floor "
                f"{floor_probed_s * 1e3:.1f} ms vs step "
                f"{res[frac_name] * 1e3:.1f} ms"
            )
            if not floor_ok:
                log(
                    "WARNING: probed floor EXCEEDS the measured step — the "
                    "probe under-measured this chip's ceilings; treat "
                    "fraction_of_achievable_probed as unreliable this run"
                )
        except Exception as e:  # probes must never sink the benchmark
            log(f"chip probe failed ({type(e).__name__}: {e})")
    # warm plan load (VERDICT r3 item 5): the cold build above persisted the
    # plan; a fresh NormAdj.from_graph now re-derives normalization, hits
    # the fingerprint, and rebuilds only the on-device dense blocks
    plan_fields = {}
    if frac_name in builds:
        try:
            from pytextgcn_tpu.ops import NormAdj

            t0 = time.time()
            NormAdj.from_graph(g, hybrid_k="auto", plan_cache=PLAN_CACHE)
            warm_s = time.time() - t0
            plan_fields = {
                "plan_cold_s": round(builds[frac_name], 1),
                "plan_warm_s": round(warm_s, 1),
            }
            log(f"plan cache at E={g.n_edges}: cold {builds[frac_name]:.0f}s, "
                f"warm {warm_s:.1f}s")
        except Exception as e:
            log(f"warm plan load failed ({type(e).__name__}: {e})")
    best_k = preds.get(best_name, (None, None))[1]
    masked_speedup = (
        round(res["hybrid f32"] / res["hybrid f32 masked-head"], 3)
        if "hybrid f32" in res and "hybrid f32 masked-head" in res
        else None
    )
    log(
        f"best parity path at docs={n_docs}: {best_name} "
        f"({value / 1e9:.3f} G edge-trav/s, {fraction * 100:.0f}% of measured "
        f"streaming roofline; bf16 mode: "
        f"{traversals / res['hybrid bf16'] / 1e9:.3f} G)"
        if "hybrid bf16" in res
        else f"best: {best_name}"
    )
    out = {
        "metric": "gcn_train_step_edge_traversals_per_s",
        "value": round(value, 1),
        "unit": "edges/s",
        "vs_baseline": round(seg_dt / best_dt, 3) if seg_dt else 1.0,
        "fraction_of_roofline": round(fraction, 4),
        "fraction_of_achievable": fraction_of_achievable,
        **probe_fields,
        **plan_fields,
        "masked_head_speedup": masked_speedup,
        "hybrid_k": best_k,
        "x_of_gather_floor": round(x_of_gather_floor, 3),
        "best_path": best_name,
        "graph": {"n_nodes": g.n_nodes, "n_edges": g.n_edges, "built_by": "Text2Graph"},
        "step_ms": {k: round(v * 1e3, 3) for k, v in res.items()},
        # [min, median, max] ms/step over TIMING_BLOCKS independent blocks:
        # the relay session's step-timing variance, recorded so a round-
        # over-round delta can be judged against this run's own spread
        # (VERDICT r4 Weak #2)
        "step_ms_spread": {
            k: [round(t * 1e3, 3) for t in v] for k, v in spreads.items()
        },
        "timing_blocks": TIMING_BLOCKS,
        "step_ms_small": {
            k: round(v * 1e3, 3) for k, v in all_results[scales[0]][1].items()
        },
        # session fingerprint: which backend/tunnel this run measured on,
        # identified by its own probed ceilings (two sessions through the
        # relay can differ ~7% — compare these before comparing step_ms)
        "session": {
            "backend": jax.default_backend(),
            "jax": jax.__version__,
            "devices": len(jax.devices()),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
