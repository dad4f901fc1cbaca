"""API surface tests: config CLI, Text2Graph artifacts, Trainer over a mesh,
profiling utilities, results writer."""

import os

import numpy as np
import pytest

from pytextgcn_tpu import Text2Graph
from pytextgcn_tpu.config import ExperimentConfig, make_model, parse_config
from pytextgcn_tpu.data import synthetic_corpus
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.train import Trainer
from pytextgcn_tpu.train.profiling import StageTimer, spmm_roofline
from pytextgcn_tpu.train.results import append_result


def test_config_cli_roundtrip():
    cfg = parse_config(
        [
            "--dataset", "amazon", "--labels", "Cat1",
            "--graph-max-df", "0.6", "--graph-window-size", "10",
            "--graph-max-length", "15",
            "--model-model", "egcn", "--model-n-hidden", "64",
            "--train-lr", "0.01", "--train-seed", "7",
        ]
    )
    assert cfg.dataset == "amazon" and cfg.labels == "Cat1"
    assert cfg.graph.max_df == 0.6 and cfg.graph.window_size == 10
    assert cfg.graph.max_length == 15
    assert cfg.model.model == "egcn" and cfg.model.n_hidden == 64
    assert cfg.train.lr == 0.01 and cfg.train.seed == 7
    m = make_model(cfg.model, in_dim=100, out_dim=5)
    assert m.__class__.__name__ == "EGCN"


def test_text2graph_save_load_and_vocabulary(tmp_path):
    docs, labels = synthetic_corpus(n_docs=40, n_classes=2, seed=7)
    t2g = Text2Graph(min_df=1, window_size=4, save_path=str(tmp_path))
    g = t2g.fit_transform(docs, labels, test_idx=[0, 1])
    assert len(t2g.vocabulary) == g.n_vocab
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    assert len(files) == 1
    g2 = Text2Graph.load_graph(os.path.join(tmp_path, files[0]))
    np.testing.assert_array_equal(np.asarray(g2.edge_src), np.asarray(g.edge_src))
    with pytest.raises(FileNotFoundError):
        Text2Graph.load_graph(str(tmp_path / "missing.npz"))


def test_text2graph_directory_input(tmp_path):
    docs, labels = synthetic_corpus(n_docs=6, n_classes=2, seed=9)
    for i, d in enumerate(docs):
        (tmp_path / f"doc{i}.txt").write_text(d)
    t2g = Text2Graph(min_df=1, window_size=4)
    g = t2g.fit_transform(str(tmp_path), labels, test_idx=[0])
    assert g.n_docs == 6


def test_trainer_over_mesh():
    import jax

    from pytextgcn_tpu.parallel import make_mesh

    docs, labels = synthetic_corpus(n_docs=80, n_classes=3, seed=2)
    t2g = Text2Graph(min_df=1, window_size=4)
    g = t2g.fit_transform(docs, labels, test_idx=np.arange(60, 80))
    mesh = make_mesh(min(4, len(jax.devices())))
    model = GCN(g.in_dim, 3, n_hidden_gcn=16, dropout=0.2)
    trainer = Trainer(model, lr=0.05, mesh=mesh)
    hist = trainer.fit(g, epochs=40, n_classes=3)
    assert hist[-1]["loss"] < hist[0]["loss"]
    m = trainer.evaluate(g, n_classes=3)
    assert m["accuracy"] >= 0.6, m


def test_stage_timer_and_roofline(tmp_path):
    t = StageTimer(path=str(tmp_path / "stages.jsonl"))
    with t.stage("build", n_docs=10):
        pass
    with t.stage("train"):
        pass
    s = t.summary()
    assert set(s) == {"build", "train"}
    assert os.path.exists(tmp_path / "stages.jsonl")

    r = spmm_roofline(n_edges=1_000_000, n_nodes=50_000, feat_dim=128, seconds=0.001)
    assert r["edges_per_s"] == 1e9
    assert 0 < r["fraction_of_roofline"]


def test_results_writer(tmp_path):
    f = str(tmp_path / "results.csv")
    append_result(f, seed=42, model="GCN", hierarchy="flat", f1_macro=0.5, accuracy=0.6)
    append_result(f, seed=43, model="GCN", hierarchy="flat", f1_macro=0.55, accuracy=0.61)
    lines = open(f).read().strip().splitlines()
    assert lines[0] == "seed,model,hierarchy,f1-macro,accuracy"
    assert len(lines) == 3
    assert os.path.exists(f + ".jsonl")


def test_graph_save_load_without_npz_suffix(tmp_path):
    # np.savez appends '.npz' to extension-less paths; load() must mirror it
    from pytextgcn_tpu import Text2Graph
    from pytextgcn_tpu.core.graph import TextGraph
    from pytextgcn_tpu.data import synthetic_corpus

    docs, labels = synthetic_corpus(n_docs=40, n_classes=2, seed=3)
    g = Text2Graph(min_df=1, window_size=4).fit_transform(docs, labels)
    p = str(tmp_path / "artifact")  # no extension
    g.save(p)
    g2 = TextGraph.load(p)
    assert g2.n_nodes == g.n_nodes and g2.n_edges == g.n_edges
    g3 = Text2Graph.load_graph(p)
    assert g3.n_vocab == g.n_vocab


def test_sharding_args_mapping():
    """--train-sharding -> Trainer kwargs (config.sharding_args): each mode
    maps to the right mesh/halo/hybrid_k combination; 'halo' clears
    hybrid_k so the default 'auto-tpu' never silently upgrades the pure
    halo path to the hybrid-sharded operator."""
    import dataclasses

    from pytextgcn_tpu.config import TrainConfig, sharding_args

    cfg = TrainConfig()

    off = sharding_args(dataclasses.replace(cfg, sharding="off"), "auto")
    assert off == {"hybrid_k": "auto"}

    ag = sharding_args(dataclasses.replace(cfg, sharding="allgather"), "auto")
    assert ag["hybrid_k"] is None and "halo" not in ag
    assert ag["mesh"].devices.size >= 1

    halo = sharding_args(dataclasses.replace(cfg, sharding="halo"), "auto")
    assert halo["halo"] is True and halo["hybrid_k"] is None

    hy = sharding_args(dataclasses.replace(cfg, sharding="hybrid"), None)
    assert hy["halo"] is True and hy["hybrid_k"] == "auto"
    hy2 = sharding_args(dataclasses.replace(cfg, sharding="hybrid"), 512)
    assert hy2["hybrid_k"] == 512

    n1 = sharding_args(
        dataclasses.replace(cfg, sharding="halo", n_devices=1), None
    )
    assert n1["mesh"].devices.size == 1

    with pytest.raises(SystemExit):
        sharding_args(dataclasses.replace(cfg, sharding="bogus"), None)


def test_compile_cache_config(tmp_path):
    """parse_config wires the persistent XLA compile cache (measured 54 s
    -> 1.6 s for a first jit across processes on the tunneled backend);
    '' / 'none' disables without touching an already-set directory."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        cache = str(tmp_path / "xc")
        parse_config(["--train-compile-cache", cache])
        assert jax.config.jax_compilation_cache_dir == cache
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5
        # disabling leaves the previous setting alone (idempotent drivers)
        parse_config(["--train-compile-cache", ""])
        assert jax.config.jax_compilation_cache_dir == cache
        parse_config(["--train-compile-cache", "none"])
        assert jax.config.jax_compilation_cache_dir == cache
        # a RELATIVE cache path anchors at the repo root, not cwd
        parse_config(["--train-compile-cache", "relcache"])
        from pytextgcn_tpu.config import _REPO_ROOT

        assert jax.config.jax_compilation_cache_dir == os.path.join(
            _REPO_ROOT, "relcache")
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          before_min)
