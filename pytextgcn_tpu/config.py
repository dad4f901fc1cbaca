"""Dataclass configs + CLI.

The reference has no config system — every experiment is a script with
module-level constants edited in place (README.md:44-45; the only CLI arg
anywhere is the seed in perlabel_amazon.py:34). Here the same knob set is a
typed config tree with an argparse bridge, shared by all experiment drivers.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional, Union

# repo root (parent of the package dir): anchors relative cache paths so
# drivers launched from any cwd share one compile cache
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@dataclasses.dataclass
class GraphConfig:
    """Text2Graph knobs (reference: text2graph.py:50-52)."""

    min_df: Union[int, float] = 5
    max_df: Union[int, float] = 1.0
    window_size: int = 20
    max_length: Optional[int] = None
    rm_stopwords: bool = True
    backend: str = "auto"  # native | device | oracle | auto
    save_path: Optional[str] = None  # directory for TGData_*.npz artifacts


@dataclasses.dataclass
class ModelConfig:
    model: str = "gcn"  # gcn | egcn | jk | mlp
    n_hidden: int = 100
    n_gcn: int = 2
    dropout: float = 0.7
    embedding_dim: int = 2000  # egcn only
    mlp_hidden: List[int] = dataclasses.field(default_factory=lambda: [256, 128])


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 500
    lr: float = 0.05
    seed: int = 44
    val_split: float = 0.1
    early_stopping: Optional[str] = None  # None | reference | val_f1
    use_pallas: bool = False
    # dense-hot/sparse-cold SpMM decomposition (ops/hybrid.py): 'auto'
    # picks the hot-set size by cost model (and falls back to the pure
    # path when the graph has no exploitable hot set), an int forces K,
    # 'off' disables, 'auto-tpu' (default) = 'auto' on TPU backends and
    # 'off' elsewhere — TPU runs get the fast aggregation without flags,
    # CPU runs skip the plan-build cost where XLA's segment path is fine
    hybrid_k: str = "auto-tpu"
    # one-pass-over-D fused dual kernel for the hybrid's dense half
    # (ops/fused_dual.py): 'auto' = backend default, 'on'/'off' = force
    hybrid_fused: str = "auto"
    # f32 MXU strategy for the hybrid's cold residual tile kernel
    # (ops/spmm_pallas.py): 'default' = RESID_F32_MODE ('split2' since its
    # round-5 protocol-scale license: two exact-one-hot bf16 passes +
    # split-fused dense pair, ~2e-5 rel, seed-for-seed identical protocol
    # landings vs 'highest'), 'highest' = 3-pass exact f32 for
    # strict-exactness callers
    hybrid_f32_mode: str = "default"
    # compute dtype of the hybrid/Pallas aggregation: 'float32' (parity-
    # exact) or 'bfloat16' (~2x faster on chip; params/optimizer/loss stay
    # f32 — protocol-scale accuracy validation in RESULTS.md)
    pallas_dtype: str = "float32"
    eval_every: int = 1
    # 0 = full-batch (the reference protocol); >0 trains on n-hop
    # neighborhood mini-batches of that many documents (Trainer.fit_minibatch)
    batch_size: int = 0
    # checkify-instrumented steps: raise on NaN/Inf/out-of-bounds at the
    # offending epoch (slow; forces the segment aggregation) — SURVEY §5
    debug_checks: bool = False
    # update rule: 'default' = the driver's reference-protocol optimizer
    # (flat drivers: torch-exact Adam(amsgrad=True), train/optim.py;
    # hierarchy/hyperopt: plain Adam — matching flat_amazon.py:89 vs
    # perlevel_amazon.py:84); or force 'adam' | 'torch_amsgrad' |
    # 'optax_amsgrad'
    optimizer: str = "default"
    # directory for persisted hybrid SpMM plans (ops/plan_cache.py): warm
    # processes skip the host-side plan construction; '' disables
    plan_cache: str = ""
    # persistent XLA compile cache directory: warm PROCESSES skip the
    # jit compile entirely (on the tunneled TPU backend a first compile
    # costs 60-130 s through the remote-compile service; measured 54 s ->
    # 1.6 s with the cache). '' disables.
    compile_cache: str = ".xla_cache"
    # masked-head training (ops/restricted.py): the final layer aggregates
    # into the train rows only — exact for GCN (dropout on hidden layers);
    # composes with --train-sharding via parallel/restricted_sharded.py
    masked_head: bool = False
    # multi-chip graph partitioning (parallel/): 'off' = single device;
    # 'allgather' replicates activations (parallel/sharded.py), 'halo'
    # keeps them row-sharded with boundary-only exchange (parallel/halo.py),
    # 'hybrid' adds dense-hot MXU blocks per shard
    # (parallel/hybrid_sharded.py — implies hybrid_k 'auto' if unset)
    sharding: str = "off"
    # mesh size for --train-sharding (0 = all local devices)
    n_devices: int = 0
    # expert-parallel per-label ensemble (hierarchy/perlabel.py): train all
    # members in ONE vmapped jitted step, parameters sharded over an
    # 'ensemble' mesh of n_devices (a 1-device mesh still pays one compile
    # for the whole ensemble instead of one per member, and batches every
    # member's dense work into single MXU calls)
    ep: bool = False
    verbose: int = 1


@dataclasses.dataclass
class ExperimentConfig:
    # synthetic | amazon | dbpedia | synthetic-amazon | synthetic-dbpedia |
    # csv (generic: data_dir holds train.csv/test.csv[/val.csv] with a text
    # column and arbitrary label columns — the escape hatch the reference
    # lacks, where a new dataset meant writing a new driver script)
    dataset: str = "synthetic"
    data_dir: Optional[str] = None
    labels: str = "Cat2"  # amazon: Cat1/Cat2; dbpedia: l1/l2/l3; csv: any column
    text_col: Optional[str] = None  # csv: text column (auto-detect if unset)
    # synthetic-amazon/-dbpedia corpus size (0 = protocol default:
    # 50k/60k docs, the reference datasets' scales)
    n_docs: int = 0
    result_file: Optional[str] = None
    save_model: Optional[str] = None
    load_graph: Optional[str] = None  # path to a saved TGData_*.npz artifact
    graph: GraphConfig = dataclasses.field(default_factory=GraphConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)


def _add_dataclass_args(parser: argparse.ArgumentParser, dc, prefix: str = ""):
    def int_or_float(s):
        try:
            return int(s)
        except ValueError:
            return float(s)

    for f in dataclasses.fields(dc):
        default = getattr(dc, f.name)
        if dataclasses.is_dataclass(default):
            continue  # nested config, added with its own prefix
        name = f"--{prefix}{f.name.replace('_', '-')}"
        if f.name in ("min_df", "max_df"):
            # Union[int, float]: absolute count or document fraction
            parser.add_argument(name, type=int_or_float, default=default)
            continue
        if isinstance(default, bool):
            parser.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"), default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        elif isinstance(default, list):
            parser.add_argument(name, type=int, nargs="+", default=default)
        else:
            parser.add_argument(name, type=str, default=default)


def build_parser(cfg: Optional[ExperimentConfig] = None) -> argparse.ArgumentParser:
    cfg = cfg or ExperimentConfig()
    p = argparse.ArgumentParser(description="pytextgcn_tpu experiment driver")
    _add_dataclass_args(p, cfg)
    _add_dataclass_args(p, cfg.graph, "graph-")
    _add_dataclass_args(p, cfg.model, "model-")
    _add_dataclass_args(p, cfg.train, "train-")
    return p


def parse_config(argv=None, cfg: Optional[ExperimentConfig] = None) -> ExperimentConfig:
    cfg = cfg or ExperimentConfig()
    args = vars(build_parser(cfg).parse_args(argv))

    def pull(dc, prefix=""):
        for f in dataclasses.fields(dc):
            key = f"{prefix}{f.name}"
            if key in args and args[key] is not None:
                setattr(dc, f.name, args[key])

    pull(cfg)
    pull(cfg.graph, "graph_")
    pull(cfg.model, "model_")
    pull(cfg.train, "train_")
    # argparse 'None' strings back to None
    for obj, name in ((cfg, "data_dir"), (cfg, "result_file"), (cfg, "save_model"),
                      (cfg, "load_graph"), (cfg.train, "early_stopping"),
                      (cfg.train, "compile_cache"),
                      (cfg.graph, "max_length"), (cfg.graph, "save_path")):
        if getattr(obj, name) in ("None", "none", ""):
            setattr(obj, name, None)
    if isinstance(cfg.graph.max_length, str):
        cfg.graph.max_length = int(cfg.graph.max_length)
    if cfg.train.compile_cache:
        # idempotent, applies to every driver going through parse_config.
        # '' / 'none' means "leave as-is": it skips this block without
        # clearing a cache dir already set earlier in the process (a jax
        # config update can't be un-done per-driver). A relative path is
        # anchored at the repo root, not cwd, so every driver shares one
        # cache regardless of where it was launched from (advisor r4).
        import jax

        path = cfg.train.compile_cache
        if not os.path.isabs(path):
            path = os.path.join(_REPO_ROOT, path)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cfg


def hybrid_k_arg(cfg: TrainConfig):
    """TrainConfig.hybrid_k ('off' | 'auto' | 'auto-tpu' | int string) ->
    Trainer arg."""
    v = cfg.hybrid_k
    if v in (None, "off", "none", ""):
        return None
    if v == "auto-tpu":
        import jax

        # 'axon' is the tunneled-TPU plugin's backend name in this
        # environment; both are compiled TPU backends
        return "auto" if jax.default_backend() in ("tpu", "axon") else None
    if v == "auto":
        return "auto"
    try:
        return int(v) or None  # 0 = off, like 'off'
    except ValueError:
        raise SystemExit(
            f"--train-hybrid-k must be 'off', 'auto', 'auto-tpu', or an "
            f"integer hot-set size, got {v!r}"
        )


def sharding_args(cfg: TrainConfig, hybrid_k) -> dict:
    """TrainConfig.sharding/n_devices -> Trainer kwargs (mesh, halo, and the
    possibly-overridden hybrid_k). ``hybrid_k``: the already-resolved value
    from :func:`hybrid_k_arg`. 'hybrid' upgrades a None to 'auto'; 'halo'
    means the PURE halo path, so it clears hybrid_k (the default 'auto-tpu'
    would otherwise silently upgrade it to the hybrid-sharded operator)."""
    v = (cfg.sharding or "off").lower()
    if v in ("off", "none", ""):
        return {"hybrid_k": hybrid_k}
    from .parallel import make_mesh

    mesh = make_mesh(cfg.n_devices or None)
    if v == "allgather":
        return {"mesh": mesh, "hybrid_k": None}
    if v == "halo":
        return {"mesh": mesh, "halo": True, "hybrid_k": None}
    if v == "hybrid":
        return {"mesh": mesh, "halo": True, "hybrid_k": hybrid_k or "auto"}
    raise SystemExit(
        f"--train-sharding must be 'off', 'allgather', 'halo', or 'hybrid', "
        f"got {v!r}"
    )


def hybrid_fused_arg(cfg: TrainConfig):
    """TrainConfig.hybrid_fused ('auto' | 'on' | 'off') -> Trainer arg
    (None = backend default in ops/hybrid.build_hybrid_plan)."""
    v = (cfg.hybrid_fused or "auto").lower()
    if v in ("auto", "none", ""):
        return None
    if v in ("on", "true", "1", "yes"):
        return True
    if v in ("off", "false", "0", "no"):
        return False
    raise SystemExit(
        f"--train-hybrid-fused must be 'auto', 'on', or 'off', got {v!r}"
    )


def hybrid_f32_mode_arg(cfg: TrainConfig):
    """TrainConfig.hybrid_f32_mode ('default' | 'highest' | 'split2') ->
    Trainer arg (None = the RESID_F32_MODE module default)."""
    v = (cfg.hybrid_f32_mode or "default").lower()
    if v in ("default", "none", ""):
        return None
    if v in ("highest", "split2"):
        return v
    raise SystemExit(
        "--train-hybrid-f32-mode must be 'default', 'highest', or "
        f"'split2', got {v!r}"
    )


def make_model(cfg: ModelConfig, in_dim: int, out_dim: int):
    from .models import EGCN, GCN, MLP, JumpingKnowledgeNetwork

    if cfg.model == "gcn":
        return GCN(in_dim, out_dim, n_gcn=cfg.n_gcn, n_hidden_gcn=cfg.n_hidden, dropout=cfg.dropout)
    if cfg.model == "egcn":
        return EGCN(
            in_dim, out_dim, embedding_dim=cfg.embedding_dim,
            n_gcn=cfg.n_gcn, n_hidden_gcn=cfg.n_hidden, dropout=cfg.dropout,
        )
    if cfg.model == "jk":
        return JumpingKnowledgeNetwork(
            in_dim, out_dim, n_gcn=cfg.n_gcn, n_hidden_gcn=cfg.n_hidden, dropout=cfg.dropout
        )
    if cfg.model == "mlp":
        return MLP(in_dim, out_dim, cfg.mlp_hidden, dropout=cfg.dropout)
    raise ValueError(f"unknown model {cfg.model!r}")
