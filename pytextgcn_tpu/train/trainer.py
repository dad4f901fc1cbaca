"""Full-batch training engine.

Replaces the reference's copy-pasted per-script epoch loops (e.g.
flat_amazon.py:99-123) with a single jitted train step: forward, masked
cross-entropy, backward, Adam(amsgrad) update — one compiled program per
epoch, no host round-trips except scalar logging. The default optimizer is
``torch_amsgrad`` (train/optim.py), which reproduces the reference's
``th.optim.Adam(lr, amsgrad=True)`` (flat_amazon.py:89) update for update
— optax.amsgrad is a *different* AMSGrad variant whose systematically
smaller steps cost ~1 accuracy point at protocol scale (bisected in
experiments/bisect_offset.py, RESULTS.md). The reference's hierarchy and
hyperopt drivers use plain Adam instead (perlevel_amazon.py:84); pass
``optimizer="adam"`` for those protocols.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.graph import TextGraph
from ..ops.adjacency import NormAdj
from ..ops.features import NodeFeatures
from .metrics import accuracy, macro_f1, masked_cross_entropy


class Trainer:
    def __init__(
        self,
        model,
        lr: float = 0.05,
        seed: int = 0,
        optimizer=None,  # None | "adam" | "torch_amsgrad" | "optax_amsgrad" | optax transformation
        use_pallas: bool = False,
        mesh=None,
        step_cache: Optional[dict] = None,
        hybrid_k=None,
        hybrid_fused: Optional[bool] = None,
        hybrid_f32_mode: Optional[str] = None,
        pallas_dtype: str = "float32",
        halo: bool = False,
        tp_mesh=None,
        debug_checks: bool = False,
        masked_head: bool = False,
        plan_cache: Optional[str] = None,
    ):
        """``mesh``: a `jax.sharding.Mesh` with a 'graph' axis — training
        then runs with the aggregation edge-partitioned across the mesh
        (parallel/sharded.py); everything else is unchanged.

        ``step_cache``: share jitted train/eval steps across trainers whose
        models have the same ``config_key()`` (ensembles/cascades of
        same-shaped classifiers compile once instead of once per member)."""
        self.model = model
        self.lr = lr
        self.seed = seed
        from .optim import resolve_optimizer

        self.optimizer = resolve_optimizer(optimizer, lr)
        # identifies the update rule in the shared step cache: None and the
        # string names are cacheable by (name, lr); a custom transformation
        # only by object identity (two structurally-equal custom optimizers
        # never share)
        self._opt_desc = (
            ("torch_amsgrad", lr) if optimizer is None
            else (optimizer, lr) if isinstance(optimizer, str)
            else ("custom", id(optimizer))
        )
        self.use_pallas = use_pallas
        self.hybrid_k = hybrid_k  # dense-hot SpMM decomposition (ops/hybrid.py)
        self.hybrid_fused = hybrid_fused  # one-pass-over-D kernel (None = backend default)
        # residual f32 MXU strategy: 'highest' | 'split2' (None = module
        # default RESID_F32_MODE; see ops/spmm_pallas.py)
        self.hybrid_f32_mode = hybrid_f32_mode
        # compute dtype of the hybrid/Pallas aggregation ('bfloat16' is ~2x
        # faster on chip; params/optimizer/loss stay f32 — see RESULTS.md)
        self.pallas_dtype = pallas_dtype
        self.halo = halo  # with mesh: boundary-only exchange, sharded activations
        self.mesh = mesh
        # tensor parallelism (parallel/tensor.py): shard the wide EGCN
        # embedding (+ first contraction) over this mesh's 'model' axis
        self.tp_mesh = tp_mesh
        # checkify-instrumented train step (SURVEY.md §5 race-detection row):
        # NaN/Inf checks raise at the offending epoch instead of silently
        # training on garbage. Debug-only — every step synchronizes, and the
        # custom-VJP Pallas/hybrid paths are bypassed (checkify cannot
        # instrument pallas_call), so this forces the XLA segment aggregation
        self.debug_checks = debug_checks
        if debug_checks:
            self.use_pallas = False
            self.hybrid_k = None
            masked_head = False  # checkify cannot instrument pallas_call
        # masked-head training (ops/restricted.py): the final layer's
        # aggregation runs only over the train rows during fit() — the rows
        # the masked loss reads — cutting 2 of the step's 4 SpMMs to the
        # train-incident edge subset. Exact for models whose dropout sits on
        # hidden layers (GCN); EGCN's logit dropout draws a differently-
        # shaped mask, so its trajectory is statistically equivalent rather
        # than bit-equal. With a mesh the head rides the sharded restricted
        # operator (parallel/restricted_sharded.py): full [N, H] row-sharded
        # output, zero at non-train rows, so labels/masks stay unsliced.
        self.masked_head = masked_head
        # directory for persisted hybrid plans (ops/plan_cache.py): a fresh
        # process warm-loads the host-built plan instead of re-running the
        # 5-30 s construction (single-device aggregation path)
        self.plan_cache = plan_cache
        self.step_cache = step_cache
        self.params = None
        self.opt_state = None
        self._adj = None
        self._feats: Optional[NodeFeatures] = None

    # ------------------------------------------------------------ internals

    def _steps(self, n_classes: int):
        if self.step_cache is not None and hasattr(self.model, "config_key"):
            # debug_checks is part of the key: a checkified step synchronizes
            # every epoch and an unchecked one detects nothing — trainers
            # sharing a cache must never serve each other the wrong variant
            key = (self.model.config_key(), n_classes, self._opt_desc,
                   self.debug_checks, self.masked_head)
            if key not in self.step_cache:
                self.step_cache[key] = self._build_steps(n_classes)
            return self.step_cache[key]
        return self._build_steps(n_classes)

    def _build_steps(self, n_classes: int):
        model, opt = self.model, self.optimizer
        masked_head = self.masked_head

        @jax.jit
        def train_step(params, opt_state, base_key, epoch, adj, feats, y, mask,
                       adj_out=None):
            # rng derived in-graph (fold_in) from a device-resident epoch
            # counter that the step itself increments: zero per-epoch host
            # work — no eager splits, no scalar h2d — so the loop pipelines
            # at pure dispatch rate on remote TPU backends
            rng = jax.random.fold_in(base_key, epoch)

            def loss_fn(p):
                if masked_head:
                    # logits only at adj_out's rows (== the train rows);
                    # y/mask arrive pre-sliced to those rows by fit()
                    logits = model.apply(
                        p, adj, feats, train=True, rng=rng, adj_out=adj_out
                    )
                else:
                    logits = model.apply(p, adj, feats, train=True, rng=rng)
                return masked_cross_entropy(logits, y, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, epoch + 1, loss

        if self.debug_checks:
            from jax.experimental import checkify

            # checkify discharges through the jit wrapper; keep the checked
            # variant jitted so the debug mode stays usable on real graphs.
            # float_checks only: index_checks trips a checkify bug
            # instrumenting take_along_axis's gather (jax 0.8, "tuple index
            # out of range"), and all index ops here are validated host-side
            # at plan-build time anyway
            checked = checkify.checkify(train_step, errors=checkify.float_checks)

            def train_step(params, opt_state, base_key, epoch, adj, feats, y, mask):  # noqa: F811
                err, out = checked(
                    params, opt_state, base_key, epoch, adj, feats, y, mask
                )
                err.throw()  # synchronizes — debug mode only
                return out

        @jax.jit
        def eval_step(params, adj, feats, y, train_mask, val_mask):
            logits = model.apply(params, adj, feats, train=False)
            pred = jnp.argmax(logits, axis=-1)
            return {
                "val_loss": masked_cross_entropy(logits, y, val_mask),
                "val_f1": macro_f1(pred, y, val_mask, n_classes),
                "train_acc": accuracy(pred, y, train_mask),
            }

        return train_step, eval_step

    def prepare(self, g: TextGraph):
        """Finalize the graph into the operator + feature structures.

        The adjacency operator (normalization + Pallas tiling plans) is
        cached by edge-array identity: hierarchy pipelines swap labels and
        features via ``dataclasses.replace`` while the edges stay the same
        objects, and plan building is expensive host work. The cache holds
        strong references to the keyed arrays (``is`` comparison), so a
        recycled object address can never alias a freed graph's edges.
        Features are rebuilt each call (cheap; hierarchy_feats change)."""
        cached = (
            self._adj is not None
            and getattr(self, "_adj_edge_src", None) is g.edge_src
            and getattr(self, "_adj_edge_w", None) is g.edge_w
            and getattr(self, "_adj_n_nodes", None) == g.n_nodes
        )
        if not cached:
            if self.mesh is not None and self.halo:
                from ..parallel.halo import build_halo_adj

                self._adj = None
                if self.hybrid_k is not None:
                    from ..parallel.hybrid_sharded import build_hybrid_sharded_adj

                    # sharded hybrid: dense hot blocks on each shard's MXU,
                    # cold residual through the halo exchange (None when the
                    # cost model says the graph has no exploitable hot set)
                    self._adj = build_hybrid_sharded_adj(
                        g, self.mesh, hot_k=self.hybrid_k,
                        fused=self.hybrid_fused,
                        compute_dtype=self.pallas_dtype,
                    )
                if self._adj is None:
                    self._adj = build_halo_adj(g, self.mesh)
            elif self.mesh is not None:
                from ..parallel.sharded import build_sharded_adj

                self._adj = build_sharded_adj(
                    g, self.mesh, use_pallas=self.use_pallas,
                    pallas_dtype=self.pallas_dtype,
                )
            else:
                self._adj = NormAdj.from_graph(
                    g, use_pallas=self.use_pallas, hybrid_k=self.hybrid_k,
                    hybrid_fused=self.hybrid_fused,
                    pallas_dtype=self.pallas_dtype,
                    plan_cache=self.plan_cache,
                    hybrid_f32_mode=self.hybrid_f32_mode,
                )
            self._adj_edge_src = g.edge_src
            self._adj_edge_w = g.edge_w
            self._adj_n_nodes = g.n_nodes
        self._feats = NodeFeatures.from_graph(g)
        return self._adj, self._feats

    def share_adjacency(self, other: "Trainer") -> None:
        """Adopt another trainer's prepared adjacency operator.

        Hierarchy ensembles/cascades swap labels, masks and features via
        ``dataclasses.replace`` while the edge arrays stay the same objects;
        the normalized operator (+ hybrid/Pallas plans — expensive host and
        device work) is identical, so members can share one build instead of
        each re-running it. Only valid between trainers with the same
        aggregation settings; :meth:`prepare`'s edge-identity check still
        guards against a different graph."""
        if other._adj is None:
            return
        if (
            (self.use_pallas, self.hybrid_k, self.hybrid_fused, self.halo,
             self.pallas_dtype, self.hybrid_f32_mode, self.mesh) !=
            (other.use_pallas, other.hybrid_k, other.hybrid_fused, other.halo,
             other.pallas_dtype, other.hybrid_f32_mode, other.mesh)
        ):
            return
        self._adj = other._adj
        self._adj_edge_src = other._adj_edge_src
        self._adj_edge_w = other._adj_edge_w
        self._adj_n_nodes = other._adj_n_nodes

    def _prepare_restricted(self, g: TextGraph, rows: np.ndarray):
        """Build (and cache by edge/mask identity) the output-row-restricted
        head operator for masked-head training (ops/restricted.py)."""
        cached = (
            getattr(self, "_adj_out", None) is not None
            and getattr(self, "_adj_out_edge_src", None) is g.edge_src
            and getattr(self, "_adj_out_mask", None) is g.train_mask
        )
        if not cached:
            hk = self.hybrid_k
            if self.mesh is not None:
                from ..parallel.restricted_sharded import (
                    build_restricted_sharded_adj,
                )

                self._adj_out = build_restricted_sharded_adj(
                    g, rows, self.mesh,
                    hot_k="auto" if hk is not None else None,
                    compute_dtype=self.pallas_dtype,
                )
            else:
                from ..ops.restricted import build_restricted_adj

                self._adj_out = build_restricted_adj(
                    g, rows,
                    use_pallas=self.use_pallas or hk is not None,
                    hot_k="auto" if hk is not None else None,
                    compute_dtype=self.pallas_dtype,
                    resid_f32_mode=self.hybrid_f32_mode,
                )
            self._adj_out_edge_src = g.edge_src
            self._adj_out_mask = g.train_mask
        return self._adj_out

    def _init_state(self, init_key) -> None:
        """Make params/opt_state ready to train: init whatever is missing,
        and (re-)apply tensor-parallel shardings — params may have been set
        externally (restore(), per-label EP slicing) with the optimizer
        state absent or host-resident, so neither step can hide inside the
        ``params is None`` branch."""
        if self.params is None:
            self.params = self.model.init(init_key)
        if self.tp_mesh is not None:
            from ..parallel.tensor import apply_tp, apply_tp_state

            self.params = apply_tp(self.params, self.tp_mesh)
            if self.opt_state is not None:
                self.opt_state = apply_tp_state(
                    self.opt_state, self.params, self.tp_mesh
                )
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.params)

    # ------------------------------------------------------------------ api

    def fit(
        self,
        g: TextGraph,
        epochs: int = 500,
        n_classes: Optional[int] = None,
        verbose: int = 0,
        eval_every: int = 1,
        early_stopping: Optional[str] = None,  # None | 'reference' | 'val_f1'
        patience: int = 10,
        min_epochs: int = 30,
        log_fn: Callable[[str], None] = print,
        start_epoch: int = 0,
    ) -> List[Dict[str, float]]:
        """Train on the full graph; returns per-epoch history.

        ``early_stopping='reference'`` replicates flat_amazon.py:121-123
        (stop when the train loss 5 epochs ago beat the current one);
        ``'val_f1'`` is the patience scheme of MLP_flat.py:54,100-110.

        ``start_epoch``: resume point (use :meth:`restore`). The per-epoch
        RNG is ``fold_in(base_key, epoch)`` with a base key fixed at the
        start of the run and checkpointed, so a resumed run replays the
        exact RNG stream of an uninterrupted one.
        """
        if n_classes is None:
            n_classes = int(np.max(np.asarray(g.y))) + 1
        adj, feats = self.prepare(g)
        train_step, eval_step = self._steps(n_classes)
        # one-time host->device upload of labels/masks (the TextGraph itself
        # stays on host)
        y = jnp.asarray(g.y)
        train_mask = jnp.asarray(g.train_mask)
        val_mask = jnp.asarray(g.val_mask)
        # row-sharded runs keep activations at adj.n_pad rows end to end
        # (ops/spmm.pad_rows — kills the per-SpMM uneven-slice all-gather);
        # labels/masks pad to match, pads masked False so every loss/metric
        # term is identical to the unpadded computation
        n_pad = getattr(adj, "n_pad", None)
        if n_pad is not None and n_pad != g.n_nodes:
            extra = n_pad - g.n_nodes
            y = jnp.pad(y, (0, extra))
            train_mask = jnp.pad(train_mask, (0, extra))
            val_mask = jnp.pad(val_mask, (0, extra))
        adj_out = None
        if self.masked_head:
            rows = np.flatnonzero(np.asarray(g.train_mask))
            adj_out = self._prepare_restricted(g, rows)
            if self.mesh is None:
                # head restricted to the train rows; labels/mask pre-sliced
                # so the masked-CE sees exactly the same terms as the full
                # step ([M, C] logits)
                y_step = jnp.asarray(np.asarray(g.y)[rows])
                mask_step = jnp.ones(len(rows), bool)
            else:
                # sharded restricted head keeps the full [N, C] row-sharded
                # logit shape (zero at non-train rows) — the mask already
                # reads exactly the computed rows
                y_step, mask_step = y, train_mask
            step = lambda p, s, k, e: train_step(
                p, s, k, e, adj, feats, y_step, mask_step, adj_out
            )
        else:
            step = lambda p, s, k, e: train_step(
                p, s, k, e, adj, feats, y, train_mask
            )

        key = jax.random.PRNGKey(self.seed)
        key, init_key, base_key = jax.random.split(key, 3)
        self._init_state(init_key)
        if start_epoch == 0:
            # each fresh fit gets its own stream (hierarchy pipelines refit)
            self._fit_calls = getattr(self, "_fit_calls", 0) + 1
            self._base_key = jax.random.fold_in(base_key, self._fit_calls)
        elif getattr(self, "_base_key", None) is None:
            raise ValueError(
                "start_epoch > 0 requires a restored RNG state — call "
                "Trainer.restore(path) first"
            )
        base_key = self._base_key

        history: List[Dict[str, float]] = []
        f1_hist: List[float] = []  # val F1 at eval points (for 'val_f1' ES)
        width = len(str(epochs))
        t0 = time.time()
        epoch_dev = jnp.asarray(start_epoch, jnp.int32)
        for epoch in range(start_epoch, epochs):
            self.params, self.opt_state, epoch_dev, loss = step(
                self.params, self.opt_state, base_key, epoch_dev
            )
            # Fetching the loss scalar forces a device sync; on remote
            # (tunneled) TPU backends that round trip costs far more than
            # the step itself, so only materialize it when the reference
            # early-stopping rule needs per-epoch losses or at eval points.
            sync_now = (
                early_stopping == "reference"
                or (epoch + 1) % eval_every == 0
                or epoch == epochs - 1
            )
            rec = {"loss": float(loss) if sync_now else loss}
            if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
                m = eval_step(self.params, adj, feats, y, train_mask, val_mask)
                rec.update({k: float(v) for k, v in m.items()})
                if verbose > 0:
                    log_fn(
                        f"[{epoch + 1:{width}}] loss: {rec['loss']: .3f}, "
                        f"training accuracy: {rec['train_acc']: .3f}, "
                        f"val_f1: {rec['val_f1']: .3f}"
                    )
                if early_stopping == "val_f1":
                    # the reference MLP rule (MLP_flat.py:95-100): stop when
                    # each of the last `patience` F1s is <= the F1 from
                    # patience+1 evals ago (no best-params restore)
                    f1_hist.append(rec["val_f1"])
                    if epoch > min_epochs and len(f1_hist) > patience:
                        dec = sum(
                            f1_hist[-(i + 1)] <= f1_hist[-(patience + 1)]
                            for i in range(patience)
                        )
                        if dec >= patience:
                            if verbose > 0:
                                log_fn(
                                    f"Early stopping! Validation f1 decreased "
                                    f"for {dec} epochs!"
                                )
                            history.append(rec)
                            break
            history.append(rec)
            # ES windows live in the in-memory history: on a resumed run
            # (start_epoch > 0) they restart at the resume point, so the
            # first window's worth of post-resume epochs can't trigger a
            # stop that an uninterrupted run would have made.
            if (
                early_stopping == "reference"
                and epoch > 5
                and len(history) >= 5
                and history[-5]["loss"] < history[-1]["loss"]
            ):
                if verbose > 0:
                    log_fn("early stopping activated!")
                break
        if verbose > 0:
            log_fn(f"training took {time.time() - t0:.2f}s for {len(history)} epochs")
        # materialize any still-on-device loss scalars in one pass
        history = [
            {k: float(v) for k, v in rec.items()} for rec in jax.device_get(history)
        ]
        return history

    def fit_minibatch(
        self,
        g: TextGraph,
        epochs: int = 1,
        batch_size: int = 128,
        n_hops: Optional[int] = None,
        n_classes: Optional[int] = None,
        verbose: int = 0,
        log_fn: Callable[[str], None] = print,
    ) -> List[Dict[str, float]]:
        """Mini-batched training via n-hop neighborhood subgraphs
        (data/batching.py) — the workflow the reference's dead
        ``TextGCNBatcher`` stub was aiming for (batching.py:9-55).

        Each step trains on a re-indexed subgraph that reproduces the
        full-graph GCN outputs at the batch's document nodes exactly
        (globally-normalized edge weights; n_hops defaults to the model
        depth, which is sufficient fan-in). Subgraph shapes are padded to
        powers of two, so the jitted step compiles O(log) times, not once
        per batch. Returns per-epoch history with the mean batch loss."""
        from ..data.batching import NeighborhoodBatcher

        if n_classes is None:
            n_classes = int(np.max(np.asarray(g.y))) + 1
        if n_hops is None:
            n_hops = getattr(self.model, "n_gcn", 2)
        batcher = NeighborhoodBatcher(
            g, batch_size=batch_size, n_hops=n_hops, seed=self.seed
        )
        feats_full = NodeFeatures.from_graph(g)
        y_np = np.asarray(g.y)

        model, opt = self.model, self.optimizer

        @jax.jit
        def step(params, opt_state, base_key, i, adj, feats, y, mask):
            rng = jax.random.fold_in(base_key, i)

            def loss_fn(p):
                logits = model.apply(p, adj, feats, train=True, rng=rng)
                return masked_cross_entropy(logits, y, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        key = jax.random.PRNGKey(self.seed)
        key, init_key, base_key = jax.random.split(key, 3)
        self._init_state(init_key)
        self._fit_calls = getattr(self, "_fit_calls", 0) + 1
        self._base_key = base_key = jax.random.fold_in(base_key, self._fit_calls)

        history: List[Dict[str, float]] = []
        i = 0
        t0 = time.time()
        for epoch in range(epochs):
            losses = []
            for sub in batcher:
                adj = sub.to_adj()
                feats = feats_full.subgraph(sub.nodes)
                y_sub = jnp.asarray(y_np[np.maximum(sub.nodes, 0)])
                mask = np.zeros(len(sub.nodes), bool)
                mask[sub.batch_local[sub.batch_local >= 0]] = True
                self.params, self.opt_state, loss = step(
                    self.params, self.opt_state, base_key, i,
                    adj, feats, y_sub, jnp.asarray(mask),
                )
                losses.append(loss)
                i += 1
            mean_loss = float(np.mean(jax.device_get(losses)))
            history.append({"loss": mean_loss})
            if verbose > 0:
                log_fn(f"[{epoch + 1}] minibatch mean loss: {mean_loss: .4f}")
        if verbose > 0:
            log_fn(
                f"minibatch training took {time.time() - t0:.2f}s "
                f"({epochs} epochs x {len(batcher)} batches)"
            )
        return history

    def save(self, path: str, epoch: int) -> None:
        """Checkpoint params + opt state + RNG base key + epoch counter —
        everything :meth:`fit` needs to resume bit-exactly (the reference
        pickles whole modules with no optimizer/RNG state, flat_amazon.py:
        126-128; mid-training resume does not exist there)."""
        from .checkpoint import save_checkpoint

        base_key = getattr(self, "_base_key", None)
        save_checkpoint(
            path,
            self.params,
            self.opt_state,
            meta={
                "epoch": int(epoch),
                "seed": self.seed,
                "fit_calls": getattr(self, "_fit_calls", 0),
                "base_key": None
                if base_key is None
                else np.asarray(base_key, np.uint32).tolist(),
            },
        )

    def restore(self, path: str) -> int:
        """Load a checkpoint written by :meth:`save`; returns the epoch to
        pass to ``fit(..., start_epoch=...)``. Requires params/opt_state
        templates, which are created from the model if absent."""
        from .checkpoint import load_checkpoint, load_meta

        if self.params is None:
            self.params = self.model.init(jax.random.PRNGKey(0))
        if self.opt_state is None:
            # params may have been set externally (EP slicing, warm starts)
            # with no optimizer state; the template must still exist or the
            # checkpointed opt state would be silently dropped
            self.opt_state = self.optimizer.init(self.params)
        self.params, self.opt_state = load_checkpoint(path, self.params, self.opt_state)
        meta = load_meta(path)
        self._fit_calls = int(meta.get("fit_calls", 0))
        bk = meta.get("base_key")
        self._base_key = (
            None if bk is None else jnp.asarray(np.asarray(bk, np.uint32))
        )
        return int(meta.get("epoch", 0))

    def predict_logits(self, g: Optional[TextGraph] = None) -> jax.Array:
        """Logits for all nodes (no dropout)."""
        adj, feats = (self._adj, self._feats) if g is None else self.prepare(g)
        if not hasattr(self, "_predict_jit"):
            if self.step_cache is not None and hasattr(self.model, "config_key"):
                key = ("predict", self.model.config_key())
                if key not in self.step_cache:
                    self.step_cache[key] = jax.jit(partial(self.model.apply, train=False))
                self._predict_jit = self.step_cache[key]
            else:
                self._predict_jit = jax.jit(partial(self.model.apply, train=False))
        logits = self._predict_jit(self.params, adj, feats)
        # row-sharded applies return padded rows (ops/spmm.pad_rows)
        n = getattr(adj, "n_nodes", logits.shape[0])
        return logits[:n]

    def evaluate(self, g: TextGraph, mask=None, n_classes: Optional[int] = None):
        """Test metrics over ``mask`` (default: the graph's test_mask)."""
        if n_classes is None:
            n_classes = int(np.max(np.asarray(g.y))) + 1
        mask = jnp.asarray(g.test_mask if mask is None else mask)
        y = jnp.asarray(g.y)
        logits = self.predict_logits(g)
        pred = jnp.argmax(logits, axis=-1)
        return {
            "accuracy": float(accuracy(pred, y, mask)),
            "f1_macro": float(macro_f1(pred, y, mask, n_classes)),
        }
