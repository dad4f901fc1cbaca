"""Bisect the systematic torch-over-JAX accuracy offset (VERDICT r2 Weak #1).

Round-2 protocol tables showed torch beating the JAX mean on every amazon
comparison by ~1-1.5 points with the same sign in 6/6 rows. Forward parity
with shared params is proven (tests/test_torch_parity.py), so the offset
must live in (a) init sampling, (b) dropout-mask statistics, or (c)
optimizer numerics. This driver isolates them with a controlled ladder on
one shared graph:

  Stage A  shared torch init, dropout=0, torch Adam(amsgrad) vs the JAX
           torch-exact rule (train/optim.py::torch_amsgrad). Deterministic
           forward/backward -> the parameter trajectories must track to
           float noise. Pins (a) and (b) out of the loop entirely.
  Stage B  identical, but the JAX side runs optax.amsgrad (the round-1/2
           default). Any systematic divergence here is purely the
           optimizer-variant difference: optax maxes the bias-CORRECTED
           second moment, torch maxes the uncorrected one and re-corrects
           each step (see train/optim.py docstring).
  Stage C  the full protocol (dropout on, protocol epochs) from the same
           shared init: torch vs JAX(torch_amsgrad) vs JAX(optax.amsgrad)
           test accuracy. If B diverges and C's torch_amsgrad column
           matches torch while optax trails, the offset is isolated to the
           optimizer op — and torch_amsgrad becomes the parity default.

    python experiments/bisect_offset.py --protocol amazon --n-docs 8000

Emits one JSON line per stage; exercised end-to-end by
tests/test_bisect_offset.py at toy scale.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import optax

from protocol_parity import PROTOCOLS, build_graph, remask
from pytextgcn_tpu.models import GCN
from pytextgcn_tpu.ops.adjacency import NormAdj
from pytextgcn_tpu.ops.features import NodeFeatures
from pytextgcn_tpu.train.metrics import masked_cross_entropy
from pytextgcn_tpu.train.optim import torch_amsgrad


def _tree_diff(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    mx = max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
             for x, y in zip(la, lb))
    num = sum(float(np.sum((np.asarray(x) - np.asarray(y)) ** 2))
              for x, y in zip(la, lb))
    den = sum(x.size for x in la)
    return mx, float(np.sqrt(num / den))


def _make_model(name, in_dim, n_classes, n_hidden, dropout):
    if name == "egcn":
        from pytextgcn_tpu.models import EGCN

        return EGCN(in_dim, n_classes, embedding_dim=2000,
                    n_hidden_gcn=n_hidden, dropout=dropout)
    if name == "jk":
        from pytextgcn_tpu.models import JumpingKnowledgeNetwork

        return JumpingKnowledgeNetwork(in_dim, n_classes,
                                       n_hidden_gcn=n_hidden, dropout=dropout)
    return GCN(in_dim, n_classes, n_hidden_gcn=n_hidden, dropout=dropout)


def jax_trajectory(g, init_params, n_classes, *, epochs, lr, optimizer,
                   dropout, n_hidden, seed, snapshot_epochs, model_name="gcn"):
    """Train the JAX model from ``init_params``; return snapshots + metrics.

    dropout=0 runs the deterministic forward (`train=False` — identical
    math when no dropout exists, and rng-free); dropout>0 mirrors
    Trainer.fit's rng discipline (fold_in per epoch). ``model_name``
    extends the ladder to EGCN and JK (VERDICT r3 items 4/7: GCN-only
    trajectory pins left those families forward-only).
    """
    model = _make_model(model_name, g.in_dim, n_classes, n_hidden, dropout)
    adj = NormAdj.from_graph(g)
    feats = NodeFeatures.from_graph(g)
    y = jnp.asarray(np.asarray(g.y))
    mask = jnp.asarray(np.asarray(g.train_mask))
    tx = torch_amsgrad(lr) if optimizer == "torch" else optax.amsgrad(lr)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a, np.float32)),
                          init_params)
    state = tx.init(params)
    base_key = jax.random.PRNGKey(seed)

    @jax.jit
    def step(params, state, epoch):
        rng = jax.random.fold_in(base_key, epoch)

        def loss_fn(p):
            if dropout == 0.0:
                logits = model.apply(p, adj, feats, train=False)
            else:
                logits = model.apply(p, adj, feats, train=True, rng=rng)
            return masked_cross_entropy(logits, y, mask)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state2 = tx.update(grads, state, params)
        return optax.apply_updates(params, upd), state2, loss

    snapshots = {}
    want = {int(e) for e in snapshot_epochs}
    for epoch in range(epochs):
        params, state, loss = step(params, state, jnp.asarray(epoch, jnp.int32))
        if (epoch + 1) in want:
            snapshots[epoch + 1] = jax.device_get(params)

    logits = jax.jit(lambda p: model.apply(p, adj, feats, train=False))(params)
    pred = np.asarray(jnp.argmax(logits, -1))
    test = np.asarray(g.test_mask)
    from sklearn.metrics import accuracy_score, f1_score

    yt = np.asarray(g.y)[test]
    return snapshots, {
        "accuracy": float(accuracy_score(yt, pred[test])),
        "f1_macro": float(f1_score(yt, pred[test], average="macro")),
        "final_loss": float(loss),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--protocol", choices=list(PROTOCOLS), default="amazon")
    ap.add_argument("--model", choices=["gcn", "egcn", "jk"], default="gcn",
                    help="run the ladder for any model family (VERDICT r3 "
                    "item 4: EGCN's trajectory was never pinned the way "
                    "GCN's was; item 7 extends the pin to JK)")
    ap.add_argument("--n-docs", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--epochs", type=int, default=0,
                    help="stage A/B trajectory epochs (0 = 100)")
    ap.add_argument("--protocol-epochs", type=int, default=0,
                    help="stage C epochs (0 = the protocol's value)")
    ap.add_argument("--skip-c", action="store_true")
    ap.add_argument("--verbose", type=int, default=0)
    args = ap.parse_args(argv)

    p = dict(PROTOCOLS[args.protocol])
    traj_epochs = args.epochs or 100
    snap = [e for e in (1, 2, 3, 5, 10, 20, 50, 100, 200) if e <= traj_epochs]

    g, level_labels, n_train, n_val = build_graph(
        args.protocol, args.n_docs, args.verbose
    )
    gs = remask(g, args.protocol, n_train, n_val, args.seed)
    n_classes = int(np.max(np.asarray(gs.y))) + 1

    from torch_reference import train_torch_reference

    # ---- torch run, dropout=0, exporting its init + trajectory snapshots
    t0 = time.time()
    res_t = train_torch_reference(
        gs, n_classes, epochs=traj_epochs, lr=p["lr"], dropout=0.0,
        n_hidden=p["n_hidden"], seed=args.seed, return_init=True,
        snapshot_epochs=snap, model=args.model,
    )
    init = res_t["init"]

    out = {}
    for stage, opt_name in (("A", "torch"), ("B", "optax")):
        snaps, metrics = jax_trajectory(
            gs, init, n_classes, epochs=traj_epochs, lr=p["lr"],
            optimizer=opt_name, dropout=0.0, n_hidden=p["n_hidden"],
            seed=args.seed, snapshot_epochs=snap, model_name=args.model,
        )
        diffs = {}
        for e in snap:
            mx, rms = _tree_diff(snaps[e], res_t["snapshots"][e])
            diffs[e] = {"max_abs": mx, "rms": rms}
        rec = {
            "stage": stage, "model": args.model,
            "jax_optimizer": opt_name, "dropout": 0.0,
            "trajectory_diff_vs_torch": diffs,
            "jax": metrics,
            "torch": {"accuracy": res_t["accuracy"],
                      "f1_macro": res_t["f1_macro"]},
        }
        out[stage] = rec
        print(json.dumps(rec), flush=True)

    if not args.skip_c:
        proto_epochs = args.protocol_epochs or p["epochs"]
        res_tc = train_torch_reference(
            gs, n_classes, epochs=proto_epochs, lr=p["lr"],
            dropout=p["dropout"], n_hidden=p["n_hidden"], seed=args.seed,
            init_params=init, model=args.model,
        )
        rec = {"stage": "C", "model": args.model,
               "dropout": p["dropout"], "epochs": proto_epochs,
               "shared_init": "torch", "torch": {
                   "accuracy": res_tc["accuracy"],
                   "f1_macro": res_tc["f1_macro"]}}
        for opt_name in ("torch", "optax"):
            _, metrics = jax_trajectory(
                gs, init, n_classes, epochs=proto_epochs, lr=p["lr"],
                optimizer=opt_name, dropout=p["dropout"],
                n_hidden=p["n_hidden"], seed=args.seed, snapshot_epochs=[],
                model_name=args.model,
            )
            rec[f"jax_{opt_name}_amsgrad"] = metrics
        out["C"] = rec
        print(json.dumps(rec), flush=True)
    print(f"[bisect] total {time.time() - t0:.0f}s", file=sys.stderr)
    return out


if __name__ == "__main__":
    main()
