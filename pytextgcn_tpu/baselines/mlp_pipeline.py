"""TF-IDF + MLP baselines: flat, per-level cascade, per-label ensemble.

Re-design of the reference's MLP_flat.py / MLP_level.py / MLP_label.py +
mlp_helper.py. Semantics kept:

* features: TfidfVectorizer-equivalent fit on the *train* split only
  (sklearn 'english' stopword list, max_df=0.9 — mlp_helper.py:38,88),
  val/test transformed with the fitted vocabulary/idf,
* full-batch training, Adam, mean CE, SELU+dropout MLP [256, 128],
* early stopping: patience on val macro-F1 (MLP_flat.py:95-100: stop when
  the last ``patience`` F1s are all <= the F1 ``patience+1`` epochs ago),
* per-level: one-hot of the previous level appended to the sparse features —
  ground truth for train/val, *predictions* for test (MLP_level.py:112-119),
* per-label: one child model per parent class, test docs routed by the
  previous level's *predicted* labels (MLP_label.py:158-162 — unlike the
  GCN per-label eval, which routes by ground truth).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import sparse as sp

from ..build.stopwords import get_stopwords
from ..build.vectorizer import CountVectorizer, TfidfTransform
from ..models.mlp import MLP, SparseMatrix
from ..train.metrics import accuracy, macro_f1, masked_cross_entropy


@dataclasses.dataclass
class MlpSplits:
    x_train: sp.csr_matrix
    x_val: sp.csr_matrix
    x_test: sp.csr_matrix
    y_train: List[np.ndarray]
    y_val: List[np.ndarray]
    y_test: List[np.ndarray]


def fit_tfidf_splits(
    train_docs: Sequence[str],
    val_docs: Sequence[str],
    test_docs: Sequence[str],
    y_train: Sequence[Sequence[int]],
    y_val: Sequence[Sequence[int]],
    y_test: Sequence[Sequence[int]],
    max_df: float = 0.9,
) -> MlpSplits:
    """TF-IDF features fit on train only (mlp_helper.py:38-42)."""
    cv = CountVectorizer(min_df=1, max_df=max_df, stop_words=get_stopwords("sklearn"))
    c_train = cv.fit_transform(list(train_docs))
    tf = TfidfTransform()
    x_train = tf.fit_transform(c_train)
    x_val = tf.transform(cv.transform(list(val_docs)))
    x_test = tf.transform(cv.transform(list(test_docs)))
    return MlpSplits(
        x_train,
        x_val,
        x_test,
        [np.asarray(y) for y in y_train],
        [np.asarray(y) for y in y_val],
        [np.asarray(y) for y in y_test],
    )


def append_onehot_feats(x: sp.csr_matrix, labels: np.ndarray, n_classes: int):
    """hstack a one-hot label block onto sparse features (the reference's
    ``append_feats``, mlp_helper.py:141-151)."""
    labels = np.asarray(labels, np.int64)
    oh = sp.csr_matrix(
        (np.ones(len(labels), np.float64), (np.arange(len(labels)), labels)),
        shape=(len(labels), n_classes),
    )
    return sp.hstack([x, oh]).tocsr()


def _make_dp_step(model, opt, mesh, x_train: sp.csr_matrix, y_train):
    """Doc-sharded data-parallel MLP step (SURVEY.md §2.4 DP row).

    Host-side partition: CSR rows are split into ``D`` equal row blocks
    (padded with empty rows), each shard's COO padded to a uniform nnz.
    Device ``d`` backprops the CE *sum* over its rows; gradients and counts
    are ``psum``-ed over the mesh axis, so the update equals the replicated
    full-batch gradient exactly (modulo summation order).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharded import put_global

    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    x = x_train.tocsr()
    y = np.asarray(y_train, np.int32)
    n, f = x.shape
    b = -(-n // d)  # rows per shard

    rows, cols, datas, ys, masks, e_max = [], [], [], [], [], 1
    for i in range(d):
        lo, hi = i * b, min((i + 1) * b, n)
        block = x[lo:hi].tocoo()
        rows.append(block.row.astype(np.int32))
        cols.append(block.col.astype(np.int32))
        datas.append(block.data.astype(np.float32))
        y_i = np.zeros(b, np.int32)
        m_i = np.zeros(b, bool)
        y_i[: hi - lo] = y[lo:hi]
        m_i[: hi - lo] = True
        ys.append(y_i)
        masks.append(m_i)
        e_max = max(e_max, len(block.data))
    pad = lambda a, fill: np.stack(
        [np.concatenate([v, np.full(e_max - len(v), fill, v.dtype)]) for v in a]
    )
    shard = lambda a: put_global(mesh, P(axis), a)
    train_in = (
        shard(pad(rows, 0)),
        shard(pad(cols, 0)),
        shard(pad(datas, 0.0)),
        shard(np.stack(ys)),
        shard(np.stack(masks)),
    )

    def step(params, opt_state, rng, train_in):
        def local(params, row, col, data, y, mask):
            xs = SparseMatrix(row[0], col[0], data[0], (b, f))
            # decorrelate per-shard dropout masks
            key = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def loss_sum(p):
                logits = model.apply(p, xs, train=True, rng=key)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, y[0][:, None], axis=-1)[:, 0]
                m = mask[0].astype(logits.dtype)
                return jnp.sum(nll * m), jnp.sum(m)

            (s, cnt), grads = jax.value_and_grad(loss_sum, has_aux=True)(params)
            s = jax.lax.psum(s, axis)
            cnt = jax.lax.psum(cnt, axis)
            grads = jax.lax.psum(grads, axis)
            denom = jnp.maximum(cnt, 1.0)
            return jax.tree.map(lambda g_: g_ / denom, grads), s / denom

        from jax.sharding import PartitionSpec as P

        grads, loss = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, *train_in)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_in, step


def train_mlp(
    x_train: sp.csr_matrix,
    y_train: np.ndarray,
    x_val: sp.csr_matrix,
    y_val: np.ndarray,
    n_classes: int,
    hidden: Sequence[int] = (256, 128),
    lr: float = 2e-3,
    dropout: float = 0.5,
    epochs: int = 500,
    seed: int = 44,
    early_stopping: bool = True,
    patience: int = 10,
    min_epochs: int = 30,
    verbose: int = 0,
    use_pallas: bool = False,
    mesh=None,
):
    """Full-batch MLP training; returns (model, params, history).

    The whole epoch loop — step, on-device val macro-F1, and the reference's
    patience early-stopping rule (MLP_flat.py:95-100) — runs inside ONE
    jitted ``lax.while_loop``: zero per-epoch host round-trips (on tunneled
    TPU backends a per-epoch scalar fetch costs more than the step itself;
    cf. train/trainer.py). ``verbose>0`` falls back to a python loop with
    the identical fold_in RNG stream, so both paths produce the same run.

    ``mesh``: a 1D `jax.sharding.Mesh` — training then runs **data
    parallel**: train documents (CSR rows) are sharded over the mesh axis,
    each device backprops its shard's CE *sum*, gradients are ``psum``-ed
    and normalized by the global count — exactly the replicated full-batch
    gradient (SURVEY.md §2.4 DP row; equality pinned in
    test_mlp_dp.py, dropout off). Per-shard dropout masks are decorrelated
    by folding the device index into the epoch key.
    """
    xs_va = SparseMatrix.from_scipy(x_val, use_pallas=use_pallas)
    y_va = jnp.asarray(np.asarray(y_val, np.int32))
    mask_va = jnp.ones(y_va.shape[0], bool)

    model = MLP(x_train.shape[1], n_classes, list(hidden), dropout=dropout)
    key = jax.random.PRNGKey(seed)
    base_key, ik = jax.random.split(key)
    params = model.init(ik)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    # data rides as jit arguments — closed-over arrays would embed as
    # program constants (remote-compile request bodies have a size limit)
    if mesh is None:
        xs_tr = SparseMatrix.from_scipy(x_train, use_pallas=use_pallas)
        y_tr = jnp.asarray(np.asarray(y_train, np.int32))
        train_in = (xs_tr, y_tr, jnp.ones(y_tr.shape[0], bool))

        def step(params, opt_state, rng, train_in):
            xs, y, mask = train_in

            def loss_fn(p):
                logits = model.apply(p, xs, train=True, rng=rng)
                return masked_cross_entropy(logits, y, mask)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

    else:
        train_in, step = _make_dp_step(model, opt, mesh, x_train, y_train)

    def val_f1(params, xs, y, mask):
        logits = model.apply(params, xs, train=False)
        return macro_f1(jnp.argmax(logits, axis=-1), y, mask, n_classes)

    if verbose == 0:
        @jax.jit
        def run(params, opt_state, base_key, train_in, xs_va, y_va, mask_va):
            def body(carry):
                p, o, e, stop, loss_buf, f1_buf = carry
                rng = jax.random.fold_in(base_key, e)
                p, o, loss = step(p, o, rng, train_in)
                f1 = val_f1(p, xs_va, y_va, mask_va)
                loss_buf = loss_buf.at[e].set(loss)
                f1_buf = f1_buf.at[e].set(f1)
                if early_stopping:
                    # last `patience` F1s all <= the F1 `patience+1` evals ago
                    win = jax.lax.dynamic_slice(
                        f1_buf, (jnp.maximum(e - patience, 0),), (patience + 1,)
                    )
                    dec = jnp.sum(win[1:] <= win[0])
                    stop = (e > min_epochs) & (e >= patience) & (dec >= patience)
                return p, o, e + 1, stop, loss_buf, f1_buf

            # buffers sized for the ES window even on short runs, so the
            # (patience+1)-wide dynamic_slice is always in bounds; the
            # e >= patience gate keeps the padding out of any decision
            buf_len = max(epochs, patience + 1)
            init = (
                params,
                opt_state,
                jnp.zeros((), jnp.int32),
                jnp.zeros((), bool),
                jnp.zeros(buf_len, jnp.float32),
                jnp.zeros(buf_len, jnp.float32),
            )
            return jax.lax.while_loop(
                lambda c: (c[2] < epochs) & ~c[3], body, init
            )

        params, opt_state, n_run, _, loss_buf, f1_buf = run(
            params, opt_state, base_key, train_in, xs_va, y_va, mask_va
        )
        n_run = int(n_run)  # the single host sync of the whole training run
        losses, f1s = np.asarray(loss_buf[:n_run]), np.asarray(f1_buf[:n_run])
        history = list(zip(losses.tolist(), f1s.tolist()))
        return model, params, history

    step_j = jax.jit(step)
    val_j = jax.jit(val_f1)
    history = []
    for epoch in range(epochs):
        rng = jax.random.fold_in(base_key, epoch)
        params, opt_state, loss = step_j(params, opt_state, rng, train_in)
        f1v = float(val_j(params, xs_va, y_va, mask_va))
        history.append((float(loss), f1v))
        print(f"[{epoch + 1}] loss: {history[-1][0]: .3f}, val_f1: {f1v: .3f}")
        if early_stopping and epoch > min_epochs and epoch >= patience:
            dec = sum(
                history[-(i + 1)][1] <= history[-(patience + 1)][1]
                for i in range(patience)
            )
            if dec >= patience:
                print(f"Early stopping! Validation f1 decreased for {dec} epochs!")
                break
    return model, params, history


def _predict(model, params, x: sp.csr_matrix, use_pallas: bool = False) -> np.ndarray:
    xs = SparseMatrix.from_scipy(x, use_pallas=use_pallas)
    logits = jax.jit(lambda p, v: model.apply(p, v, train=False))(params, xs)
    return np.asarray(jnp.argmax(logits, axis=-1))


def _test_metrics(pred: np.ndarray, y: np.ndarray) -> dict:
    n = int(max(pred.max(initial=0), y.max(initial=0))) + 1
    m = jnp.ones(len(y), bool)
    return {
        "accuracy": float(accuracy(jnp.asarray(pred), jnp.asarray(y), m)),
        "f1_macro": float(macro_f1(jnp.asarray(pred), jnp.asarray(y), m, n)),
    }


def mlp_flat(splits: MlpSplits, level: int, **train_kwargs) -> dict:
    """Flat MLP on one label level (MLP_flat.py)."""
    n_classes = int(np.max(splits.y_train[level])) + 1
    model, params, hist = train_mlp(
        splits.x_train,
        splits.y_train[level],
        splits.x_val,
        splits.y_val[level],
        n_classes,
        **train_kwargs,
    )
    pred = _predict(model, params, splits.x_test, train_kwargs.get("use_pallas", False))
    out = _test_metrics(pred, splits.y_test[level])
    out.update({"model": model, "params": params, "history": hist, "pred": pred})
    return out


def mlp_per_level(splits: MlpSplits, **train_kwargs) -> List[dict]:
    """Per-level cascade over all levels (MLP_level.py): GT one-hot appended
    for train/val, predicted one-hot for test."""
    results = [mlp_flat(splits, 0, **train_kwargs)]
    x_train, x_val, x_test = splits.x_train, splits.x_val, splits.x_test
    y_pred = results[0]["pred"]
    for cat in range(len(splits.y_train) - 1):
        n_prev = int(
            max(splits.y_train[cat].max(), splits.y_val[cat].max(), splits.y_test[cat].max())
        ) + 1
        x_train = append_onehot_feats(x_train, splits.y_train[cat], n_prev)
        x_val = append_onehot_feats(x_val, splits.y_val[cat], n_prev)
        x_test = append_onehot_feats(x_test, y_pred, n_prev)
        n_classes = int(np.max(splits.y_train[cat + 1])) + 1
        model, params, hist = train_mlp(
            x_train,
            splits.y_train[cat + 1],
            x_val,
            splits.y_val[cat + 1],
            n_classes,
            **train_kwargs,
        )
        pred = _predict(model, params, x_test, train_kwargs.get("use_pallas", False))
        res = _test_metrics(pred, splits.y_test[cat + 1])
        res.update({"model": model, "params": params, "history": hist, "pred": pred})
        results.append(res)
        y_pred = pred
    return results


def mlp_per_label(splits: MlpSplits, **train_kwargs) -> List[dict]:
    """Per-label ensemble over level transitions (MLP_label.py): filter rows
    by parent class, relabel children contiguously, route test docs by the
    previous level's predictions."""
    results = [mlp_flat(splits, 0, **train_kwargs)]
    y_pred = results[0]["pred"]
    for cat in range(len(splits.y_train) - 1):
        y_tr_c, y_va_c, y_te_c = (
            splits.y_train[cat + 1],
            splits.y_val[cat + 1],
            splits.y_test[cat + 1],
        )
        predictions = np.zeros_like(y_te_c)
        for label in np.unique(splits.y_train[cat]):
            tr_mask = splits.y_train[cat] == label
            va_mask = splits.y_val[cat] == label
            classes = np.unique(y_tr_c[tr_mask])
            local = np.searchsorted(classes, y_tr_c)
            local_val = np.searchsorted(classes, y_va_c)
            model, params, _ = train_mlp(
                splits.x_train[tr_mask],
                local[tr_mask],
                splits.x_val[va_mask],
                local_val[va_mask],
                len(classes),
                **train_kwargs,
            )
            te_mask = y_pred == label
            if te_mask.any():
                pred_local = _predict(
                    model, params, splits.x_test[te_mask],
                    train_kwargs.get("use_pallas", False),
                )
                predictions[te_mask] = classes[pred_local]
        res = _test_metrics(predictions, y_te_c)
        res["pred"] = predictions
        results.append(res)
        y_pred = predictions
    return results
