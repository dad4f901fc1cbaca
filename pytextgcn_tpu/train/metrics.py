"""On-device classification metrics.

The reference round-trips logits to the CPU every epoch for sklearn metrics
(flat_amazon.py:111-116 — a device->host sync in the hot loop). Here
accuracy, confusion matrix and macro-F1 are computed on device with static
shapes (confusion via one-hot scatter-add); only final scalars ever leave
the chip. ``macro_f1`` reproduces sklearn's ``f1_score(average='macro')``
label semantics: classes are averaged iff they appear in y_true or y_pred
(within the mask), F1 of a 0/0 class is 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_cross_entropy(logits, y, mask):
    """Mean cross-entropy over masked nodes (torch CrossEntropyLoss with
    reduction='mean' over ``logits[mask]``, flat_amazon.py:82,101-102)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, y[:, None].astype(jnp.int32), axis=-1)[:, 0]
    m = mask.astype(logits.dtype)
    return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)


def accuracy(pred, y, mask):
    m = mask.astype(jnp.float32)
    return jnp.sum((pred == y).astype(jnp.float32) * m) / jnp.maximum(jnp.sum(m), 1.0)


def confusion_matrix(pred, y, mask, n_classes: int):
    """[n_classes, n_classes] counts, rows = true, cols = predicted."""
    idx = y.astype(jnp.int32) * n_classes + pred.astype(jnp.int32)
    flat = jax.ops.segment_sum(
        mask.astype(jnp.int32), idx, num_segments=n_classes * n_classes
    )
    return flat.reshape(n_classes, n_classes)


def macro_f1(pred, y, mask, n_classes: int):
    cm = confusion_matrix(pred, y, mask, n_classes).astype(jnp.float32)
    tp = jnp.diagonal(cm)
    support = cm.sum(axis=1)  # true counts per class
    predicted = cm.sum(axis=0)  # predicted counts per class
    f1 = 2 * tp / jnp.maximum(support + predicted, 1.0)
    present = (support > 0) | (predicted > 0)  # sklearn label union
    return jnp.sum(f1 * present) / jnp.maximum(jnp.sum(present), 1.0)
