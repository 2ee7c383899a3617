"""Pure-JAX metrics and losses (jit-safe, masked for padding).

Replaces the reference's sklearn calls (reference: models/ppi_gat.py:38,
models/pattern_gat.py:77-83) and torch loss modules with on-device math —
validated against sklearn/torch in tests/test_metrics.py. All functions
take a node mask so padded nodes never contribute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_accuracy(logits: jnp.ndarray, labels: jnp.ndarray,
                    mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of correctly argmax-classified nodes within `mask`
    (reference: planetoid_gat.py:36-40,47-51)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels) & mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)


def micro_f1(logits: jnp.ndarray, labels: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
    """Micro-averaged F1 with pred = logits > 0 (reference: ppi_gat.py:38 —
    sklearn f1_score(average='micro')). labels: (N, C) multi-hot."""
    pred = (logits > 0) & mask[:, None]
    true = (labels > 0.5) & mask[:, None]
    tp = jnp.sum(pred & true)
    fp = jnp.sum(pred & ~true)
    fn = jnp.sum(~pred & true)
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)


def balanced_accuracy_predweighted(logits: jnp.ndarray, labels: jnp.ndarray,
                                   mask: jnp.ndarray,
                                   prop_pos: float) -> jnp.ndarray:
    """The reference's PATTERN metric (pattern_gat.py:77-83): sklearn
    balanced_accuracy_score with sample weights keyed on the *predicted*
    class — w = 1/p if pred==1 else 1/(1-p) — an idiosyncrasy we preserve
    (weighting by prediction rather than ground truth is the reference's
    own comment-vs-code mismatch, documented in SURVEY.md §5.5).

    balanced_accuracy = mean over true classes c of weighted recall:
        recall_c = sum(w * [y==c][pred==c]) / sum(w * [y==c])
    """
    pred = (logits > 0).astype(jnp.float32)
    y = labels.astype(jnp.float32)
    m = mask.astype(jnp.float32)
    w = (1.0 / prop_pos) * pred + (1.0 / (1.0 - prop_pos)) * (1.0 - pred)
    w = w * m

    def weighted_recall(cls):
        in_cls = jnp.where(y == cls, w, 0.0)
        hit = jnp.where((y == cls) & (pred == cls), w, 0.0)
        denom = jnp.sum(in_cls)
        return jnp.sum(hit) / jnp.maximum(denom, 1e-12), denom

    r0, d0 = weighted_recall(0.0)
    r1, d1 = weighted_recall(1.0)
    # sklearn averages over classes present in y_true
    present = (d0 > 0).astype(jnp.float32) + (d1 > 0).astype(jnp.float32)
    return (r0 * (d0 > 0) + r1 * (d1 > 0)) / jnp.maximum(present, 1.0)


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over masked nodes (reference: planetoid_gat.py:27 —
    torch.nn.CrossEntropyLoss(reduction='mean') on mask-indexed rows)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                               axis=-1)[:, 0]
    nll = jnp.where(mask, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(mask), 1)


def masked_bce_with_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                           mask: jnp.ndarray,
                           pos_weight: float = 1.0) -> jnp.ndarray:
    """Mean BCE-with-logits over masked rows; `pos_weight` scales the
    positive term (reference: pattern_gat.py:11-15 with pos_weight
    1/0.1765; ppi_gat.py:11 with 1.0). Numerically-stable log-sigmoid
    form, matching torch BCEWithLogitsLoss."""
    y = labels.astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * y * log_sig + (1.0 - y) * log_one_minus)
    if per.ndim == 2 and mask.ndim == 1:
        per = per * mask[:, None]
        count = jnp.sum(mask) * per.shape[1]
    else:
        per = per * mask
        count = jnp.sum(mask)
    return jnp.sum(per) / jnp.maximum(count, 1)
