"""Metrics/losses validated against sklearn and torch (the reference's
metric providers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gat_pytorch_tpu.train import metrics as M


def test_masked_accuracy():
    logits = jnp.array([[2.0, 0.0], [0.0, 2.0], [2.0, 0.0], [9.0, 0.0]])
    labels = jnp.array([0, 1, 1, 0])
    mask = jnp.array([True, True, True, False])  # last node is padding
    assert float(M.masked_accuracy(logits, labels, mask)) == pytest.approx(
        2 / 3)


def test_micro_f1_matches_sklearn():
    from sklearn.metrics import f1_score
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((50, 7)).astype(np.float32)
    labels = (rng.random((50, 7)) < 0.3).astype(np.float32)
    mask = np.ones(50, bool)
    got = float(M.micro_f1(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.asarray(mask)))
    want = f1_score(y_pred=logits > 0, y_true=labels, average="micro")
    assert got == pytest.approx(want, rel=1e-6)


def test_micro_f1_ignores_padding():
    logits = np.full((4, 2), 5.0, np.float32)
    labels = np.array([[1, 1], [1, 1], [0, 0], [0, 0]], np.float32)
    mask = np.array([True, True, False, False])
    got = float(M.micro_f1(jnp.asarray(logits), jnp.asarray(labels),
                           jnp.asarray(mask)))
    assert got == pytest.approx(1.0)


def test_balanced_acc_matches_sklearn_reference_quirk():
    """Match sklearn balanced_accuracy_score with the reference's
    predicted-class sample weights (pattern_gat.py:77-83)."""
    from sklearn.metrics import balanced_accuracy_score
    rng = np.random.default_rng(1)
    prop = 0.1765
    logits = rng.standard_normal(200).astype(np.float32)
    labels = (rng.random(200) < prop).astype(np.int64)
    mask = np.ones(200, bool)
    got = float(M.balanced_accuracy_predweighted(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask), prop))
    pred = (logits > 0).astype(float)
    w = 1 / prop * (pred == 1.0) + 1 / (1 - prop) * (pred == 0.0)
    want = balanced_accuracy_score(labels, pred, sample_weight=w)
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_cross_entropy_matches_torch():
    import torch
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((30, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 30)
    mask = rng.random(30) < 0.5
    got = float(M.masked_cross_entropy(jnp.asarray(logits),
                                       jnp.asarray(labels),
                                       jnp.asarray(mask)))
    want = torch.nn.CrossEntropyLoss(reduction="mean")(
        torch.tensor(logits[mask]), torch.tensor(labels[mask]))
    assert got == pytest.approx(float(want), rel=1e-5)


@pytest.mark.parametrize("pos_weight", [1.0, 1.0 / 0.1765])
def test_bce_with_logits_matches_torch(pos_weight):
    import torch
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((20, 4)).astype(np.float32) * 3
    labels = (rng.random((20, 4)) < 0.4).astype(np.float32)
    mask = np.ones(20, bool)
    got = float(M.masked_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
        pos_weight=pos_weight))
    want = torch.nn.BCEWithLogitsLoss(
        reduction="mean", pos_weight=torch.tensor([pos_weight] * 4))(
        torch.tensor(logits), torch.tensor(labels))
    assert got == pytest.approx(float(want), rel=1e-5)


def test_bce_1d_masked():
    import torch
    rng = np.random.default_rng(4)
    logits = rng.standard_normal(16).astype(np.float32)
    labels = (rng.random(16) < 0.2).astype(np.float32)
    mask = np.arange(16) < 12
    got = float(M.masked_bce_with_logits(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(mask),
        pos_weight=2.0))
    want = torch.nn.BCEWithLogitsLoss(
        reduction="mean", pos_weight=torch.tensor(2.0))(
        torch.tensor(logits[:12]), torch.tensor(labels[:12]))
    assert got == pytest.approx(float(want), rel=1e-5)
