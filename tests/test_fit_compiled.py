"""fit_compiled (lax.scan epoch blocks) vs fit (host loop) equivalence."""

import numpy as np
import pytest

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.train.tasks import make_task
from gat_pytorch_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    n, nf, nc = 80, 16, 4
    senders = np.repeat(np.arange(n), 4)
    receivers = rng.integers(0, n, n * 4)
    x = rng.normal(size=(n, nf)).astype(np.float32)
    y = rng.integers(0, nc, n).astype(np.int32)
    train = np.zeros(n, bool); train[:40] = True
    val = np.zeros(n, bool); val[40:60] = True
    test = np.zeros(n, bool); test[60:] = True
    graph = T.canonicalize(x, senders, receivers, y=y, train_mask=train,
                           val_mask=val, test_mask=test)
    cfg = gat.GATConfig(
        num_input_node_features=nf, num_layers=2,
        num_heads_per_layer=[2, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[nf, 8, nc], num_classes=nc,
        add_skip_connection=[False, False], dropout=0.3)
    return graph, cfg


def test_fit_compiled_matches_fit(problem):
    graph, cfg = problem
    mk = lambda: Trainer(cfg=cfg, task=make_task("Cora"),  # noqa: E731
                         learning_rate=5e-3, weight_decay=5e-4,
                         max_epochs=30, patience=100, seed=7)
    r_host = mk().fit([graph], [graph])
    r_scan = mk().fit_compiled(graph, epochs_per_block=8)

    assert len(r_host.history) == len(r_scan.history) == 30
    np.testing.assert_allclose(r_scan.best_val_loss, r_host.best_val_loss,
                               rtol=1e-4)
    assert r_scan.best_epoch == r_host.best_epoch
    for a, b in zip(
            [h["val_loss"] for h in r_scan.history],
            [h["val_loss"] for h in r_host.history]):
        np.testing.assert_allclose(a, b, rtol=1e-4)


def test_fit_compiled_early_stops(problem):
    graph, cfg = problem
    tr = Trainer(cfg=cfg, task=make_task("Cora"), learning_rate=5e-3,
                 max_epochs=500, patience=5, seed=1)
    r = tr.fit_compiled(graph, epochs_per_block=16)
    assert r.stopped_early
    assert len(r.history) < 500


def test_fit_compiled_learns(problem):
    graph, cfg = problem
    tr = Trainer(cfg=cfg, task=make_task("Cora"), learning_rate=1e-2,
                 max_epochs=60, patience=100, seed=3)
    r = tr.fit_compiled(graph, epochs_per_block=20)
    first, last = r.history[0]["train_loss"], r.history[-1]["train_loss"]
    assert last < first


def test_fit_scanned_epochs_matches_fit_inductive():
    """Scanned-epoch inductive fit == per-batch fit (same batches, no
    shuffle) on losses and best bookkeeping."""
    rng = np.random.default_rng(4)
    graphs = []
    for i in range(6):
        n = 24
        senders = np.repeat(np.arange(n), 3)
        receivers = rng.integers(0, n, n * 3)
        x = rng.normal(size=(n, 10)).astype(np.float32)
        y = (rng.random((n, 4)) > 0.5).astype(np.float32)
        graphs.append(T.canonicalize(x, senders, receivers, y=y,
                                     node_bucket=32, edge_bucket=128,
                                     pad_multiple=32))
    cfg = gat.GATConfig(
        num_input_node_features=10, num_layers=2,
        num_heads_per_layer=[2, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[10, 8, 4], num_classes=4,
        add_skip_connection=[False, False], dropout=0.0)
    mk = lambda: Trainer(cfg=cfg, task=make_task("PPI"),  # noqa: E731
                         learning_rate=1e-2, max_epochs=5, seed=9)
    r_loop = mk().fit(graphs[:4], graphs[4:])
    r_scan = mk().fit_scanned_epochs(graphs[:4], graphs[4:])
    assert len(r_loop.history) == len(r_scan.history)
    for a, b in zip(r_loop.history, r_scan.history):
        np.testing.assert_allclose(a["val_loss"], b["val_loss"], rtol=1e-4)
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=1e-4)
    assert r_loop.best_epoch == r_scan.best_epoch
