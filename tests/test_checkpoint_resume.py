"""Orbax checkpoint/resume: full training-state roundtrip (SURVEY §5.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.train import optim as O
from gat_pytorch_tpu.train.tasks import make_task
from gat_pytorch_tpu.train.trainer import Trainer, make_train_step


@pytest.fixture()
def problem():
    rng = np.random.default_rng(1)
    n = 64
    senders = np.repeat(np.arange(n), 4)
    receivers = rng.integers(0, n, n * 4)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    m = np.ones(n, bool)
    graph = T.canonicalize(x, senders, receivers, y=y, train_mask=m,
                           val_mask=m, test_mask=m)
    cfg = gat.GATConfig(
        num_input_node_features=8, num_layers=2,
        num_heads_per_layer=[2, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[8, 8, 3], num_classes=3,
        add_skip_connection=[False, False], dropout=0.0)
    return graph, cfg


def test_full_state_resume_continues_identically(problem, tmp_path):
    graph, cfg = problem
    task = make_task("Cora")
    tx = O.adam_l2(1e-2)
    tr = Trainer(cfg=cfg, task=task, learning_rate=1e-2, max_epochs=5,
                 checkpoint_dir=str(tmp_path), seed=3)
    state = tr.init_state(tx)
    step = make_train_step(cfg, task, tx)

    for _ in range(4):
        state, _ = step(state, graph)
    tr.save_checkpoint(state, epoch=3, best_val=0.5)

    # continue the original
    cont = state
    for _ in range(3):
        cont, m_direct = step(cont, graph)

    # resume from disk and continue
    resumed = tr.resume_state(tx)
    assert int(resumed.step) == int(state.step)
    for _ in range(3):
        resumed, m_resumed = step(resumed, graph)

    for a, b in zip(jax.tree_util.tree_leaves(cont.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(m_direct["train_loss"]) == float(m_resumed["train_loss"])


def test_epoch_snapshots_written_and_loadable(problem, tmp_path):
    """checkpoint_every_n_epochs=2 over 6 epochs -> epoch-{2,4,6}
    snapshots alongside best (the reference ships per-epoch ckpts that
    vis.py:59-69 sweeps; ours must be producible from our own training)."""
    import os
    graph, cfg = problem
    tr = Trainer(cfg=cfg, task=make_task("Cora"), learning_rate=1e-2,
                 max_epochs=6, checkpoint_dir=str(tmp_path), seed=0,
                 checkpoint_every_n_epochs=2)
    res = tr.fit([graph], [graph])
    assert len(res.history) == 6
    for e in (2, 4, 6):
        snap = os.path.join(str(tmp_path), f"epoch-{e}")
        assert os.path.isdir(snap), sorted(os.listdir(tmp_path))
        like = gat.init_gat_model(jax.random.key(0), cfg)
        restored = Trainer.load_checkpoint(snap, like)
        assert int(np.asarray(restored["epoch"])) == e - 1
    assert not os.path.exists(os.path.join(str(tmp_path), "epoch-3"))

    # fit_compiled path: block length aligns to the snapshot cadence
    tr2 = Trainer(cfg=cfg, task=make_task("Cora"), learning_rate=1e-2,
                  max_epochs=6, checkpoint_dir=str(tmp_path / "c"), seed=0,
                  checkpoint_every_n_epochs=3)
    tr2.fit_compiled(graph, epochs_per_block=4)
    for e in (3, 6):
        assert os.path.isdir(os.path.join(str(tmp_path / "c"),
                                          f"epoch-{e}"))


def test_attention_histograms_logged_during_training(problem, tmp_path,
                                                     monkeypatch):
    """The Trainer wires per-layer attention histograms (alpha*deg and
    alpha*deg - 1) to the metrics logger when tensorboard_dir is set —
    the reference's in-training TB logging (models/GATModel.py:216-221)."""
    graph, cfg = problem
    calls = []

    class Recorder:
        def log_scalars(self, step, row):
            pass

        def log_histogram(self, step, tag, values):
            calls.append((step, tag, np.asarray(values)))

        def close(self):
            pass

    tr = Trainer(cfg=cfg, task=make_task("Cora"), learning_rate=1e-2,
                 max_epochs=2, seed=0, tensorboard_dir=str(tmp_path))
    monkeypatch.setattr(Trainer, "_logger", lambda self: Recorder())
    tr.fit([graph], [graph])
    tags = {t for _, t, _ in calls}
    for i in range(cfg.num_layers):
        assert f"unnormalised_attention_layer_{i}" in tags
        assert f"attention_minus_const_layer_{i}" in tags
    # unnormalised attention of a real graph averages ~1 per edge
    vals = next(v for _, t, v in calls
                if t == "unnormalised_attention_layer_0")
    assert vals.size > 0 and np.isfinite(vals).all()
    assert 0.2 < float(np.mean(vals)) < 5.0


def test_inference_restore_without_opt_state(problem, tmp_path):
    graph, cfg = problem
    task = make_task("Cora")
    tx = O.adam_l2(1e-2)
    tr = Trainer(cfg=cfg, task=task, learning_rate=1e-2, max_epochs=5,
                 checkpoint_dir=str(tmp_path), seed=3)
    state = tr.init_state(tx)
    tr.save_checkpoint(state, epoch=0, best_val=1.0)

    like = gat.init_gat_model(jax.random.key(0), cfg)
    restored = Trainer.load_checkpoint(str(tmp_path), like)
    out_a = gat.gat_model_apply(state.params, cfg, graph)
    out_b = gat.gat_model_apply(restored["params"], cfg, graph)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    assert int(np.asarray(restored["epoch"])) == 0
