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
