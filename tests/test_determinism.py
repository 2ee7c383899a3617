"""Determinism (SURVEY.md §5.2): sorted segment reductions make the whole
train step bit-deterministic — the property the reference could not have
on GPU (scatter_add atomics; deterministic=True left commented out at
reference train.py:24)."""

import numpy as np

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.train import optim as O
from gat_pytorch_tpu.train.tasks import make_task
from gat_pytorch_tpu.train.trainer import TrainState, make_train_step

import jax
import jax.numpy as jnp


def test_train_step_bit_deterministic():
    rng = np.random.default_rng(0)
    n = 96
    senders = np.repeat(np.arange(n), 5)
    receivers = rng.integers(0, n, n * 5)
    x = rng.normal(size=(n, 8)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    tm = np.ones(n, bool)
    graph = T.canonicalize(x, senders, receivers, y=y, train_mask=tm,
                           val_mask=tm, test_mask=tm)
    cfg = gat.GATConfig(
        num_input_node_features=8, num_layers=2,
        num_heads_per_layer=[2, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[8, 8, 3], num_classes=3,
        add_skip_connection=[False, False], dropout=0.5)
    task = make_task("Cora")
    tx = O.adam_l2(1e-2)

    def run():
        params = gat.init_gat_model(jax.random.key(0), cfg)
        state = TrainState(params=params, opt_state=tx.init(params),
                           rng=jax.random.key(1), step=jnp.int32(0))
        step = make_train_step(cfg, task, tx)
        for _ in range(3):
            state, mets = step(state, graph)
        return state.params, mets

    p1, m1 = run()
    p2, m2 = run()
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert (np.asarray(a) == np.asarray(b)).all()   # bitwise
    assert float(m1["train_loss"]) == float(m2["train_loss"])


def test_metrics_logger_jsonl_and_tensorboard(tmp_path):
    from gat_pytorch_tpu.train.logging import MetricsLogger
    jl = tmp_path / "m.jsonl"
    tb = tmp_path / "tb"
    with MetricsLogger(str(jl), str(tb)) as lg:
        lg.log_scalars(0, {"train_loss": 1.0, "val_loss": 2.0})
        lg.log_scalars(1, {"train_loss": 0.5, "val_loss": 1.5})
        lg.log_histogram(1, "alpha/layer0", np.random.rand(100))
    import json
    lines = [json.loads(l) for l in open(jl)]
    assert len(lines) == 2 and lines[1]["train_loss"] == 0.5
    assert any(p.name.startswith("events") for p in tb.iterdir())


def test_track_grads_histograms(tmp_path):
    from gat_pytorch_tpu.graph import transforms as T
    from gat_pytorch_tpu.models import gat as G
    from gat_pytorch_tpu.train.tasks import make_task
    from gat_pytorch_tpu.train.trainer import Trainer

    rng = np.random.default_rng(2)
    n = 48
    senders = np.repeat(np.arange(n), 3)
    receivers = rng.integers(0, n, n * 3)
    x = rng.normal(size=(n, 6)).astype(np.float32)
    y = rng.integers(0, 2, n).astype(np.int32)
    m = np.ones(n, bool)
    graph = T.canonicalize(x, senders, receivers, y=y, train_mask=m,
                           val_mask=m, test_mask=m)
    cfg = G.GATConfig(
        num_input_node_features=6, num_layers=1,
        num_heads_per_layer=[2], heads_concat_per_layer=[False],
        head_output_features_per_layer=[6, 2], num_classes=2,
        add_skip_connection=[False], dropout=0.0)
    tr = Trainer(cfg=cfg, task=make_task("Cora"), learning_rate=1e-2,
                 max_epochs=2, tensorboard_dir=str(tmp_path / "tb"),
                 track_grads=True, log_every=1)
    tr.fit([graph], [graph])
    assert any(p.name.startswith("events")
               for p in (tmp_path / "tb").iterdir())
