"""The training runtime: jit-compiled steps, early stopping, checkpointing.

TPU-native replacement for the reference's Lightning Trainer usage
(reference: train.py:20-40): everything inside one epoch runs as compiled
XLA (one fused train+val program for transductive datasets, one compiled
step per batch bucket for inductive ones); only the early-stop /
best-checkpoint / plateau-LR decisions run host-side, one scalar sync per
epoch.

Checkpointing is Orbax with the same logical content as the Lightning
ckpts (SURVEY.md §5.4): params + optimizer state + epoch + best metric.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.graph import Graph
from ..models import gat
from . import optim as O
from .tasks import Task


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: dict
    opt_state: object
    rng: jax.Array
    step: jax.Array


@dataclasses.dataclass
class TrainResult:
    params: dict            # best-val params (ModelCheckpoint semantics)
    final_params: dict
    history: List[Dict[str, float]]
    best_val_loss: float
    best_epoch: int
    stopped_early: bool
    wall_time_s: float


def _squeeze(logits, task: Task):
    return logits[:, 0] if task.squeeze_output and logits.ndim == 2 else logits


def make_train_step(cfg: gat.GATConfig, task: Task, tx) -> Callable:
    """Build the jitted train step: forward(+attention if regularised),
    loss, grad, optimizer update."""
    need_attention = task.attention_coef != 0.0

    def loss_fn(params, graph: Graph, rng):
        out = gat.gat_model_apply(params, cfg, graph, rng=rng, training=True,
                                  return_attention=need_attention)
        if need_attention:
            logits, attention = out
            norm = gat.calc_attention_norm(graph, attention)
        else:
            logits, norm = out, jnp.float32(0.0)
        logits = _squeeze(logits, task)
        base = task.loss(logits, graph, "train")
        total = base + task.attention_coef * norm
        return total, {"train_loss": total, "train_attention_norm": norm,
                       "logits": logits}

    @jax.jit
    def train_step(state: TrainState, graph: Graph):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, graph, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, rng=rng,
                               step=state.step + 1)
        mets = dict(aux)
        logits = mets.pop("logits")
        mets.update({f"train_{k}": v
                     for k, v in task.metrics(logits, graph, "train").items()
                     if k != "loss"})
        return new_state, mets

    return train_step


def make_eval_step(cfg: gat.GATConfig, task: Task, phase: str) -> Callable:
    @partial(jax.jit, static_argnames=())
    def eval_step(params, graph: Graph):
        logits = gat.gat_model_apply(params, cfg, graph, training=False)
        logits = _squeeze(logits, task)
        return task.metrics(logits, graph, phase)
    return eval_step


def _mean_metrics(per_batch: List[Dict[str, jnp.ndarray]]
                  ) -> Dict[str, float]:
    """Lightning-style epoch metric: mean over batch metrics
    (reference logs per step, Lightning averages on epoch)."""
    out = {}
    for k in per_batch[0]:
        out[k] = float(np.mean([float(b[k]) for b in per_batch]))
    return out


@dataclasses.dataclass
class Trainer:
    """Orchestrates epochs over (train, val, test) batch streams.

    train_data / val_data / test_data: sequences of canonicalised `Graph`s
    (one element for transductive datasets). A `reshuffle` callable may
    re-batch the training stream each epoch (inductive minibatching,
    reference DataLoader(shuffle=True) at GATModel.py:273-278).
    """
    cfg: gat.GATConfig
    task: Task
    learning_rate: float
    weight_decay: float = 0.0
    max_epochs: int = 1000
    patience: int = 100                  # early stop (reference: 100)
    plateau: Optional[O.ReduceLROnPlateau] = None
    checkpoint_dir: Optional[str] = None
    seed: int = 0
    log_every: int = 0                   # 0 = silent
    metrics_file: Optional[str] = None   # JSONL stream (observability)

    def init_state(self, tx) -> TrainState:
        rng = jax.random.key(self.seed)
        rng, init_rng = jax.random.split(rng)
        params = gat.init_gat_model(init_rng, self.cfg)
        return TrainState(params=params, opt_state=tx.init(params), rng=rng,
                          step=jnp.int32(0))

    def fit(self,
            train_data: Sequence[Graph],
            val_data: Sequence[Graph],
            reshuffle: Optional[Callable[[int], Sequence[Graph]]] = None,
            params: Optional[dict] = None) -> TrainResult:
        tx = O.adam_l2(self.learning_rate, self.weight_decay)
        state = self.init_state(tx)
        if params is not None:
            state = dataclasses.replace(
                state, params=params, opt_state=tx.init(params))
        train_step = make_train_step(self.cfg, self.task, tx)
        val_step = make_eval_step(self.cfg, self.task, "val")

        stopper = O.EarlyStopping(patience=self.patience)
        lr = self.learning_rate
        best_val = float("inf")
        best_epoch = -1
        best_params = state.params
        history: List[Dict[str, float]] = []
        stopped = False
        t0 = time.time()
        mf = open(self.metrics_file, "a") if self.metrics_file else None

        try:
            for epoch in range(self.max_epochs):
                batches = reshuffle(epoch) if reshuffle else train_data
                train_mets = []
                for g in batches:
                    state, m = train_step(state, g)
                    train_mets.append(m)
                val_mets = [val_step(state.params, g) for g in val_data]

                row = _mean_metrics(train_mets)
                row.update({f"val_{k}": v
                            for k, v in _mean_metrics(val_mets).items()})
                row["epoch"] = epoch
                row["lr"] = lr
                history.append(row)
                if mf:
                    mf.write(json.dumps(row) + "\n")
                    mf.flush()
                if self.log_every and epoch % self.log_every == 0:
                    print({k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in row.items()})

                val_loss = row["val_loss"]
                # ModelCheckpoint(monitor=val_loss, mode=min) semantics
                if val_loss < best_val:
                    best_val = val_loss
                    best_epoch = epoch
                    best_params = jax.tree_util.tree_map(
                        lambda x: x, state.params)
                    if self.checkpoint_dir:
                        self.save_checkpoint(state, epoch, best_val)
                if self.plateau is not None:
                    new_lr = self.plateau.step(val_loss, lr)
                    if new_lr != lr:
                        lr = new_lr
                        state = dataclasses.replace(
                            state,
                            opt_state=O.set_learning_rate(state.opt_state,
                                                          lr))
                if stopper.update(val_loss):
                    stopped = True
                    break
        finally:
            if mf:
                mf.close()

        return TrainResult(params=best_params, final_params=state.params,
                           history=history, best_val_loss=best_val,
                           best_epoch=best_epoch, stopped_early=stopped,
                           wall_time_s=time.time() - t0)

    def evaluate(self, params, data: Sequence[Graph],
                 phase: str = "test") -> Dict[str, float]:
        step = make_eval_step(self.cfg, self.task, phase)
        return {f"{phase}_{k}": v
                for k, v in _mean_metrics(
                    [step(params, g) for g in data]).items()}

    # -- checkpointing (Orbax) --------------------------------------------
    def save_checkpoint(self, state: TrainState, epoch: int,
                        best_val: float) -> None:
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.checkpoint_dir, "best"))
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": state.params,
                   "epoch": jnp.int32(epoch),
                   "best_val_loss": jnp.float32(best_val)}
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    @staticmethod
    def load_checkpoint(checkpoint_dir: str, like: dict) -> dict:
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(checkpoint_dir, "best"))
        ckptr = ocp.StandardCheckpointer()
        target = {"params": like, "epoch": jnp.int32(0),
                  "best_val_loss": jnp.float32(0)}
        return ckptr.restore(path, target)
