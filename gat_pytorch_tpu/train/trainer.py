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


def make_train_step(cfg: gat.GATConfig, task: Task, tx,
                    jit: bool = True) -> Callable:
    """Build the jitted train step: forward(+attention if regularised),
    loss, grad, optimizer update. `jit=False` returns the raw function
    for embedding in a larger compiled program (lax.scan blocks)."""
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

    return jax.jit(train_step) if jit else train_step


def make_scanned_fit_block(cfg: gat.GATConfig, task: Task, tx,
                           epochs_per_block: int) -> Callable:
    """A jit-compiled block of `epochs_per_block` (train + val) epochs for
    transductive datasets, lax.scan'd fully on-device — ONE dispatch per
    block instead of 2/epoch (SURVEY.md §7.4: for Planetoid one epoch is
    one step, reference train.py:20-27 pays Lightning loop overhead per
    epoch).

    ModelCheckpoint(monitor=val_loss, mode=min) semantics run on-device:
    the scan carry holds (best_val, best_params, best_epoch) updated with
    a masked tree-select each epoch — bit-identical to the host-side
    Trainer.fit tracking. Early stopping stays host-side at block
    granularity (it only *stops*, never changes math).

    Returns block(state, best, graph) -> (state, best, rows) where rows
    are per-epoch metric arrays of length epochs_per_block and
    best = (best_val, best_params, best_epoch).
    """
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
        total = task.loss(logits, graph, "train") + task.attention_coef * norm
        return total, (norm, logits)

    def one_epoch(carry, _, graph: Graph):
        state, best_val, best_params, best_epoch = carry
        rng, sub = jax.random.split(state.rng)
        (loss, (norm, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, graph, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        state = TrainState(params=params, opt_state=opt_state, rng=rng,
                           step=state.step + 1)

        val_logits = _squeeze(
            gat.gat_model_apply(params, cfg, graph, training=False), task)
        val = task.metrics(val_logits, graph, "val")
        val_loss = val["loss"]

        better = val_loss < best_val
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(better, p, b), best_params, params)
        best_val = jnp.where(better, val_loss, best_val)
        best_epoch = jnp.where(better, state.step - 1, best_epoch)

        row = {"train_loss": loss, "train_attention_norm": norm}
        row.update({f"train_{k}": v
                    for k, v in task.metrics(logits, graph, "train").items()
                    if k != "loss"})
        row.update({f"val_{k}": v for k, v in val.items()})
        return (state, best_val, best_params, best_epoch), row

    @jax.jit
    def block(state: TrainState, best, graph: Graph):
        carry = (state, *best)
        carry, rows = jax.lax.scan(
            partial(one_epoch, graph=graph), carry, None,
            length=epochs_per_block)
        state, *best = carry
        return state, tuple(best), rows

    return block


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
    tensorboard_dir: Optional[str] = None  # TB event files (SURVEY §5.5)
    track_grads: bool = False            # gradient histograms (reference
    #                                      GATModel.on_after_backward,
    #                                      :237-253), logged every
    #                                      max(log_every, 1) epochs
    prefetch: bool = True                # background device-feed thread
    #                                      on multi-batch epochs (the
    #                                      reference's fast_dataloading
    #                                      DataLoader workers, GATModel.py
    #                                      :16,273-284); single-batch
    #                                      epochs skip it (nothing to
    #                                      overlap)
    checkpoint_every_n_epochs: int = 0   # 0 = best-only; N > 0 also saves
    #                                      <checkpoint_dir>/epoch-<E> every
    #                                      N epochs (the reference ships
    #                                      PPI-{1,5,20,50,100}epochs.ckpt
    #                                      snapshots, vis.py:59-69)

    def _logger(self):
        from .logging import MetricsLogger
        return MetricsLogger(self.metrics_file, self.tensorboard_dir)

    def _log_grad_histograms(self, logger, epoch: int, state: TrainState,
                             graph: Graph) -> None:
        if not (self.track_grads and self.tensorboard_dir):
            return

        def loss_only(params, g, rng):
            out = gat.gat_model_apply(params, self.cfg, g, rng=rng,
                                      training=True)
            return self.task.loss(_squeeze(out, self.task), g, "train")

        grads = jax.jit(jax.grad(loss_only))(state.params, graph, state.rng)
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            name = "grad/" + "/".join(str(getattr(p, "key", getattr(
                p, "idx", p))) for p in path)
            logger.log_histogram(epoch, name, np.asarray(leaf))

    def _log_attention_histograms(self, logger, epoch: int, params,
                                  graph: Graph) -> None:
        """Per-layer attention histograms to TensorBoard: alpha*deg
        ("unnormalised attention") and alpha*deg - 1, the reference's
        in-training logging inside calc_attention_norm
        (reference models/GATModel.py:216-221; same tag names)."""
        if not self.tensorboard_dir:
            return
        from ..ops import segment as seg
        _, attention = jax.jit(
            lambda p, g: gat.gat_model_apply(
                p, self.cfg, g, training=False, return_attention=True,
                backend="xla"))(params, graph)
        deg = seg.in_degree(graph.receivers, graph.num_nodes,
                            edge_mask=graph.edge_mask)
        deg_e = np.asarray(seg.gather_rows(deg, graph.receivers))
        emask = np.asarray(graph.edge_mask)
        for i, alpha in enumerate(attention):
            unnorm = np.asarray(alpha)[emask] * deg_e[emask][:, None]
            logger.log_histogram(
                epoch, f"unnormalised_attention_layer_{i}", unnorm)
            logger.log_histogram(
                epoch, f"attention_minus_const_layer_{i}", unnorm - 1.0)

    def _maybe_snapshot(self, epoch: int, state: TrainState,
                        best_val: float) -> None:
        """Every-N-epochs snapshot to <checkpoint_dir>/epoch-<E> (1-based
        epoch count, matching the reference's '<ds>-<E>epochs.ckpt'
        artifacts)."""
        n = self.checkpoint_every_n_epochs
        if n and self.checkpoint_dir and (epoch + 1) % n == 0:
            self.save_checkpoint(state, epoch, best_val,
                                 name=f"epoch-{epoch + 1}")

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
        logger = self._logger()

        try:
            for epoch in range(self.max_epochs):
                batches = reshuffle(epoch) if reshuffle else train_data
                stream = batches
                if self.prefetch and len(batches) > 1:
                    # overlap host batch prep + H2D with device compute
                    # (reference fast_dataloading counterpart)
                    from ..data.prefetch import PrefetchIterator
                    stream = PrefetchIterator(batches, depth=2)
                train_mets = []
                for g in stream:
                    state, m = train_step(state, g)
                    train_mets.append(m)
                val_mets = [val_step(state.params, g) for g in val_data]

                row = _mean_metrics(train_mets)
                row.update({f"val_{k}": v
                            for k, v in _mean_metrics(val_mets).items()})
                row["epoch"] = epoch
                row["lr"] = lr
                history.append(row)
                logger.log_scalars(epoch, row)
                if epoch % max(self.log_every, 1) == 0:
                    self._log_grad_histograms(logger, epoch, state,
                                              batches[0])
                    self._log_attention_histograms(logger, epoch,
                                                   state.params, batches[0])
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
                self._maybe_snapshot(epoch, state, best_val)
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
            logger.close()

        return TrainResult(params=best_params, final_params=state.params,
                           history=history, best_val_loss=best_val,
                           best_epoch=best_epoch, stopped_early=stopped,
                           wall_time_s=time.time() - t0)

    def fit_compiled(self, graph: Graph,
                     epochs_per_block: int = 50,
                     params: Optional[dict] = None) -> TrainResult:
        """Transductive fit with lax.scan'd epoch blocks (one device
        dispatch per `epochs_per_block` epochs). Semantics match fit():
        same ModelCheckpoint/EarlyStopping decisions, evaluated from the
        returned per-epoch metric arrays at block granularity."""
        tx = O.adam_l2(self.learning_rate, self.weight_decay)
        state = self.init_state(tx)
        if params is not None:
            state = dataclasses.replace(
                state, params=params, opt_state=tx.init(params))
        # per-epoch params only exist at block boundaries, so align the
        # scan length with the snapshot cadence (gcd => every multiple of
        # checkpoint_every_n_epochs lands on a boundary)
        if self.checkpoint_every_n_epochs:
            import math
            epochs_per_block = math.gcd(epochs_per_block,
                                        self.checkpoint_every_n_epochs)
        block = make_scanned_fit_block(self.cfg, self.task, tx,
                                       epochs_per_block)

        best = (jnp.float32(jnp.inf),
                jax.tree_util.tree_map(lambda x: x, state.params),
                jnp.int32(-1))
        stopper = O.EarlyStopping(patience=self.patience)
        history: List[Dict[str, float]] = []
        stopped = False
        t0 = time.time()
        logger = self._logger()

        try:
            epoch = 0
            while epoch < self.max_epochs and not stopped:
                n = min(epochs_per_block, self.max_epochs - epoch)
                if n < epochs_per_block:
                    block = make_scanned_fit_block(self.cfg, self.task, tx, n)
                state, best, rows = block(state, best, graph)
                rows = {k: np.asarray(v) for k, v in rows.items()}
                for i in range(n):
                    row = {k: float(v[i]) for k, v in rows.items()}
                    row["epoch"] = epoch + i
                    history.append(row)
                    logger.log_scalars(epoch + i, row)
                    if self.log_every and (epoch + i) % self.log_every == 0:
                        print({k: (round(v, 4) if isinstance(v, float)
                                   else v) for k, v in row.items()})
                    if stopper.update(row["val_loss"]):
                        stopped = True
                        break
                epoch += n
                self._maybe_snapshot(epoch - 1, state, float(best[0]))
                # once per block (per-epoch alphas don't exist host-side)
                self._log_attention_histograms(logger, epoch - 1,
                                               state.params, graph)
        finally:
            logger.close()

        best_val, best_params, best_epoch = best
        if self.checkpoint_dir:
            self.save_checkpoint(
                dataclasses.replace(state, params=best_params),
                int(best_epoch), float(best_val))
        return TrainResult(params=best_params, final_params=state.params,
                           history=history, best_val_loss=float(best_val),
                           best_epoch=int(best_epoch),
                           stopped_early=stopped,
                           wall_time_s=time.time() - t0)

    def fit_scanned_epochs(self,
                           train_data: Sequence[Graph],
                           val_data: Sequence[Graph],
                           reshuffle: Optional[Callable[[int],
                                                        Sequence[Graph]]]
                           = None) -> TrainResult:
        """Inductive fit with each epoch's minibatches stacked on a
        leading axis and lax.scan'd on-device — ONE train dispatch and
        one val dispatch per epoch instead of one per batch (PPI: 10,
        PATTERN: ~1750 batches/epoch in the reference, SURVEY §3.1).
        Requires all batches to share one bucket (loader/sampling
        batchers guarantee this). Semantics match fit()."""
        from ..parallel.sharding import stack_graphs

        tx = O.adam_l2(self.learning_rate, self.weight_decay)
        state = self.init_state(tx)
        step = make_train_step(self.cfg, self.task, tx, jit=False)
        task = self.task
        cfg = self.cfg

        @jax.jit
        def train_epoch(state, batch):
            def body(s, g):
                s, mets = step(s, g)
                return s, mets
            return jax.lax.scan(body, state, batch)

        @jax.jit
        def val_epoch(params, batch):
            def body(_, g):
                logits = _squeeze(
                    gat.gat_model_apply(params, cfg, g, training=False),
                    task)
                return 0, task.metrics(logits, g, "val")
            _, mets = jax.lax.scan(body, 0, batch)
            return mets

        val_stack = stack_graphs(list(val_data))
        stopper = O.EarlyStopping(patience=self.patience)
        lr = self.learning_rate
        best_val, best_epoch = float("inf"), -1
        best_params = state.params
        history: List[Dict[str, float]] = []
        stopped = False
        t0 = time.time()
        logger = self._logger()
        try:
            for epoch in range(self.max_epochs):
                batches = list(reshuffle(epoch) if reshuffle
                               else train_data)
                state, tmets = train_epoch(state, stack_graphs(batches))
                vmets = val_epoch(state.params, val_stack)
                row = {k: float(np.mean(np.asarray(v)))
                       for k, v in tmets.items()}
                row.update({f"val_{k}": float(np.mean(np.asarray(v)))
                            for k, v in vmets.items()})
                row["epoch"] = epoch
                row["lr"] = lr
                history.append(row)
                logger.log_scalars(epoch, row)
                if self.log_every and epoch % self.log_every == 0:
                    print({k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in row.items()})
                if epoch % max(self.log_every, 1) == 0:
                    self._log_attention_histograms(logger, epoch,
                                                   state.params, batches[0])
                val_loss = row["val_loss"]
                if val_loss < best_val:
                    best_val, best_epoch = val_loss, epoch
                    best_params = jax.tree_util.tree_map(lambda x: x,
                                                         state.params)
                    if self.checkpoint_dir:
                        self.save_checkpoint(state, epoch, best_val)
                self._maybe_snapshot(epoch, state, best_val)
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
            logger.close()
        return TrainResult(params=best_params, final_params=state.params,
                           history=history, best_val_loss=best_val,
                           best_epoch=best_epoch, stopped_early=stopped,
                           wall_time_s=time.time() - t0)

    def fit_sharded(self,
                    mesh,
                    train_data: Sequence[Graph],
                    val_data: Sequence[Graph],
                    reshuffle: Optional[Callable[[int],
                                                 Sequence[Graph]]] = None,
                    dst_owned: bool = False) -> TrainResult:
        """First-class fit() over a (data, edge) device mesh: consecutive
        same-bucket batches are stacked `data`-axis-wide, and the whole
        epoch of batch groups is lax.scan'd through the SPMD shard_map
        step inside ONE compiled program (one train + one val dispatch per
        epoch, like fit_scanned_epochs). Full trainer semantics:
        best-checkpointing, epoch snapshots, plateau LR, early stopping.
        DDP-style wrap-around fills the last group when the batch count
        doesn't divide the data-axis size."""
        from ..parallel import (make_sharded_eval_step,
                                make_sharded_train_step, replicated,
                                stack_graphs)
        from ..parallel.sharding import stack_group_batches
        from ..parallel.mesh import DATA_AXIS

        dp = mesh.shape[DATA_AXIS]

        part_eps = [None]  # sticky bucket: one static shape across epochs

        def group(batches):
            if dst_owned:
                from ..parallel.partition import partition_batches
                from ..parallel.mesh import EDGE_AXIS
                k_edge = mesh.shape[EDGE_AXIS]
                try:
                    batches, eps = partition_batches(
                        list(batches), k_edge, eps=part_eps[0])
                except ValueError:
                    # a reshuffled epoch exceeded the sticky bucket:
                    # regrow with headroom (one recompile, then sticky)
                    batches, eps = partition_batches(list(batches), k_edge)
                    eps = ((int(eps * 1.25) + 255) // 256) * 256
                    batches, eps = partition_batches(list(batches),
                                                     k_edge, eps=eps)
                if part_eps[0] is None:
                    # first epoch: 25% headroom against later reshuffles
                    eps = ((int(eps * 1.25) + 255) // 256) * 256
                    batches, eps = partition_batches(list(batches),
                                                     k_edge, eps=eps)
                part_eps[0] = eps
            out = []
            for i in range(0, len(batches), dp):
                chunk = list(batches[i:i + dp])
                while len(chunk) < dp:           # wrap-around fill
                    chunk.append(batches[len(chunk) % len(batches)])
                out.append(stack_graphs(chunk))
            return stack_group_batches(out, mesh)

        tx = O.adam_l2(self.learning_rate, self.weight_decay)
        state = replicated(self.init_state(tx), mesh)
        step_fn = make_sharded_train_step(self.cfg, self.task, tx, mesh,
                                          jit=False, dst_owned=dst_owned)
        val_fn = make_sharded_eval_step(self.cfg, self.task, mesh, "val",
                                        jit=False, dst_owned=dst_owned)

        @jax.jit
        def train_epoch(state, groups):
            return jax.lax.scan(step_fn, state, groups)

        @jax.jit
        def val_epoch(params, groups):
            def body(_, b):
                return 0, val_fn(params, b)
            _, mets = jax.lax.scan(body, 0, groups)
            return mets

        val_groups = group(list(val_data))
        stopper = O.EarlyStopping(patience=self.patience)
        lr = self.learning_rate
        best_val, best_epoch = float("inf"), -1
        best_params = state.params
        history: List[Dict[str, float]] = []
        stopped = False
        t0 = time.time()
        logger = self._logger()

        def epoch_groups():
            for epoch in range(self.max_epochs):
                yield group(list(reshuffle(epoch) if reshuffle
                                 else train_data))

        group_stream = epoch_groups()
        if self.prefetch and self.max_epochs > 1:
            # one-ahead builder thread: epoch e+1's partition/stack/
            # device_put (all host work) overlaps epoch e's device scan.
            # put=False — group() already placed arrays with their
            # NamedShardings.
            from ..data.prefetch import PrefetchIterator
            group_stream = PrefetchIterator(group_stream, depth=1,
                                            put=False)
        try:
            for epoch, groups in zip(range(self.max_epochs),
                                     group_stream):
                state, tmets = train_epoch(state, groups)
                vmets = val_epoch(state.params, val_groups)
                row = {k: float(np.mean(np.asarray(v)))
                       for k, v in tmets.items()}
                row.update({f"val_{k}": float(np.mean(np.asarray(v)))
                            for k, v in vmets.items()})
                row["epoch"] = epoch
                row["lr"] = lr
                history.append(row)
                logger.log_scalars(epoch, row)
                if self.log_every and epoch % self.log_every == 0:
                    print({k: (round(v, 4) if isinstance(v, float) else v)
                           for k, v in row.items()})
                val_loss = row["val_loss"]
                if val_loss < best_val:
                    best_val, best_epoch = val_loss, epoch
                    best_params = jax.tree_util.tree_map(lambda x: x,
                                                         state.params)
                    if self.checkpoint_dir:
                        self.save_checkpoint(state, epoch, best_val)
                self._maybe_snapshot(epoch, state, best_val)
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
            logger.close()
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
    # Same logical content as the reference's Lightning ckpts (SURVEY.md
    # §5.4: weights + Adam moments + epoch/step + monitored metric), so a
    # restore resumes training exactly, not just inference.
    def save_checkpoint(self, state: TrainState, epoch: int,
                        best_val: float, name: str = "best") -> None:
        import orbax.checkpoint as ocp
        path = os.path.abspath(os.path.join(self.checkpoint_dir, name))
        ckptr = ocp.StandardCheckpointer()
        payload = {"params": state.params,
                   "opt_state": state.opt_state,
                   "rng": jax.random.key_data(state.rng),
                   "step": state.step,
                   "epoch": jnp.int32(epoch),
                   "best_val_loss": jnp.float32(best_val)}
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()

    @staticmethod
    def load_checkpoint(checkpoint_path: str, like: dict,
                        opt_state_like=None) -> dict:
        """Restore a checkpoint. `checkpoint_path` is either an Orbax
        checkpoint directory itself (.../best, .../epoch-20) or a Trainer
        checkpoint_dir containing a "best" subdir (legacy call shape).
        `like`: a params pytree with the target structure;
        `opt_state_like`: optional optimizer-state structure for
        full-state resume (omit for inference-only restore)."""
        import orbax.checkpoint as ocp
        path = os.path.abspath(checkpoint_path)
        if os.path.isdir(os.path.join(path, "best")):
            path = os.path.join(path, "best")
        ckptr = ocp.StandardCheckpointer()
        target = {"params": like,
                  "opt_state": opt_state_like,
                  "rng": jnp.zeros(2, jnp.uint32),
                  "step": jnp.int32(0),
                  "epoch": jnp.int32(0),
                  "best_val_loss": jnp.float32(0)}
        if opt_state_like is None:
            restored = ckptr.restore(path, None)
            restored["params"] = jax.tree_util.tree_map(
                lambda l, r: jnp.asarray(r, l.dtype), like,
                restored["params"])
            return restored
        out = ckptr.restore(path, target)
        out["rng"] = jax.random.wrap_key_data(jnp.asarray(out["rng"],
                                                          jnp.uint32))
        return out

    def resume_state(self, tx, checkpoint_dir: Optional[str] = None
                     ) -> "TrainState":
        """TrainState rebuilt from a saved checkpoint (full resume)."""
        ckpt_dir = checkpoint_dir or self.checkpoint_dir
        params_like = gat.init_gat_model(jax.random.key(self.seed), self.cfg)
        restored = self.load_checkpoint(ckpt_dir, params_like,
                                        opt_state_like=tx.init(params_like))
        return TrainState(params=restored["params"],
                          opt_state=restored["opt_state"],
                          rng=restored["rng"],
                          step=jnp.asarray(restored["step"], jnp.int32))
