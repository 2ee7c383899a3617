"""Multi-chip train/eval steps: shard_map over the (data, edge) mesh.

One jit-compiled SPMD program per step:

  * graphs-per-batch sharded over ``data`` (DP),
  * each graph's dst-sorted edge list sharded over ``edge`` (the sequence-
    parallel analog; SURVEY.md §5.7) — the forward completes cut-
    neighbourhood softmax denominators / aggregates with psum over
    ``edge`` (models/gat.py `edge_axis` paths),
  * params replicated; gradients are per-shard partials summed with one
    psum over ("data", "edge") — partials are genuine because every path
    from params to the loss crosses an edge-local op (gather/SDDMM/SpMM).

This hand-scheduled path and the GSPMD auto path (sharding.put_batch +
plain jit) compute the same function; tests assert they match the
single-device trainer step bit-for-bit in f32.
"""

from __future__ import annotations


from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..graph.graph import Graph
from ..models import gat
from ..train.tasks import Task
from ..train.trainer import TrainState, _squeeze
from .mesh import DATA_AXIS, EDGE_AXIS
from .sharding import batch_specs


def _global_batch_size(mesh: Mesh, local_b: int) -> int:
    return local_b * mesh.shape[DATA_AXIS]


def make_sharded_train_step(cfg: gat.GATConfig, task: Task, tx,
                            mesh: Mesh, jit: bool = True,
                            dst_owned: bool = False,
                            force_windowed=None,
                            backend: str = "auto") -> Callable:
    """Train step over a stacked GraphBatch (leading dim B divisible by
    the mesh's data-axis size). `jit=False` returns the raw function for
    embedding in a larger compiled program (Trainer.fit_sharded scans a
    whole epoch of batch groups around it). `dst_owned=True` expects
    batches prepared by partition.partition_edges_by_dst and runs the
    boundary-free layout (one all_gather/layer instead of psums).
    force_windowed: per-call override of the windowed-kernel gate
    (True forces the v7 family on, False off, None = env/auto) —
    the driver dry-run uses it instead of mutating GAT_TPU_V6.
    backend: forwarded to gat_model_apply — the dry-run passes
    "pallas" so the windowed kernels run (interpret mode) on the CPU
    mesh; "auto" resolves to xla off-TPU."""
    need_attention = task.attention_coef != 0.0

    def per_graph_loss(params, graph: Graph, rng):
        out = gat.gat_model_apply(params, cfg, graph, rng=rng, training=True,
                                  return_attention=need_attention,
                                  edge_axis=EDGE_AXIS, dst_owned=dst_owned,
                                  force_windowed=force_windowed,
                                  backend=backend)
        if need_attention:
            logits, attention = out
            norm = gat.calc_attention_norm(graph, attention,
                                           edge_axis=EDGE_AXIS,
                                           dst_owned=dst_owned)
        else:
            logits, norm = out, jnp.float32(0.0)
        logits = _squeeze(logits, task)
        base = task.loss(logits, graph, "train")
        total = base + task.attention_coef * norm
        if dst_owned:
            # check_vma=False AD semantics: a replicated loss seeds a
            # cotangent on EVERY edge shard, so paths crossing the
            # between-layer all_gathers accumulate x K while fully-
            # replicated paths (e.g. skip weights) do not. Scaling the
            # local loss by 1/K and psumming grads afterwards corrects
            # both uniformly (pinned by test_parallel_dst_owned).
            total = total / jax.lax.axis_size(EDGE_AXIS)
        mets = {k: v for k, v in task.metrics(logits, graph, "train").items()
                if k != "loss"}
        return total, (norm, mets)

    def local_value_and_grad(params, batch: Graph, rng, b_global: int):
        b_local = batch.x.shape[0]
        di = jax.lax.axis_index(DATA_AXIS)
        idx = jnp.arange(b_local) + di * b_local
        keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(idx)

        def local_loss(params):
            losses, (norms, mets) = jax.vmap(
                lambda g, k: per_graph_loss(params, g, k))(batch, keys)
            return jnp.sum(losses) / b_global, (jnp.sum(norms) / b_global,
                                                mets)

        (loss, (norm, mets)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params)
        return loss, norm, mets, grads

    def sharded_body(params, batch: Graph, rng):
        b_global = _global_batch_size(mesh, batch.x.shape[0])
        loss, norm, mets, grads = local_value_and_grad(
            params, batch, rng, b_global)
        # Complete the data-mean for the scalars. With check_vma=True
        # (cut-neighbourhood layout) gradients need NO manual reduction:
        # params enter shard_map replicated (in_spec P()), so the
        # invariant->varying transpose psums the cotangent over BOTH mesh
        # axes — grads leave value_and_grad already fully reduced.
        # dst_owned (check_vma=False): grads are per-shard 1/K-scaled
        # mixtures (see per_graph_loss) completed by one psum over edge;
        # the reported loss un-scales the same way. The DATA-axis mean
        # also needs an explicit grad psum here — nothing crosses the
        # data axis inside the loss, so each data shard's grads cover
        # only its own graphs' 1/b_global contributions (check_vma=True
        # delivered this reduction via the invariant->varying
        # transpose; without it params would silently fork per device).
        if dst_owned:
            grads = jax.lax.psum(grads, (EDGE_AXIS, DATA_AXIS))
            loss = jax.lax.psum(loss, EDGE_AXIS)
        loss = jax.lax.psum(loss, DATA_AXIS)
        norm = jax.lax.psum(norm, DATA_AXIS)
        mets = {k: jax.lax.psum(jnp.sum(v) / b_global, DATA_AXIS)
                for k, v in mets.items()}
        return loss, norm, mets, grads

    def train_step(state: TrainState, batch: Graph):
        rng, sub = jax.random.split(state.rng)
        specs = batch_specs(batch)
        loss, norm, mets, grads = jax.shard_map(
            sharded_body, mesh=mesh,
            in_specs=(P(), specs, P()), out_specs=P(),
            check_vma=not dst_owned)(state.params, batch, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.params, updates)
        out = {"train_loss": loss, "train_attention_norm": norm}
        out.update({f"train_{k}": v for k, v in mets.items()})
        return TrainState(params=params, opt_state=opt_state, rng=rng,
                          step=state.step + 1), out

    return jax.jit(train_step) if jit else train_step


def make_sharded_eval_step(cfg: gat.GATConfig, task: Task, mesh: Mesh,
                           phase: str, jit: bool = True,
                           dst_owned: bool = False) -> Callable:

    def per_graph_metrics(params, graph: Graph):
        logits = gat.gat_model_apply(params, cfg, graph, training=False,
                                     edge_axis=EDGE_AXIS,
                                     dst_owned=dst_owned)
        return task.metrics(_squeeze(logits, task), graph, phase)

    def sharded_body(params, batch: Graph):
        b_global = _global_batch_size(mesh, batch.x.shape[0])
        mets = jax.vmap(lambda g: per_graph_metrics(params, g))(batch)
        return {k: jax.lax.psum(jnp.sum(v) / b_global, DATA_AXIS)
                for k, v in mets.items()}

    def eval_step(params, batch: Graph):
        specs = batch_specs(batch)
        return jax.shard_map(
            sharded_body, mesh=mesh,
            in_specs=(P(), specs), out_specs=P(),
            check_vma=False)(params, batch)

    return jax.jit(eval_step) if jit else eval_step
