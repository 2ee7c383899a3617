"""Task heads: per-dataset loss + metrics, as pure functions over (logits, Graph).

Re-expresses the reference's three Lightning task modules
(reference: models/planetoid_gat.py, models/ppi_gat.py,
models/pattern_gat.py) as data: a `Task` bundles the loss, the metric set,
which node mask applies in each phase, and the attention-regulariser
coefficient (reward for Planetoid :27, penalty for PPI :28-31).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict

import jax.numpy as jnp

from ..graph.graph import Graph
from . import metrics as M

PATTERN_PROP_POS = 0.1765  # reference: pattern_gat.py:12


@dataclasses.dataclass(frozen=True)
class Task:
    name: str
    # loss(logits, graph, phase) -> scalar
    loss: Callable[[jnp.ndarray, Graph, str], jnp.ndarray]
    # metrics(logits, graph, phase) -> dict of scalars
    metrics: Callable[[jnp.ndarray, Graph, str], Dict[str, jnp.ndarray]]
    # coefficient on calc_attention_norm added to the train loss
    # (>0 = penalty toward const attention; <0 = reward)
    attention_coef: float = 0.0
    # squeeze logits (N,1)->(N,) before loss/metrics (PATTERN)
    squeeze_output: bool = False


def _phase_mask(graph: Graph, phase: str) -> jnp.ndarray:
    """Transductive phase mask; inductive graphs use node_mask everywhere."""
    m = {"train": graph.train_mask, "val": graph.val_mask,
         "test": graph.test_mask}[phase]
    if m is None:
        return graph.node_mask
    return m & graph.node_mask


def planetoid_task(attention_reward: float = 0.0) -> Task:
    """Masked cross-entropy + accuracy (reference: planetoid_gat.py:15-53).
    The reference *subtracts* reward*norm? No — it ADDS reward*norm to the
    loss (:27); 'reward' is just the sign convention the author chose."""
    def loss(logits, graph, phase):
        return M.masked_cross_entropy(logits, graph.y,
                                      _phase_mask(graph, phase))

    def mets(logits, graph, phase):
        m = _phase_mask(graph, phase)
        return {"loss": M.masked_cross_entropy(logits, graph.y, m),
                "acc": M.masked_accuracy(logits, graph.y, m)}

    return Task(name="planetoid", loss=loss, metrics=mets,
                attention_coef=attention_reward)


def ppi_task(attention_penalty: float = 0.0) -> Task:
    """Multi-label BCE + micro-F1 over whole graphs
    (reference: ppi_gat.py:15-59)."""
    def loss(logits, graph, phase):
        return M.masked_bce_with_logits(logits, graph.y, graph.node_mask)

    def mets(logits, graph, phase):
        return {"loss": M.masked_bce_with_logits(logits, graph.y,
                                                 graph.node_mask),
                "f1": M.micro_f1(logits, graph.y, graph.node_mask)}

    return Task(name="ppi", loss=loss, metrics=mets,
                attention_coef=attention_penalty)


def pattern_task() -> Task:
    """Pos-weighted BCE + prediction-weighted balanced accuracy
    (reference: pattern_gat.py:11-61)."""
    pos_weight = 1.0 / PATTERN_PROP_POS

    def loss(logits, graph, phase):
        return M.masked_bce_with_logits(logits, graph.y.astype(jnp.float32),
                                        graph.node_mask,
                                        pos_weight=pos_weight)

    def mets(logits, graph, phase):
        return {"loss": loss(logits, graph, phase),
                "weighted_acc": M.balanced_accuracy_predweighted(
                    logits, graph.y, graph.node_mask, PATTERN_PROP_POS)}

    return Task(name="pattern", loss=loss, metrics=mets,
                squeeze_output=True)


def make_task(dataset: str, *, attention_reward: float = 0.0,
              attention_penalty: float = 0.0) -> Task:
    if dataset in ("Cora", "Citeseer", "Pubmed"):
        return planetoid_task(attention_reward)
    if dataset == "PPI":
        return ppi_task(attention_penalty)
    if dataset == "PATTERN":
        return pattern_task()
    raise ValueError(f"unknown dataset {dataset!r}")
