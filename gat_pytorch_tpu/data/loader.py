"""Batching and device-feed: the reference's PyG DataLoader, TPU-style.

The reference batches whole small graphs by block-diagonal concatenation
(PyG DataLoader, reference: models/GATModel.py:273-287). Here batches are
built host-side by the native graphcore (C++ counting sort + offsetting),
padded to ONE static bucket shared by every batch, so the jitted train
step compiles exactly once per dataset.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import numpy as np

from ..graph import graphcore_binding as core
from ..graph import transforms as T
from ..graph.graph import Graph
from .synthetic import RawGraph


def batch_raw(graphs: Sequence[RawGraph]) -> tuple:
    """Block-diagonal concat. Returns (x, senders, receivers, y, graph_ids)."""
    node_counts = np.array([g.num_nodes for g in graphs], np.int64)
    edge_counts = np.array([g.num_edges for g in graphs], np.int64)
    s = np.concatenate([g.senders for g in graphs])
    r = np.concatenate([g.receivers for g in graphs])
    s, r, gids = core.block_diagonal(s, r, node_counts, edge_counts)
    x = np.concatenate([g.x for g in graphs])
    y = np.concatenate([g.y for g in graphs])
    return x, s, r, y, gids


class InductiveBatcher:
    """Epoch-reshuffled block-diagonal batches with one static bucket.

    Matches DataLoader(batch_size, shuffle=True) semantics (reference:
    GATModel.py:273-278) including the ragged last batch (it is padded to
    the same bucket, so no recompile).
    """

    def __init__(self, graphs: Sequence[RawGraph], batch_size: int,
                 seed: int = 0, shuffle: bool = True,
                 pad_multiple: int = 128):
        self.graphs = list(graphs)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        # worst-case bucket over any batch composition: sum of the largest
        # batch_size graphs (+1 node sink; self-loops add <= nodes edges)
        top_n = sorted((g.num_nodes for g in self.graphs), reverse=True)
        top_e = sorted((g.num_edges for g in self.graphs), reverse=True)
        worst_n = sum(top_n[:batch_size]) + 1
        worst_e = sum(top_e[:batch_size]) + sum(top_n[:batch_size])
        self.node_bucket = T.round_up(worst_n, pad_multiple)
        self.edge_bucket = T.round_up(worst_e, pad_multiple)

    def __len__(self) -> int:
        return math.ceil(len(self.graphs) / self.batch_size)

    def epoch(self, epoch_idx: int = 0) -> List[Graph]:
        order = np.arange(len(self.graphs))
        if self.shuffle:
            order = self.rng.permutation(len(self.graphs))
        batches = []
        for i in range(0, len(order), self.batch_size):
            chunk = [self.graphs[j] for j in order[i:i + self.batch_size]]
            x, s, r, y, gids = batch_raw(chunk)
            batches.append(T.canonicalize(
                x, s, r, y=y, graph_ids=gids,
                node_bucket=self.node_bucket,
                edge_bucket=self.edge_bucket))
        return batches


def transductive_graph(raw: RawGraph, pad_multiple: int = 128,
                       reorder: str = None,
                       src_windows: bool = False,
                       hybrid: bool = False) -> Graph:
    """Single full-graph Graph with split masks (Planetoid path).

    reorder="rcm" + src_windows=True relabels nodes by reverse
    Cuthill-McKee and emits the windowed/block-local kernel metadata
    (Graph.tile_lo / Graph.block_layout) — labels, masks, and outputs
    are permuted consistently (Graph.node_order maps back), so training
    and metrics are unchanged while the attention kernels run the
    banded fast path when the graph compresses.
    reorder="cluster" + hybrid=True is the ordering+layout for graphs
    RCM cannot band (community-structured, e.g. Pubmed): cluster-local
    edges ride the windowed kernel, the remainder the table kernel
    (transforms.compute_hybrid_layout)."""
    return T.canonicalize(
        raw.x, raw.senders, raw.receivers, y=raw.y,
        train_mask=raw.train_mask, val_mask=raw.val_mask,
        test_mask=raw.test_mask, pad_multiple=pad_multiple,
        reorder=reorder, src_windows=src_windows, hybrid=hybrid)
