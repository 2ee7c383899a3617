"""bench.py workload-construction regressions (CPU, tiny sizes).

The driver runs bench.py unattended on the real chip at the end of
every round; a broken workload constructor would silently cost the
round's headline numbers, so pin the properties the bench relies on."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_banded_workload_certifies_windows():
    """The banded scale workload must carry the v6 window certification
    (tile_lo + src_band bounded by band + 512 certification slack) and
    run one train step end-to-end on CPU."""
    cfg, graph, task, lr, l2 = bench.banded_workload(
        num_nodes=4000, avg_degree=8, features=16, band=256)
    assert graph.tile_lo is not None
    assert 0 < graph.src_band <= 256 + 512 + 8
    dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                  inner=2, iters=1)
    assert dt > 0


def test_cora_workload_shapes():
    cfg, graph, task, lr, l2 = bench.cora_workload()
    e = int(np.asarray(graph.edge_mask).sum())
    n = int(np.asarray(graph.node_mask).sum())
    assert n == 2708 and e > 10556  # self-loops added
    assert cfg.dropout == 0.6       # the official config trains with it


def test_rooflines_monotone():
    """The tile-aware roofline must sit below the idealized payload
    roofline (it adds the random-crossing tax) for any workload."""
    cfg, graph, *_ = bench.banded_workload(
        num_nodes=2000, avg_degree=8, features=16, band=128)
    e = int(np.asarray(graph.edge_mask).sum())
    n = int(np.asarray(graph.node_mask).sum())
    ideal = bench.roofline_edges_per_s(n, e, cfg)
    tile = bench.roofline_tile_edges_per_s(n, e, cfg)
    assert tile < ideal


def test_pubmed_workload_shapes():
    """Pubmed line added round 3: reference's largest transductive graph
    (SURVEY.md §6: 19,717 nodes); one CPU train step must run."""
    cfg, graph, task, lr, l2 = bench.pubmed_workload()
    n = int(np.asarray(graph.node_mask).sum())
    assert n == 19717
    assert cfg.num_classes == 3
    dt = bench.measure_train_step(cfg, graph, task, lr, l2,
                                  inner=1, iters=1)
    assert dt > 0
