"""Graph-batch stacking and sharding specs for the (data, edge) mesh.

`GraphBatch` is just a `Graph` whose array fields carry a leading batch
dimension B (all graphs padded to one bucket, data/loader.py guarantees
this). Sharding layout:

  field                      spec
  x, node_mask, y, splits    P(data)          — nodes replicated over edge
  senders/receivers/e_mask   P(data, edge)    — contiguous dst-ranges/shard

Contiguity matters: receivers are sorted ascending, so an equal split of
the edge axis gives each device a contiguous destination range and the
per-shard segment_sum stays a sorted, atomics-free reduction; only
neighbourhoods cut at shard boundaries need the psum completion
(models/gat.py edge_axis paths).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..graph.graph import BlockLayout, Graph
from .mesh import DATA_AXIS, EDGE_AXIS

# src_order is edge-length and, under the dst-owner layout, holds
# per-shard LOCAL permutations — it must be sliced with the edge axis
_EDGE_FIELDS = frozenset({"senders", "receivers", "edge_mask",
                          "src_order"})
_META_FIELDS = frozenset({"num_nodes", "num_edges", "src_band"})


def _layouts_stackable(graphs: List[Graph]) -> bool:
    bls = [g.block_layout for g in graphs]
    if any(b is None for b in bls):
        return False
    b0 = bls[0]

    def _rshape(b):
        # hybrid remainder fields participate in the tree structure, so
        # layouts differing there would stack into a confusing tree-map
        # error instead of being cleanly dropped (ADVICE r4)
        return (None if b.rem_send is None else b.rem_send.shape, b.rem_e)

    return all(
        (b.wb, b.window, b.nb, b.eb, b.dmax)
        == (b0.wb, b0.window, b0.nb, b0.eb, b0.dmax)
        and b.send.shape == b0.send.shape
        and b.base.shape == b0.base.shape
        and b.tile_ptr.shape == b0.tile_ptr.shape
        and _rshape(b) == _rshape(b0)
        for b in bls)


def stack_graphs(graphs: List[Graph]) -> Graph:
    """Stack same-bucket Graphs along a new leading batch axis.
    Per-graph block_layout is KEPT (stacked) when every graph carries
    one with identical shapes/statics — the dst-owner sharded layouts
    from partition_edges_by_dst(src_windows=True) — and dropped
    otherwise (heterogeneous single-device layouts don't stack)."""
    if not _layouts_stackable(graphs):
        graphs = [g.replace(block_layout=None) for g in graphs]
    g0 = graphs[0]
    for g in graphs[1:]:
        if (g.num_nodes, g.num_edges) != (g0.num_nodes, g0.num_edges):
            raise ValueError("all graphs in a batch must share one bucket")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)


def batch_specs(graph: Graph,
                data_axis: Optional[str] = DATA_AXIS,
                edge_axis: Optional[str] = EDGE_AXIS) -> Graph:
    """A Graph-shaped pytree of PartitionSpecs for a stacked batch
    (leading dim over `data_axis`, edge dim over `edge_axis`)."""
    kw = {}
    for f in dataclasses.fields(Graph):
        if f.name == "block_layout":
            bl = graph.block_layout
            espec = PartitionSpec(data_axis, edge_axis)
            kw[f.name] = None if bl is None else BlockLayout(
                send=espec, recv=espec, base=espec, tile_ptr=espec,
                tile_base=espec, wb=bl.wb, window=bl.window, nb=bl.nb,
                eb=bl.eb, dmax=bl.dmax,
                rem_send=None if bl.rem_send is None else espec,
                rem_recv=None if bl.rem_recv is None else espec,
                rem_order=None if bl.rem_order is None else espec,
                rem_count=None if bl.rem_count is None else espec,
                rem_e=bl.rem_e)
        elif f.name in _META_FIELDS:
            kw[f.name] = getattr(graph, f.name)
        elif getattr(graph, f.name) is None:
            kw[f.name] = None
        elif f.name in _EDGE_FIELDS:
            kw[f.name] = PartitionSpec(data_axis, edge_axis)
        else:
            kw[f.name] = PartitionSpec(data_axis)
    return Graph(**kw)


def put_batch(batch: Graph, mesh: Mesh) -> Graph:
    """Device_put the stacked batch with its NamedShardings (GSPMD path —
    jit on functions over this batch lets XLA insert the collectives; the
    explicit shard_map path in parallel/train.py is the hand-scheduled
    equivalent)."""
    specs = batch_specs(batch)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None
        else jax.device_put(x, NamedSharding(mesh, s)),
        batch, specs,
        is_leaf=lambda x: x is None)


def stack_group_batches(groups: List[Graph], mesh: Mesh) -> Graph:
    """Stack G already-batched Graphs (each with leading data-batch dim B)
    along a NEW leading group axis and device_put with the batch sharding
    pushed one axis right: (G, B, ...) with B over `data`, edges over
    `edge`, G unsharded. `lax.scan` over the leading axis then runs one
    compiled SPMD program per epoch instead of one dispatch per group
    (Trainer.fit_sharded)."""
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *groups)
    specs = batch_specs(groups[0])
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None
        else jax.device_put(x, NamedSharding(mesh, PartitionSpec(None, *s))),
        stacked, specs,
        is_leaf=lambda x: x is None)


def replicated(tree, mesh: Mesh):
    """Fully-replicated NamedSharding for params / train state."""
    sh = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
