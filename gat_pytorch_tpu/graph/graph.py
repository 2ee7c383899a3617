"""Immutable, statically-shaped graph container (a JAX pytree).

TPU-first replacement for the reference's PyG `Data`/`Batch` objects
(reference: models/GATModel.py:120-121 reads `data.x, data.edge_index`).

Invariants every `Graph` carries (established by graph/transforms.py,
enforced by `Graph.validate()`):
  * edges are COO `(src, dst)` **sorted by dst ascending** (stable), so all
    segment reductions run with `indices_are_sorted=True` and an edge
    partition by dst-range is a contiguous slice;
  * arrays are padded to static bucket sizes: `node_mask` / `edge_mask` mark
    real entries. Padding edges carry `src = dst = num_nodes_padded - 1`
    *and* `edge_mask=False`, so even unmasked reductions only corrupt the
    final padding node;
  * self-loop canonicalisation (reference semantics, models/utils.py:47-67:
    drop existing (i,i), append one loop per real node) happens in
    preprocessing, never inside jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.tree_util.register_dataclass,
         data_fields=["send", "recv", "base", "tile_ptr", "tile_base",
                      "rem_send", "rem_recv", "rem_order", "rem_count"],
         meta_fields=["wb", "window", "nb", "eb", "dmax", "rem_e"])
@dataclasses.dataclass(frozen=True)
class BlockLayout:
    """Block-local window layout for the v7 windowed-gather kernel
    (canonicalize(..., src_windows=True) emits it; ops/pallas/
    segment_attention_window.fused_gat_window_v7 consumes it).

    Edges are regrouped per nb-row destination tile, sorted by SENDER
    within each tile, and padded per tile to eb multiples. Pad slots
    carry recv == -1 (they self-mask through the destination one-hot)
    and a benign in-window sender. Every eb-edge block gets its own
    128-aligned window base, so the kernel's one-hot gather/scatter
    contractions run against a wb-row slice of the streamed tile window
    instead of the full band — construction and MXU work per edge drop
    by window/wb (~3x on the banded benchmark)."""
    send: jax.Array       # (E7,) int32 senders, tile-grouped src-sorted
    recv: jax.Array       # (E7,) int32 receivers, -1 on pad slots
    base: jax.Array       # (G,)  int32 128-aligned per-block window base
    tile_ptr: jax.Array   # (T+1,) int32 eb-aligned per-tile edge offsets
    tile_base: jax.Array  # (T,)  int32 128-aligned per-tile window base
    wb: int               # static: block window rows (multiple of 128)
    window: int           # static: tile window rows (multiple of 128)
    nb: int               # static: destination rows per tile
    eb: int               # static: edge slots per block
    dmax: int = -1        # static: 8-aligned bound on consecutive
    #                       tile-base deltas when monotone (sliding d(h)
    #                       accumulator certificate); -1 = non-monotone
    # -- hybrid split-locality layout (compute_hybrid_layout) ----------
    # the OUT-OF-WINDOW remainder edges, routed through the v5 table
    # kernel whose unnormalised single-sweep parts add to the windowed
    # kernel's in one epilogue (models/gat.py hybrid branch). None on
    # plain layouts.
    rem_send: Optional[jax.Array] = None   # (Er,) int32 dst-sorted
    rem_recv: Optional[jax.Array] = None   # (Er,) int32 dst-sorted
    rem_order: Optional[jax.Array] = None  # (Er,) int32 sender-sort perm
    rem_e: int = 0        # static: real (unpadded) remainder edge count
    # sharded hybrid (partition_edges_by_dst(hybrid=True)): per-shard
    # remainder counts as DATA — shards have unequal remainders, and a
    # static can't vary across a stacked layout. (k,) int32 stacked
    # along axis 0 like every other layout array; None on single-device
    # layouts (rem_e covers those).
    rem_count: Optional[jax.Array] = None

    @property
    def num_slots(self) -> int:
        return int(self.send.shape[0])


@partial(jax.tree_util.register_dataclass,
         data_fields=["x", "senders", "receivers", "edge_mask", "node_mask",
                      "y", "train_mask", "val_mask", "test_mask", "graph_ids",
                      "src_order", "tile_lo", "node_order", "block_layout"],
         meta_fields=["num_nodes", "num_edges", "src_band"])
@dataclasses.dataclass(frozen=True)
class Graph:
    """One (possibly block-diagonal-batched) padded graph.

    x:          (N_pad, F) node features.
    senders:    (E_pad,) int32 source node per edge.
    receivers:  (E_pad,) int32 destination node per edge, sorted ascending.
    edge_mask:  (E_pad,) bool, True for real edges.
    node_mask:  (N_pad,) bool, True for real nodes.
    y:          labels — (N_pad,) int32 for single-label tasks or
                (N_pad, C) float for multi-label (PPI).
    train/val/test_mask: (N_pad,) bool or None (transductive splits;
                reference: planetoid_gat.py:27,35,50).
    graph_ids:  (N_pad,) int32 component id after batching (0 if unbatched).
    src_order:  (E_pad,) int32 permutation sorting edges by SENDER, or
                None. The dst-sorted list drives forward segment ops; this
                second view makes the backward's gather-transpose a
                sorted segment reduction too (no unsorted scatter).
    num_nodes / num_edges: static (python int) padded sizes — pytree metadata,
                part of the jit cache key.
    """
    x: jax.Array
    senders: jax.Array
    receivers: jax.Array
    edge_mask: jax.Array
    node_mask: jax.Array
    y: Optional[jax.Array]
    train_mask: Optional[jax.Array]
    val_mask: Optional[jax.Array]
    test_mask: Optional[jax.Array]
    graph_ids: Optional[jax.Array]
    src_order: Optional[jax.Array]
    num_nodes: int
    num_edges: int
    # -- locality metadata (canonicalize(..., src_windows=True)) ----------
    # tile_lo: (ceil(N_pad/128),) int32 — min sender id over the real
    #   edges of each 128-row destination tile (INT32_MAX if empty). The
    #   windowed-gather kernel derives per-tile DMA window bases from it.
    # node_order: (N_pad,) int32 — old node id at each new position when
    #   canonicalize reordered nodes (reorder="rcm"); identity-free None
    #   otherwise. Lets callers map model outputs back to input ids.
    # src_band: static int — max, over 512-row destination tiles, of
    #   (max_src - align8(min_src) + 1) on real edges; 0 = not computed.
    #   Any window W >= round_up(src_band, 8) covers every tile of any
    #   block size nb dividing 512 (tiles nest). Part of the jit cache
    #   key: it gates the windowed kernel path statically.
    tile_lo: Optional[jax.Array] = None
    node_order: Optional[jax.Array] = None
    src_band: int = 0
    # block_layout: v7 block-local window layout (see BlockLayout). Only
    # meaningful on single (unbatched, unsharded) graphs; stack_graphs /
    # batch_specs drop it.
    block_layout: Optional[BlockLayout] = None

    # -- convenience -------------------------------------------------------
    @property
    def edge_index(self) -> jax.Array:
        """(2, E_pad) stacked [senders; receivers] — reference edge layout
        (edge points row0 -> row1; softmax groups by row1)."""
        return jnp.stack([self.senders, self.receivers])

    @property
    def num_real_nodes(self) -> jax.Array:
        return jnp.sum(self.node_mask)

    @property
    def num_real_edges(self) -> jax.Array:
        return jnp.sum(self.edge_mask)

    def replace(self, **kw) -> "Graph":
        return dataclasses.replace(self, **kw)

    def validate(self) -> None:
        """Host-side invariant check (not for use inside jit)."""
        recv = np.asarray(self.receivers)
        send = np.asarray(self.senders)
        emask = np.asarray(self.edge_mask)
        assert self.x.shape[0] == self.num_nodes, "x/node padding mismatch"
        assert recv.shape == (self.num_edges,)
        assert (np.diff(recv) >= 0).all(), "receivers must be dst-sorted"
        assert (send < self.num_nodes).all() and (send >= 0).all()
        pad = ~emask
        if pad.any():
            assert (recv[pad] == self.num_nodes - 1).all(), \
                "padding edges must target the last (padding) node"


def from_numpy(x: np.ndarray,
               senders: np.ndarray,
               receivers: np.ndarray,
               *,
               y: Optional[np.ndarray] = None,
               train_mask: Optional[np.ndarray] = None,
               val_mask: Optional[np.ndarray] = None,
               test_mask: Optional[np.ndarray] = None,
               edge_mask: Optional[np.ndarray] = None,
               node_mask: Optional[np.ndarray] = None,
               graph_ids: Optional[np.ndarray] = None,
               src_order: Optional[np.ndarray] = None,
               tile_lo: Optional[np.ndarray] = None,
               node_order: Optional[np.ndarray] = None,
               src_band: int = 0) -> Graph:
    """Wrap host arrays (already canonicalised/padded) into a Graph."""
    n, e = int(x.shape[0]), int(senders.shape[0])
    if edge_mask is None:
        edge_mask = np.ones(e, dtype=bool)
    if node_mask is None:
        node_mask = np.ones(n, dtype=bool)
    if graph_ids is None:
        graph_ids = np.zeros(n, dtype=np.int32)
    to = jnp.asarray
    return Graph(
        x=to(x), senders=to(senders.astype(np.int32)),
        receivers=to(receivers.astype(np.int32)),
        edge_mask=to(edge_mask), node_mask=to(node_mask),
        y=None if y is None else to(y),
        train_mask=None if train_mask is None else to(train_mask),
        val_mask=None if val_mask is None else to(val_mask),
        test_mask=None if test_mask is None else to(test_mask),
        graph_ids=to(graph_ids),
        src_order=None if src_order is None
        else to(src_order.astype(np.int32)),
        num_nodes=n, num_edges=e,
        tile_lo=None if tile_lo is None else to(tile_lo.astype(np.int32)),
        node_order=None if node_order is None
        else to(node_order.astype(np.int32)),
        src_band=int(src_band))
