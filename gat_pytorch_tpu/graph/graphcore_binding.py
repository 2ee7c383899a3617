"""ctypes binding to the native graphcore library (csrc/graphcore.cpp).

Falls back to numpy implementations with identical semantics when the
shared library hasn't been built (`make -C csrc`). The numpy versions are
also the spec the C++ is tested against (tests/test_graphcore.py).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_graphcore.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.gc_add_remaining_self_loops.restype = ctypes.c_int64
    lib.gc_add_remaining_self_loops.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p]
    lib.gc_sort_by_destination.restype = None
    lib.gc_sort_by_destination.argtypes = [
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p]
    lib.gc_csr_offsets.restype = None
    lib.gc_csr_offsets.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.gc_block_diagonal.restype = None
    lib.gc_block_diagonal.argtypes = [
        i64p, i64p, i64p, i64p, ctypes.c_int64, i64p, i64p, i64p]
    lib.gc_sample_neighbors.restype = ctypes.c_int64
    lib.gc_sample_neighbors.argtypes = [
        i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        i64p, i64p]
    if hasattr(lib, "gc_rcm_order"):
        lib.gc_rcm_order.restype = None
        lib.gc_rcm_order.argtypes = [
            i64p, i64p, ctypes.c_int64, ctypes.c_int64, i64p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def add_remaining_self_loops(senders: np.ndarray, receivers: np.ndarray,
                             num_nodes: int) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    senders, receivers = _i64(senders), _i64(receivers)
    if lib is None:
        keep = senders != receivers
        loop = np.arange(num_nodes, dtype=np.int64)
        return (np.concatenate([senders[keep], loop]),
                np.concatenate([receivers[keep], loop]))
    e = senders.shape[0]
    out_s = np.empty(e + num_nodes, dtype=np.int64)
    out_r = np.empty(e + num_nodes, dtype=np.int64)
    k = lib.gc_add_remaining_self_loops(
        _ptr(senders), _ptr(receivers), e, num_nodes, _ptr(out_s), _ptr(out_r))
    return out_s[:k], out_r[:k]


def sort_by_destination(senders: np.ndarray, receivers: np.ndarray,
                        return_perm: bool = False):
    lib = _load()
    senders, receivers = _i64(senders), _i64(receivers)
    e = senders.shape[0]
    if lib is None or e == 0:
        perm = np.argsort(receivers, kind="stable")
        out = (senders[perm], receivers[perm])
        return out + (perm,) if return_perm else out
    n = int(receivers.max()) + 1 if e else 1
    out_s = np.empty(e, dtype=np.int64)
    out_r = np.empty(e, dtype=np.int64)
    perm = np.empty(e, dtype=np.int64)
    lib.gc_sort_by_destination(_ptr(senders), _ptr(receivers), e, n,
                               _ptr(out_s), _ptr(out_r), _ptr(perm))
    return (out_s, out_r, perm) if return_perm else (out_s, out_r)


def csr_offsets(receivers: np.ndarray, num_nodes: int) -> np.ndarray:
    lib = _load()
    receivers = _i64(receivers)
    if lib is None:
        counts = np.bincount(receivers, minlength=num_nodes)
        return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    out = np.empty(num_nodes + 1, dtype=np.int64)
    lib.gc_csr_offsets(_ptr(receivers), receivers.shape[0], num_nodes,
                       _ptr(out))
    return out


def block_diagonal(senders: np.ndarray, receivers: np.ndarray,
                   node_counts: np.ndarray, edge_counts: np.ndarray
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Offset concatenated per-graph edge lists into one big graph.
    Returns (senders, receivers, graph_ids_per_node)."""
    lib = _load()
    senders, receivers = _i64(senders), _i64(receivers)
    node_counts, edge_counts = _i64(node_counts), _i64(edge_counts)
    total_nodes = int(node_counts.sum())
    if lib is None:
        node_off = np.concatenate([[0], np.cumsum(node_counts)[:-1]])
        offs = np.repeat(node_off, edge_counts)
        gids = np.repeat(np.arange(len(node_counts), dtype=np.int64),
                         node_counts)
        return senders + offs, receivers + offs, gids
    out_s = np.empty_like(senders)
    out_r = np.empty_like(receivers)
    gids = np.empty(total_nodes, dtype=np.int64)
    lib.gc_block_diagonal(_ptr(senders), _ptr(receivers), _ptr(node_counts),
                          _ptr(edge_counts), len(node_counts),
                          _ptr(out_s), _ptr(out_r), _ptr(gids))
    return out_s, out_r, gids


def rcm_order(senders: np.ndarray, receivers: np.ndarray,
              num_nodes: int) -> np.ndarray:
    """Reverse Cuthill-McKee ordering of the symmetrised adjacency:
    returns `order` with order[i] = old node id at new position i.
    Minimises edge bandwidth max|new(u)-new(v)| so dst-sorted edge tiles
    read source rows from a narrow window (the windowed-gather kernel's
    precondition). BFS from a min-degree root per component, neighbours
    in ascending-degree order, labelling reversed."""
    lib = _load()
    senders, receivers = _i64(senders), _i64(receivers)
    if lib is not None and hasattr(lib, "gc_rcm_order"):
        out = np.empty(num_nodes, dtype=np.int64)
        lib.gc_rcm_order(_ptr(senders), _ptr(receivers),
                         senders.shape[0], num_nodes, _ptr(out))
        return out
    # numpy spec/fallback (same traversal; tests pin C++ == this)
    nonloop = senders != receivers
    s, r = senders[nonloop], receivers[nonloop]
    src = np.concatenate([s, r])
    dst = np.concatenate([r, s])
    deg = np.bincount(src, minlength=num_nodes)
    order_adj = np.argsort(src, kind="stable")
    adj = dst[order_adj]
    off = np.concatenate([[0], np.cumsum(deg)])
    by_deg = np.argsort(deg, kind="stable")
    seen = np.zeros(num_nodes, dtype=bool)
    out = np.empty(num_nodes, dtype=np.int64)
    w = 0
    for root in by_deg:
        if seen[root]:
            continue
        seen[root] = True
        queue = [int(root)]
        head = 0
        while head < len(queue):
            v = queue[head]
            head += 1
            out[w] = v
            w += 1
            nb = adj[off[v]:off[v + 1]]
            nb = nb[~seen[nb]]
            nb = np.unique(nb)  # dedupe keeps multi-edges harmless
            nb = nb[np.argsort(deg[nb], kind="stable")]
            seen[nb] = True
            queue.extend(int(u) for u in nb)
    return out[::-1].copy()


def sample_neighbors(offsets: np.ndarray, senders: np.ndarray,
                     seeds: np.ndarray, k: int, seed: int
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform in-neighbour sampling WITHOUT replacement on the CSR view:
    exactly min(k, degree) distinct in-edge slots per seed, every k-subset
    equally likely. Returns (src, dst) edge arrays."""
    lib = _load()
    offsets, senders, seeds = _i64(offsets), _i64(senders), _i64(seeds)
    if lib is None:
        rng = np.random.default_rng(seed)
        src_list, dst_list = [], []
        for v in seeds:
            lo, hi = offsets[v], offsets[v + 1]
            deg = hi - lo
            if deg <= 0:
                continue
            if deg <= k:
                idx = np.arange(lo, hi)
            else:
                idx = lo + rng.choice(deg, size=k, replace=False)
            src_list.append(senders[idx])
            dst_list.append(np.full(len(idx), v, dtype=np.int64))
        if not src_list:
            return (np.empty(0, np.int64), np.empty(0, np.int64))
        return np.concatenate(src_list), np.concatenate(dst_list)
    cap = len(seeds) * k
    out_src = np.empty(cap, dtype=np.int64)
    out_dst = np.empty(cap, dtype=np.int64)
    w = lib.gc_sample_neighbors(_ptr(offsets), _ptr(senders), _ptr(seeds),
                                len(seeds), k, seed, _ptr(out_src),
                                _ptr(out_dst))
    return out_src[:w], out_dst[:w]
