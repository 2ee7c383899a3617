"""Dataset registry: real raw files when available, synthetic otherwise.

The reference downloads via PyG (Planetoid/PPI/GNNBenchmarkDataset,
reference: models/planetoid_gat.py:56-59, ppi_gat.py:61-64,
pattern_gat.py:72-75). This environment has no network egress, so:

  * if `GAT_TPU_DATA` points at a directory containing the standard raw
    files, they are parsed natively (no PyG dependency);
  * otherwise shape-faithful synthetic graphs are generated
    (data/synthetic.py) so everything still trains and evaluates.

Raw layouts understood:
  Planetoid:  $GAT_TPU_DATA/<Name>/raw/ind.<name>.{x,y,tx,ty,allx,ally,
              graph,test.index}   (the Kipf/GCN pickle format)
  PPI:        $GAT_TPU_DATA/PPI/raw/{train,valid,test}_{graph.json,
              feats.npy,labels.npy,graph_id.npy}  (GraphSAGE format)
  PATTERN:    $GAT_TPU_DATA/PATTERN/<split>.pt  (torch-saved dict/list of
              graphs with fields x/edge_index/y — best-effort)
"""

from __future__ import annotations

import json
import os
import pickle

from typing import List, Optional

import numpy as np

from . import synthetic
from .synthetic import RawGraph


def data_root() -> Optional[str]:
    return os.environ.get("GAT_TPU_DATA")


def _planetoid_available(name: str) -> bool:
    root = data_root()
    if not root:
        return False
    d = os.path.join(root, name, "raw")
    return os.path.exists(os.path.join(d, f"ind.{name.lower()}.x"))


def _parse_index_file(path: str) -> np.ndarray:
    return np.array([int(line.strip()) for line in open(path)], np.int64)


def _load_planetoid(name: str) -> RawGraph:
    """Parse the Kipf/GCN pickle format (what PyG's Planetoid reads)."""
    import scipy.sparse as sp
    d = os.path.join(data_root(), name, "raw")
    low = name.lower()

    def load(part):
        with open(os.path.join(d, f"ind.{low}.{part}"), "rb") as f:
            return pickle.load(f, encoding="latin1")

    x, y, tx, ty, allx, ally, graph = (load(p) for p in
                                       ("x", "y", "tx", "ty", "allx",
                                        "ally", "graph"))
    test_idx = _parse_index_file(os.path.join(d, f"ind.{low}.test.index"))
    test_sorted = np.sort(test_idx)

    # Citeseer has isolated test nodes missing from tx/ty (their indices
    # are absent from test.index, leaving gaps in the contiguous range):
    # re-index tx/ty over range(min, max+1) with zero-fill, the canonical
    # Kipf/GCN fix that PyG's Planetoid also applies. No-op for Cora and
    # Pubmed whose test ranges are dense.
    t_min, t_max = int(test_sorted[0]), int(test_sorted[-1])
    full = t_max - t_min + 1
    if full != len(test_sorted):
        tx_ext = sp.lil_matrix((full, allx.shape[1]), dtype=np.float32)
        tx_ext[test_sorted - t_min, :] = tx
        tx = tx_ext
        ty_ext = np.zeros((full, ally.shape[1]), dtype=ally.dtype)
        ty_ext[test_sorted - t_min, :] = ty
        ty = ty_ext

    features = sp.vstack((allx, tx)).tolil()
    features[test_idx, :] = features[test_sorted, :]
    labels = np.vstack((ally, ty))
    labels[test_idx, :] = labels[test_sorted, :]
    n = features.shape[0]
    senders, receivers = [], []
    for v, nbrs in graph.items():
        for u in nbrs:
            if v < n and u < n:
                senders.append(u)
                receivers.append(v)
                senders.append(v)
                receivers.append(u)
    edges = np.unique(np.stack([np.array(senders), np.array(receivers)], 1),
                      axis=0)
    y_idx = labels.argmax(1).astype(np.int64)
    n_train = {"Cora": 140, "Citeseer": 120, "Pubmed": 60}[name]
    train_mask = np.zeros(n, bool)
    train_mask[:n_train] = True
    val_mask = np.zeros(n, bool)
    val_mask[n_train:n_train + 500] = True
    test_mask = np.zeros(n, bool)
    test_mask[test_sorted] = True
    return RawGraph(x=np.asarray(features.todense(), np.float32),
                    senders=edges[:, 0], receivers=edges[:, 1], y=y_idx,
                    train_mask=train_mask, val_mask=val_mask,
                    test_mask=test_mask)


def _ppi_available() -> bool:
    root = data_root()
    return bool(root) and os.path.exists(
        os.path.join(root, "PPI", "raw", "train_graph.json"))


def _load_ppi(split: str) -> List[RawGraph]:
    d = os.path.join(data_root(), "PPI", "raw")
    tag = {"train": "train", "val": "valid", "test": "test"}[split]
    with open(os.path.join(d, f"{tag}_graph.json")) as f:
        g = json.load(f)
    feats = np.load(os.path.join(d, f"{tag}_feats.npy")).astype(np.float32)
    labels = np.load(os.path.join(d, f"{tag}_labels.npy")).astype(np.float32)
    gids = np.load(os.path.join(d, f"{tag}_graph_id.npy")).astype(np.int64)
    links = np.array([[l["source"], l["target"]] for l in g["links"]],
                     np.int64)
    graphs = []
    for gid in np.unique(gids):
        nodes = np.where(gids == gid)[0]
        lo, hi = nodes.min(), nodes.max()
        sel = (links[:, 0] >= lo) & (links[:, 0] <= hi)
        e = links[sel] - lo
        s = np.concatenate([e[:, 0], e[:, 1]])
        r = np.concatenate([e[:, 1], e[:, 0]])
        graphs.append(RawGraph(x=feats[nodes], senders=s, receivers=r,
                               y=labels[nodes]))
    return graphs


def _pattern_available() -> bool:
    root = data_root()
    return bool(root) and os.path.exists(
        os.path.join(root, "PATTERN", "train.pt"))


def _load_pattern(split: str) -> List[RawGraph]:
    import torch
    path = os.path.join(data_root(), "PATTERN", f"{split}.pt")
    blob = torch.load(path, map_location="cpu", weights_only=False)
    graphs = []
    for item in blob:
        x = np.asarray(item["x"] if isinstance(item, dict) else item.x,
                       np.float32)
        ei = np.asarray(item["edge_index"] if isinstance(item, dict)
                        else item.edge_index, np.int64)
        y = np.asarray(item["y"] if isinstance(item, dict) else item.y,
                       np.int64)
        graphs.append(RawGraph(x=x, senders=ei[0], receivers=ei[1], y=y))
    return graphs


# -- public API -------------------------------------------------------------

def load_planetoid(name: str, synthetic_override: Optional[bool] = None,
                   seed: int = 0) -> RawGraph:
    use_real = _planetoid_available(name) if synthetic_override is None \
        else not synthetic_override
    if use_real:
        return _load_planetoid(name)
    return synthetic.make_planetoid_like(name, seed=seed)


def load_ppi(split: str, synthetic_override: Optional[bool] = None,
             seed: int = 0, num_graphs: Optional[int] = None
             ) -> List[RawGraph]:
    use_real = _ppi_available() if synthetic_override is None \
        else not synthetic_override
    if use_real:
        return _load_ppi(split)
    return synthetic.make_ppi_like(split, seed=seed, num_graphs=num_graphs)


def load_pattern(split: str, synthetic_override: Optional[bool] = None,
                 seed: int = 0, num_graphs: Optional[int] = None
                 ) -> List[RawGraph]:
    use_real = _pattern_available() if synthetic_override is None \
        else not synthetic_override
    if use_real:
        return _load_pattern(split)
    return synthetic.make_pattern_like(split, seed=seed,
                                       num_graphs=num_graphs)


def is_synthetic(dataset: str) -> bool:
    """True when the named dataset would be served synthetically."""
    if dataset in ("Cora", "Citeseer", "Pubmed"):
        return not _planetoid_available(dataset)
    if dataset == "PPI":
        return not _ppi_available()
    if dataset == "PATTERN":
        return not _pattern_available()
    raise ValueError(dataset)
