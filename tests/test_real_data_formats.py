"""Real-dataset parsers round-tripped against generated raw files.

The environment has no network egress, so the real Planetoid/PPI files
are absent — but the parsers (data/datasets.py) must work when
GAT_TPU_DATA points at them. These tests WRITE files in the exact raw
formats (Kipf/GCN pickles for Planetoid, GraphSAGE JSON/npy for PPI)
and check the loaders reproduce the planted graphs.
"""

import json
import os
import pickle

import numpy as np
import pytest

scipy_sparse = pytest.importorskip("scipy.sparse")

from gat_pytorch_tpu.data import datasets


def _write_planetoid(root, name, n=60, nf=12, nc=4, n_test=15, seed=0):
    rng = np.random.default_rng(seed)
    low = name.lower()
    d = os.path.join(root, name, "raw")
    os.makedirs(d)
    x_all = (rng.random((n, nf)) < 0.3).astype(np.float32)
    y_all = np.eye(nc, dtype=np.int64)[rng.integers(0, nc, n)]
    # Kipf layout: allx/ally = first n-n_test rows, tx/ty = test rows;
    # x/y = the (unused by our loader beyond presence) labeled-train block
    n_rest = n - n_test
    parts = {
        "x": scipy_sparse.csr_matrix(x_all[:20]),
        "y": y_all[:20],
        "allx": scipy_sparse.csr_matrix(x_all[:n_rest]),
        "ally": y_all[:n_rest],
        "tx": scipy_sparse.csr_matrix(x_all[n_rest:]),
        "ty": y_all[n_rest:],
    }
    graph = {}
    for _ in range(n * 3):
        a, b = rng.integers(0, n, 2)
        graph.setdefault(int(a), []).append(int(b))
    parts["graph"] = graph
    for part, val in parts.items():
        with open(os.path.join(d, f"ind.{low}.{part}"), "wb") as f:
            pickle.dump(val, f)
    with open(os.path.join(d, f"ind.{low}.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in range(n_rest, n)))
    return x_all, y_all.argmax(1), graph


def test_planetoid_kipf_format_roundtrip(tmp_path, monkeypatch):
    x_all, labels, graph = _write_planetoid(str(tmp_path), "Cora")
    monkeypatch.setenv("GAT_TPU_DATA", str(tmp_path))
    assert not datasets.is_synthetic("Cora")
    raw = datasets.load_planetoid("Cora")
    np.testing.assert_allclose(raw.x, x_all)
    np.testing.assert_array_equal(raw.y, labels)
    # masks: Cora layout = 140 train / 500 val, but our tiny file has 60
    # nodes; loader uses the spec constants, so just check test mask
    assert raw.test_mask[-15:].all() and not raw.test_mask[:45].any()
    # every written edge appears (symmetrised)
    es = set(zip(raw.senders.tolist(), raw.receivers.tolist()))
    for v, nbrs in graph.items():
        for u in nbrs:
            assert (u, v) in es and (v, u) in es


def test_planetoid_isolated_test_nodes_citeseer(tmp_path, monkeypatch):
    """Citeseer regression: test.index lists a NON-contiguous subset of the
    trailing range (isolated nodes are absent, so tx/ty have fewer rows
    than the range spans). The loader must zero-fill the gaps over
    range(min, max+1) — indexing features[test_idx] directly would
    IndexError with max(test_idx)+1 > allx.rows + tx.rows."""
    rng = np.random.default_rng(3)
    n, nf, nc = 60, 12, 4
    name, low = "Citeseer", "citeseer"
    d = os.path.join(str(tmp_path), name, "raw")
    os.makedirs(d)
    x_all = (rng.random((n, nf)) < 0.3).astype(np.float32)
    y_all = np.eye(nc, dtype=np.int64)[rng.integers(0, nc, n)]
    n_rest = 45                       # trailing range = 45..59 (15 slots)
    listed = np.array([45, 46, 48, 49, 51, 52, 53, 55, 56, 57, 59])
    isolated = sorted(set(range(n_rest, n)) - set(listed))
    # shuffled parse order, as in the real files
    parse_order = rng.permutation(listed)
    parts = {
        "x": scipy_sparse.csr_matrix(x_all[:20]),
        "y": y_all[:20],
        "allx": scipy_sparse.csr_matrix(x_all[:n_rest]),
        "ally": y_all[:n_rest],
        # tx/ty rows correspond to the PARSE ORDER of test.index
        # (Kipf format: tx row j belongs to node test_idx_reorder[j])
        "tx": scipy_sparse.csr_matrix(x_all[parse_order]),
        "ty": y_all[parse_order],
    }
    graph = {}
    for _ in range(n * 3):
        a, b = rng.integers(0, n, 2)
        graph.setdefault(int(a), []).append(int(b))
    parts["graph"] = graph
    for part, val in parts.items():
        with open(os.path.join(d, f"ind.{low}.{part}"), "wb") as f:
            pickle.dump(val, f)
    with open(os.path.join(d, f"ind.{low}.test.index"), "w") as f:
        f.write("\n".join(str(i) for i in parse_order))

    monkeypatch.setenv("GAT_TPU_DATA", str(tmp_path))
    assert not datasets.is_synthetic(name)
    raw = datasets.load_planetoid(name)
    assert raw.x.shape == (n, nf)
    # listed test nodes keep their features/labels
    np.testing.assert_allclose(raw.x[listed], x_all[listed])
    np.testing.assert_array_equal(raw.y[listed], y_all.argmax(1)[listed])
    # isolated nodes zero-filled, excluded from the test mask
    for i in isolated:
        np.testing.assert_array_equal(raw.x[i], 0.0)
        assert not raw.test_mask[i]
    assert raw.test_mask[listed].all()
    # train/val region untouched
    np.testing.assert_allclose(raw.x[:n_rest], x_all[:n_rest])


class _DataLike:
    """Module-level (torch.save-picklable) stand-in for a PyG Data object
    with x / edge_index / y attributes."""

    def __init__(self, x, edge_index, y):
        self.x = x
        self.edge_index = edge_index
        self.y = y


def test_pattern_torch_format_roundtrip(tmp_path, monkeypatch):
    """PATTERN .pt parser against a planted torch-saved file, in both
    shapes the parser understands (list of dicts / list of objects with
    x, edge_index, y attributes — the PyG Data duck-type)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(4)
    d = tmp_path / "PATTERN"
    os.makedirs(d)

    planted = []
    blob = []
    for gi in range(3):
        nn = 10 + 3 * gi
        x = rng.normal(size=(nn, 3)).astype(np.float32)
        ei = rng.integers(0, nn, (2, nn * 2)).astype(np.int64)
        y = rng.integers(0, 2, nn).astype(np.int64)
        planted.append((x, ei, y))
        if gi % 2 == 0:
            blob.append({"x": torch.from_numpy(x),
                         "edge_index": torch.from_numpy(ei),
                         "y": torch.from_numpy(y)})
        else:
            blob.append(_DataLike(torch.from_numpy(x),
                                  torch.from_numpy(ei),
                                  torch.from_numpy(y)))
    for split in ("train", "val", "test"):
        torch.save(blob, d / f"{split}.pt")

    monkeypatch.setenv("GAT_TPU_DATA", str(tmp_path))
    assert not datasets.is_synthetic("PATTERN")
    graphs = datasets.load_pattern("train")
    assert len(graphs) == 3
    for g, (x, ei, y) in zip(graphs, planted):
        np.testing.assert_allclose(g.x, x)
        np.testing.assert_array_equal(g.senders, ei[0])
        np.testing.assert_array_equal(g.receivers, ei[1])
        np.testing.assert_array_equal(g.y, y)


def test_ppi_graphsage_format_roundtrip(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    d = tmp_path / "PPI" / "raw"
    os.makedirs(d)
    sizes = [30, 40]
    n = sum(sizes)
    feats = rng.normal(size=(n, 5)).astype(np.float32)
    labels = (rng.random((n, 7)) > 0.5).astype(np.float32)
    gids = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)])
    links = []
    off = 0
    for s in sizes:
        for _ in range(s * 2):
            a, b = rng.integers(off, off + s, 2)
            links.append({"source": int(a), "target": int(b)})
        off += s
    for tag in ("train", "valid", "test"):
        with open(d / f"{tag}_graph.json", "w") as f:
            json.dump({"links": links}, f)
        np.save(d / f"{tag}_feats.npy", feats)
        np.save(d / f"{tag}_labels.npy", labels)
        np.save(d / f"{tag}_graph_id.npy", gids)
    monkeypatch.setenv("GAT_TPU_DATA", str(tmp_path))
    assert not datasets.is_synthetic("PPI")
    graphs = datasets.load_ppi("train")
    assert len(graphs) == 2
    assert graphs[0].num_nodes == 30 and graphs[1].num_nodes == 40
    np.testing.assert_allclose(graphs[1].x, feats[30:])
    np.testing.assert_allclose(graphs[1].y, labels[30:])
    assert (graphs[1].senders < 40).all()
