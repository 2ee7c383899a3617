"""Device-mesh construction for multi-chip GAT training.

The reference is single-device (SURVEY.md §2.18 — no torch.distributed,
no NCCL anywhere); this module supplies the scale-out story the TPU way:
a named `jax.sharding.Mesh` with two logical axes:

  * ``data`` — whole graphs per batch (DP; PPI/PATTERN minibatches),
  * ``edge`` — contiguous ranges of the dst-sorted edge list of each graph
    (the GNN analog of sequence/context parallelism: neighbourhood softmax
    partials are combined with psum over this axis, models/gat.py).

Collectives ride ICI when both axes are laid out within a slice; choose
`data` as the outer (DCN-crossing) axis on multi-host pods.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh  # noqa: F401  (re-exported)

DATA_AXIS = "data"
EDGE_AXIS = "edge"


def make_mesh(data: Optional[int] = None,
              edge: Optional[int] = None,
              *,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, edge) mesh over the available devices.

    Defaults: all devices on the edge axis (single-graph transductive
    workloads want maximum edge parallelism); pass `data` to carve off a
    data-parallel axis for minibatched inductive workloads.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and edge is None:
        data, edge = 1, n
    elif data is None:
        data = n // edge
    elif edge is None:
        edge = n // data
    if data * edge != n:
        raise ValueError(f"mesh {data}x{edge} != {n} devices")
    arr = np.asarray(devices).reshape(data, edge)
    return Mesh(arr, (DATA_AXIS, EDGE_AXIS))
