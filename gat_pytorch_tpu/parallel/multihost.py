"""Multi-host runtime initialisation (SURVEY.md §5.8).

The reference has no distributed backend at all (no torch.distributed
import anywhere — grep-verified in SURVEY §2.18). The TPU-native stack:
`jax.distributed.initialize()` to join a pod slice, then a global mesh
whose `data` axis spans hosts (collectives ride DCN between hosts) and
`edge` axis stays within each host's chips (ICI).

On a pod each process sees only its local devices; arrays for the global
batch are assembled with `jax.make_array_from_process_local_data`. The
same shard_map train step from parallel/train.py runs unchanged — the
mesh is just bigger.

Cannot be exercised in a single-host environment; the code path is
identical to the CPU-simulated multi-device mesh the tests cover, with
initialization and per-process feeding added.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from .mesh import DATA_AXIS, EDGE_AXIS, Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the jax.distributed runtime. No-ops when single-process and
    no coordinator is configured (env: JAX_COORDINATOR_ADDRESS)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def pod_mesh(edge_per_host: Optional[int] = None) -> Mesh:
    """Global (data, edge) mesh over all processes' devices: the edge
    axis spans each host's local chips (ICI-only collectives for the
    per-graph softmax/SpMM psums), the data axis spans hosts (gradient
    psum crosses DCN once per step)."""
    n_local = jax.local_device_count()
    n_total = jax.device_count()
    edge = edge_per_host or n_local
    if n_local % edge != 0:
        raise ValueError(f"edge_per_host {edge} must divide local device "
                         f"count {n_local}")
    data = n_total // edge
    devices = np.asarray(jax.devices()).reshape(data, edge)
    return Mesh(devices, (DATA_AXIS, EDGE_AXIS))


def shard_global_batch(batch, mesh: Mesh):
    """Assemble a process-local batch shard into a global sharded array
    set (jax.make_array_from_process_local_data under the hood)."""
    from jax.sharding import NamedSharding
    from .sharding import batch_specs

    specs = batch_specs(batch)
    return jax.tree_util.tree_map(
        lambda x, s: None if x is None
        else jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x)),
        batch, specs, is_leaf=lambda x: x is None)
