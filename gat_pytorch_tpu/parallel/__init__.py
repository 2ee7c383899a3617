"""Multi-chip distribution: mesh, sharding specs, SPMD train/eval steps.

The reference has no distributed path at all (SURVEY.md §2.18/§5.8); this
package is the TPU-native scale-out design: `jax.sharding.Mesh` with
(data, edge) axes, explicit `jax.shard_map` steps with psum-completed
segment reductions, and a GSPMD auto-sharding path.
"""

from .mesh import DATA_AXIS, EDGE_AXIS, make_mesh
from .partition import partition_edges_by_dst
from .sharding import batch_specs, put_batch, replicated, stack_graphs
from .train import make_sharded_eval_step, make_sharded_train_step

__all__ = [
    "DATA_AXIS", "EDGE_AXIS", "make_mesh",
    "batch_specs", "put_batch", "replicated", "stack_graphs",
    "make_sharded_eval_step", "make_sharded_train_step",
    "partition_edges_by_dst",
]
