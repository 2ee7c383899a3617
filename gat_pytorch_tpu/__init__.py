"""gat_pytorch_tpu — a TPU-native graph-attention (GAT) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
loodvn/gat-pytorch (PyTorch + Lightning + PyG): multi-head attention over
graph edges as SDDMM -> segment-softmax -> SpMM, five dataset tasks
(Cora/Citeseer/Pubmed transductive, PPI inductive multi-label, PATTERN
binary node classification), jit-compiled training, Orbax checkpointing,
attention analysis tooling, and mesh-sharded multi-chip execution.
"""

__version__ = "0.1.0"

from .graph.graph import Graph  # noqa: F401
from .models.gat import (  # noqa: F401
    GATConfig, GATLayerConfig, init_gat_model, gat_model_apply,
    init_gat_layer, gat_layer_apply, calc_attention_norm,
)
from .train.tasks import Task, make_task  # noqa: F401
from .train.trainer import Trainer, TrainState  # noqa: F401
from .utils.config import DATA_CONFIG, RunConfig, get_config  # noqa: F401
