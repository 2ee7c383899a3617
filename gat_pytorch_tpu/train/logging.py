"""Metric logging: JSONL stream + optional TensorBoard (SURVEY.md §5.5).

The reference logs scalars via Lightning self.log and histograms of
unnormalised attention / gradients to TensorBoard (reference:
models/GATModel.py:216-221, 237-253). Equivalent here:

  * scalars: every epoch row -> JSONL (machine-readable) and/or
    TensorBoard via torch.utils.tensorboard (torch is CPU-only in this
    image; the writer is pure host code).
  * histograms: `log_histogram` for per-layer attention stats and
    gradient distributions, called by the Trainer when track_grads-style
    options are enabled.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    """Composite logger: JSONL file and/or TensorBoard event files."""

    def __init__(self, jsonl_path: Optional[str] = None,
                 tensorboard_dir: Optional[str] = None):
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._tb = None
        if tensorboard_dir:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(tensorboard_dir)

    def log_scalars(self, step: int, row: Dict[str, float]) -> None:
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, **row}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in row.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    self._tb.add_scalar(k, v, step)

    def log_histogram(self, step: int, tag: str, values) -> None:
        if self._tb:
            self._tb.add_histogram(tag, np.asarray(values), step)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
            self._jsonl = None
        if self._tb:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
