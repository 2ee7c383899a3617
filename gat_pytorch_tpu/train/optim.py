"""Optimizer and LR scheduling.

- `adam_l2`: Adam with torch-style weight decay (L2 term added to the
  gradient BEFORE the moment updates — `torch.optim.Adam(weight_decay=)`
  semantics, reference: models/GATModel.py:269-271), with an injectable
  learning rate so ReduceLROnPlateau can change it without recompiling.
- `ReduceLROnPlateau`: host-side state machine matching
  torch.optim.lr_scheduler.ReduceLROnPlateau (reference:
  models/pattern_gat.py:63-70 — factor 0.5, patience 5, min_lr 1e-6,
  mode 'min', default rel threshold 1e-4).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax


def adam_l2(learning_rate: float, weight_decay: float = 0.0,
            b1: float = 0.9, b2: float = 0.999,
            eps: float = 1e-8) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent. Wrapped in
    `inject_hyperparams` so `opt_state.hyperparams['learning_rate']` can be
    mutated between steps (plateau scheduler) without retracing.

    GAT_TPU_FLAT_OPT=1 runs the inner chain under optax.flatten
    (params/grads raveled into ONE vector -> a single fused elementwise
    update; bit-identical math). Measured round 5: the DEVICE step gets
    faster (Cora scanned body 204.7 -> 188.9 us profiled) but the WALL
    step gets ~6% SLOWER (107.9M vs 114.3M edges/s, same session A/B) —
    the ravel/unravel around the scan carry costs more end-to-end than
    the fused update saves. Default OFF; the knob stays for re-probing
    on future toolchains."""
    import os

    def make_lr(learning_rate):
        tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
        tx += [optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
               optax.scale_by_learning_rate(learning_rate)]
        chain = optax.chain(*tx)
        if os.environ.get("GAT_TPU_FLAT_OPT", "0") == "1":
            chain = optax.flatten(chain)
        return chain

    return optax.inject_hyperparams(make_lr)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Mutate the injected learning rate inside an inject_hyperparams
    state (no retrace: lr is a scalar leaf of the state pytree)."""
    old = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=old.dtype)
    return opt_state


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau LR scheduler (torch semantics, mode='min',
    threshold_mode='rel')."""
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 1e-6
    threshold: float = 1e-4
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float, lr: float) -> float:
        """Feed one validation metric; returns the (possibly reduced) lr."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad = 0
        return lr


@dataclasses.dataclass
class EarlyStopping:
    """Lightning EarlyStopping(monitor, patience, mode='min') semantics
    (reference: data_utils.py:26-33, patience 100, min_delta 0)."""
    patience: int = 100
    min_delta: float = 0.0
    best: float = float("inf")
    wait: int = 0

    def update(self, metric: float) -> bool:
        """Returns True when training should stop."""
        if metric < self.best - self.min_delta:
            self.best = metric
            self.wait = 0
        else:
            self.wait += 1
        return self.wait >= self.patience
