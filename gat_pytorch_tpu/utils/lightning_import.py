"""One-way importer: reference PyTorch-Lightning checkpoints -> our params.

The reference ships trained Lightning ckpts (reference: checkpoints/*,
format documented in SURVEY.md §2.15):
    state_dict:
      gat_layer_list.{i}.W.weight   (NH*F_out, F_in)     torch (out, in)
      gat_layer_list.{i}.a.weight   (NH, NH*2F_out)
      skip_layer_list.{j}.weight    (out, in)            only where skip+proj
      loss_fn.pos_weight            ()                   PATTERN only

Our layout (models/gat.py init_gat_layer): W (F_in, NH*F_out),
a (NH*2F_out, NH), skip w (in, out) — all transposes for
right-multiplication on the MXU. The unpickle stubs out lightning classes
(the env has torch but not pytorch_lightning), keeping only plain tensors.
"""

from __future__ import annotations

import sys
import types
from typing import Dict, List, Optional

import numpy as np

_STUB_PREFIXES = ("pytorch_lightning",)


class _StubModule(types.ModuleType):
    """Module that manufactures empty classes for any attribute — enough
    for pickle to resolve lightning callback/enum references it never
    actually calls."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        t = type(name, (), {})
        setattr(self, name, t)
        return t


def _install_stubs() -> None:
    for mod in [
        "pytorch_lightning",
        "pytorch_lightning.callbacks",
        "pytorch_lightning.callbacks.model_checkpoint",
        "pytorch_lightning.callbacks.early_stopping",
        "pytorch_lightning.utilities",
        "pytorch_lightning.trainer",
        "pytorch_lightning.trainer.connectors",
    ]:
        if mod not in sys.modules:
            sys.modules[mod] = _StubModule(mod)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Raw tensors (numpy) from a Lightning checkpoint, plus metadata."""
    import torch
    _install_stubs()
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {k: np.asarray(v.detach().numpy())
           for k, v in ckpt["state_dict"].items()}
    out["__epoch__"] = np.asarray(ckpt.get("epoch", -1))
    out["__global_step__"] = np.asarray(ckpt.get("global_step", -1))
    return out


def import_params(path: str,
                  num_layers: int,
                  skip_flags: Optional[List[bool]] = None) -> dict:
    """Build a models/gat.py params pytree from a reference checkpoint.

    skip_flags: per-layer add_skip_connection; skip entries are emitted in
    layer order for layers with a skip, `{}` (identity) when the ckpt has
    no projection weight for that slot.
    """
    import jax.numpy as jnp
    sd = load_state_dict(path)
    params: dict = {"layers": [], "skips": []}
    for i in range(num_layers):
        layer = {"W": jnp.asarray(sd[f"gat_layer_list.{i}.W.weight"].T)}
        a_key = f"gat_layer_list.{i}.a.weight"
        if a_key in sd:
            layer["a"] = jnp.asarray(sd[a_key].T)
        params["layers"].append(layer)
    if skip_flags:
        j = 0
        for i, flag in enumerate(skip_flags):
            if not flag:
                continue
            w_key = f"skip_layer_list.{j}.weight"
            if w_key in sd:
                params["skips"].append({"w": jnp.asarray(sd[w_key].T)})
            else:
                params["skips"].append({})
            j += 1
    return params


def reference_layer_arrays(path: str, num_layers: int):
    """Torch-layout (out, in) arrays per layer for the numpy oracle
    (tests/reference_math.py)."""
    sd = load_state_dict(path)
    layers = []
    for i in range(num_layers):
        layers.append({
            "W": sd[f"gat_layer_list.{i}.W.weight"],
            "a": sd.get(f"gat_layer_list.{i}.a.weight"),
        })
    return layers
