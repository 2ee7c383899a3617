"""Numpy oracle for the reference GAT math.

An independent, dense/naive transcription of the *behaviour* documented in
SURVEY.md §3.5 (reference models/gat_layer.py:42-140 and
models/GATModel.py:120-151), written against unpadded edge lists. Used to
verify the JAX implementation (which is heavily restructured for TPU:
node-score decomposition, masked padding, sorted segments) produces
identical numbers.
"""

from __future__ import annotations

import numpy as np


def leaky_relu(x, slope):
    return np.where(x > 0, x, slope * x)


def ref_gat_layer(x, senders, receivers, W, a, *, num_heads, out_features,
                  concat, const_attention=False, paper_faithful=False,
                  slope=None):
    """x: (N, F_in); senders/receivers: (E,) already including self-loops.
    W: (NH*F_out, F_in) torch layout. a: (NH, NH*2F_out) torch layout, or
    (NH, 2F_out) when paper_faithful. Returns (out, alpha)."""
    n = x.shape[0]
    e = senders.shape[0]
    nh, f = num_heads, out_features
    if slope is None:
        slope = 0.2 if paper_faithful else 0.01

    h = (x @ W.T).reshape(n, nh, f)
    hs, hd = h[senders], h[receivers]              # (E, NH, F)

    if const_attention:
        logits = np.zeros((e, nh), dtype=x.dtype)
    else:
        if paper_faithful:
            logits = (hs * a[None, :, :f]).sum(-1) + (
                hd * a[None, :, f:]).sum(-1)
            logits = leaky_relu(logits, slope)
            # numerics-neutral per-segment max subtraction inside softmax
            seg_max = np.full((n, nh), -np.inf)
            np.maximum.at(seg_max, receivers, logits)
            logits = logits - seg_max[receivers]
        else:
            pairs = np.concatenate([hs, hd], axis=-1).reshape(e, nh * 2 * f)
            logits = pairs @ a.T                   # (E, NH)
            logits = logits - logits.max()         # global cap, pre-LeakyReLU
            logits = leaky_relu(logits, slope)

    ex = np.exp(logits)
    denom = np.zeros((n, nh), dtype=ex.dtype)
    np.add.at(denom, receivers, ex)
    eps = 0.0 if paper_faithful else 1e-8
    alpha = ex / (denom[receivers] + eps)

    weighted = hs * alpha[:, :, None]
    out = np.zeros((n, nh, f), dtype=x.dtype)
    np.add.at(out, receivers, weighted)
    out = out.reshape(n, nh * f) if concat else out.mean(axis=1)
    return out, alpha


def ref_gat_model(x, senders, receivers, layer_params, layer_cfgs,
                  skip_params, skip_flags, concat_flags, heads, feats):
    """Stack with dropout disabled (eval mode): dropout -> layer -> skip ->
    ELU between layers. layer_params: list of dict(W=torch (out,in),
    a=torch (NH, NH*2F)). skip_params: list (per skip layer, in order) of
    None (identity) or torch (out,in) weight."""
    skip_count = 0
    att = []
    for i, (p, c) in enumerate(zip(layer_params, layer_cfgs)):
        layer_input = x
        out, alpha = ref_gat_layer(x, senders, receivers, p["W"], p.get("a"),
                                   **c)
        att.append(alpha)
        x = out
        if skip_flags[i]:
            sp = skip_params[skip_count]
            skip_count += 1
            skip_out = layer_input if sp is None else layer_input @ sp.T
            if concat_flags[i]:
                x = x + skip_out
            else:
                x = x + skip_out.reshape(-1, heads[i + 1],
                                         feats[i + 1]).mean(axis=1)
        if i != len(layer_params) - 1:
            x = np.where(x > 0, x, np.expm1(x))   # ELU
    return x, att
