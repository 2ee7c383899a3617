"""Naive runtime oracle layer — the `layer_type` A/B implementation.

The reference can build its whole network from PyG's battle-tested
`GATConv` instead of its own layer by flipping one config enum
(reference: run_config.py:4-6, models/GATModel.py:80-89) — its de-facto
correctness oracle. This module is our equivalent second implementation:
a direct, unoptimised transcription of the documented layer behaviour
(SURVEY.md §3.5) using only unsorted jax.ops.segment_sum and dense
concatenation — structurally INDEPENDENT of models/gat.py's node-score
decomposition, sorted-segment ops, and Pallas kernels, so a mismatch
between the two at runtime localises bugs exactly like the reference's
GATConv flip did. Select with RunConfig.layer_type="naive"
(cli: --layer_type naive).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gat_layer_naive(params, cfg, x, senders, receivers, edge_mask,
                    num_nodes: int, *,
                    rng: Optional[jax.Array] = None,
                    training: bool = False,
                    return_attention: bool = False):
    """One GAT layer, straight transcription: gather both endpoints,
    concat, apply `a` to the pair tensor (the reference's (E, NH*2F)
    formulation, models/gat_layer.py:76-82), global cap, LeakyReLU,
    unsorted segment softmax, weighted scatter."""
    nh, f = cfg.num_heads, cfg.out_features
    e = senders.shape[0]
    h = jnp.dot(x, params["W"]).reshape(num_nodes, nh, f)
    hs, hd = h[senders], h[receivers]                       # (E, NH, F)

    if cfg.const_attention:
        logits = jnp.zeros((e, nh), x.dtype)
    else:
        if cfg.paper_faithful:
            a = params["a"]                                  # (NH, 2F)
            logits = (hs * a[None, :, :f]).sum(-1) + (
                hd * a[None, :, f:]).sum(-1)
            logits = jnp.where(logits > 0, logits, cfg.slope * logits)
        else:
            pairs = jnp.concatenate([hs, hd], -1).reshape(e, nh * 2 * f)
            logits = jnp.dot(pairs, params["a"])             # (E, NH)
            cap = jnp.max(jnp.where(edge_mask[:, None], logits, -jnp.inf))
            pre = logits - cap
            logits = jnp.where(pre > 0, pre, cfg.slope * pre)

    masked = jnp.where(edge_mask[:, None], logits, -jnp.inf)
    if cfg.paper_faithful:
        seg_max = jax.ops.segment_max(masked, receivers,
                                      num_segments=num_nodes)
        seg_max = jnp.where(jnp.isfinite(seg_max), seg_max, 0.0)
        masked = jnp.where(edge_mask[:, None], masked - seg_max[receivers],
                           -jnp.inf)
    ex = jnp.where(edge_mask[:, None], jnp.exp(masked), 0.0)
    denom = jax.ops.segment_sum(ex, receivers, num_segments=num_nodes)
    eps = 0.0 if cfg.paper_faithful else 1e-8
    alpha = ex / jnp.where(denom[receivers] + eps > 0,
                           denom[receivers] + eps, 1.0)

    alpha_drop = alpha
    if training and cfg.dropout > 0.0:
        if rng is None:
            raise ValueError("rng required for attention dropout")
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, alpha.shape)
        alpha_drop = jnp.where(keep, alpha / (1.0 - cfg.dropout), 0.0)

    out = jax.ops.segment_sum(hs * alpha_drop[:, :, None], receivers,
                              num_segments=num_nodes)
    out = (out.reshape(num_nodes, nh * f) if cfg.concat
           else out.mean(axis=1))
    if cfg.bias:
        out = out + params["bias"]
    return (out, alpha) if return_attention else out
