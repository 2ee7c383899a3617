"""Activation parity: reference Lightning checkpoints -> our model.

Imports the reference's trained weights (reference: checkpoints/*.ckpt,
state-dict names per SURVEY.md §2.15) and checks our JAX model produces
the same per-layer activations as the numpy oracle of the reference math
(tests/reference_math.py) — the BASELINE.md "parity" north star, testable
without the real datasets by running both sides on the same random graph.
"""

import os

import jax
import numpy as np
import pytest

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.utils import lightning_import as LI
from gat_pytorch_tpu.utils.config import get_config

from . import reference_math as RM

CKPT_DIR = "/root/reference/checkpoints"

needs_ckpts = pytest.mark.skipif(
    not os.path.isdir(CKPT_DIR), reason="reference checkpoints not mounted")


def random_graph(num_nodes, num_feats, seed=0, deg=5, binary_x=True):
    rng = np.random.default_rng(seed)
    senders = np.repeat(np.arange(num_nodes), deg)
    receivers = rng.integers(0, num_nodes, num_nodes * deg)
    if binary_x:   # planetoid features are 0/1 bags-of-words
        x = (rng.random((num_nodes, num_feats)) < 0.02).astype(np.float32)
    else:
        x = rng.normal(size=(num_nodes, num_feats)).astype(np.float32)
    return x, senders, receivers


def oracle_inputs(x, senders, receivers):
    """Self-loop canonicalisation for the oracle (same semantics as
    transforms.add_remaining_self_loops, unsorted/unpadded)."""
    s, r = T.add_remaining_self_loops(senders, receivers, x.shape[0])
    return s, r


@needs_ckpts
@pytest.mark.parametrize("dataset,nodes", [
    ("Cora", 300), ("Citeseer", 200), ("Pubmed", 400), ("PATTERN", 128),
])
def test_checkpoint_forward_parity(dataset, nodes):
    run_cfg = get_config(dataset)
    cfg = run_cfg.gat_config()
    path = os.path.join(CKPT_DIR, f"{dataset}-100epochs.ckpt")

    params = LI.import_params(path, cfg.num_layers,
                              run_cfg.add_skip_connection)
    torch_layers = LI.reference_layer_arrays(path, cfg.num_layers)
    sd = LI.load_state_dict(path)

    x, senders, receivers = random_graph(
        nodes, cfg.num_input_node_features, seed=hash(dataset) % 2**31,
        binary_x=dataset != "PATTERN")

    # ours: canonicalised padded graph, jit forward
    graph = T.canonicalize(x, senders, receivers)
    out_jax = np.asarray(gat.gat_model_apply(params, cfg, graph,
                                             training=False))
    real = np.asarray(graph.node_mask)
    out_jax = out_jax[real]

    # oracle: unpadded edge list, torch-layout weights
    s, r = oracle_inputs(x, senders, receivers)
    heads = [1] + list(cfg.num_heads_per_layer)
    layer_cfgs = [dict(num_heads=heads[i + 1],
                       out_features=cfg.head_output_features_per_layer[i + 1],
                       concat=cfg.heads_concat_per_layer[i])
                  for i in range(cfg.num_layers)]
    skip_params = []
    j = 0
    for i, flag in enumerate(cfg.add_skip_connection):
        if not flag:
            continue
        w = sd.get(f"skip_layer_list.{j}.weight")
        skip_params.append(w)
        j += 1
    out_ref, _ = RM.ref_gat_model(
        x, s, r, torch_layers, layer_cfgs, skip_params,
        list(cfg.add_skip_connection), list(cfg.heads_concat_per_layer),
        heads, list(cfg.head_output_features_per_layer))

    np.testing.assert_allclose(out_jax, out_ref, rtol=2e-4, atol=2e-4)


@needs_ckpts
def test_checkpoint_forward_parity_pallas_backend():
    """Same parity through the fused Pallas kernel (interpret on CPU)."""
    run_cfg = get_config("Cora")
    cfg = run_cfg.gat_config()
    path = os.path.join(CKPT_DIR, "Cora-100epochs.ckpt")
    params = LI.import_params(path, cfg.num_layers,
                              run_cfg.add_skip_connection)
    x, senders, receivers = random_graph(160, cfg.num_input_node_features,
                                         seed=11)
    graph = T.canonicalize(x, senders, receivers)
    out_x = np.asarray(gat.gat_model_apply(params, cfg, graph,
                                           backend="xla"))
    out_p = np.asarray(gat.gat_model_apply(params, cfg, graph,
                                           backend="pallas"))
    np.testing.assert_allclose(out_p, out_x, rtol=1e-4, atol=1e-5)


@needs_ckpts
def test_training_dynamics_parity_vs_torch():
    """Beyond forward parity: gradients AND one Adam step from
    reference-checkpoint init must match the torch transcription of the
    reference's training semantics (masked CE + Adam(lr, weight_decay),
    reference train.py:12-47, planetoid_gat.py:15-30,
    GATModel.py:269-271). The torch side is autograd + torch.optim.Adam
    — the actual machinery the reference trains with."""
    import torch

    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.tasks import make_task
    from . import reference_torch as RT

    run_cfg = get_config("Cora")
    cfg = run_cfg.gat_config()
    lr, wd = run_cfg.learning_rate, run_cfg.l2_reg
    path = os.path.join(CKPT_DIR, "Cora-100epochs.ckpt")
    params = LI.import_params(path, cfg.num_layers,
                              run_cfg.add_skip_connection)
    sd = LI.load_state_dict(path)

    nodes = 220
    x, senders, receivers = random_graph(nodes, cfg.num_input_node_features,
                                         seed=17)
    rng = np.random.default_rng(23)
    y = rng.integers(0, cfg.num_classes, nodes).astype(np.int32)
    train_mask = np.zeros(nodes, bool)
    train_mask[rng.choice(nodes, 60, replace=False)] = True

    # ---- torch side: loss -> autograd -> Adam step -----------------------
    s, r = oracle_inputs(x, senders, receivers)
    heads = [1] + list(cfg.num_heads_per_layer)
    layer_cfgs = [dict(num_heads=heads[i + 1],
                       out_features=cfg.head_output_features_per_layer[i + 1],
                       concat=cfg.heads_concat_per_layer[i])
                  for i in range(cfg.num_layers)]
    t_layers = [{"W": torch.from_numpy(
                     sd[f"gat_layer_list.{i}.W.weight"].copy()),
                 "a": torch.from_numpy(
                     sd[f"gat_layer_list.{i}.a.weight"].copy())}
                for i in range(cfg.num_layers)]
    loss_t, grads_t, updated_t = RT.torch_train_step(
        torch.from_numpy(x), torch.from_numpy(s.astype(np.int64)),
        torch.from_numpy(r.astype(np.int64)),
        torch.from_numpy(y.astype(np.int64)), torch.from_numpy(train_mask),
        t_layers, layer_cfgs, [], list(cfg.add_skip_connection),
        list(cfg.heads_concat_per_layer), heads,
        list(cfg.head_output_features_per_layer), lr, wd)

    # ---- our side: same loss via the Trainer's train-step machinery ------
    graph = T.canonicalize(x, senders, receivers, y=y,
                           train_mask=train_mask)
    task = make_task("Cora")

    def loss_fn(p):
        logits = gat.gat_model_apply(p, cfg, graph, training=False)
        return task.loss(logits, graph, "train")

    loss_j, grads_j = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=1e-5)

    tx = O.adam_l2(lr, wd)
    updates, _ = jax.jit(tx.update)(grads_j, tx.init(params), params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    # grads: ours are (in, out); torch's (out, in). leaf order W, a per
    # layer (reference_torch.torch_train_step contract)
    for i in range(cfg.num_layers):
        for j, key in enumerate(("W", "a")):
            gt = grads_t[2 * i + j].T
            gj = np.asarray(grads_j["layers"][i][key])
            scale = np.abs(gt).max()
            np.testing.assert_allclose(
                gj, gt, rtol=5e-4, atol=5e-5 * scale,
                err_msg=f"grad mismatch layer {i} {key}")

    # Adam step: where the gradient is decisively nonzero the step-1
    # update is ~ lr*sign(g) and must match tightly; near-zero grads give
    # +-lr flips from float noise (same caveat as test_parallel's SGD
    # choice), so mask them out but require the mask covers >80%.
    for i in range(cfg.num_layers):
        for j, key in enumerate(("W", "a")):
            pt = updated_t[2 * i + j].T
            pj = np.asarray(new_params["layers"][i][key])
            g_ref = grads_t[2 * i + j].T
            # 1e-3 (not 1e-4): Adam's step-1 update is ~lr*sign(g), so an
            # entry whose |g| sits within f32-noise of the cutoff can
            # sign-flip between compilations (observed once as a
            # suite-order flake); coverage is identical at either cutoff
            # (W 0.98+, a 0.50) and 1e-3 gives ~20x margin over the
            # cross-side grad tolerance above
            decisive = np.abs(g_ref) > 1e-3 * max(np.abs(g_ref).max(), 1e-30)
            # >40%: `a`'s cross-head structure leaves roughly half its
            # entries with near-zero gradient on a converged checkpoint
            assert decisive.mean() > 0.4, (i, key, decisive.mean())
            # atol 5e-6 = 0.1% of one lr=5e-3 step: covers Adam's
            # normaliser amplifying f32 noise on small-|g| entries
            np.testing.assert_allclose(
                pj[decisive], pt[decisive], rtol=1e-4, atol=5e-6,
                err_msg=f"adam-updated params mismatch layer {i} {key}")


@needs_ckpts
def test_pattern_pos_weight_historic_value():
    """The shipped PATTERN ckpt was trained with the OLD pos_weight 4.65;
    current reference code uses 1/0.1765 = 5.666 (reference:
    models/pattern_gat.py:13 'previously [4.65]'). Our task constant
    matches the current code; the ckpt records the historic value."""
    from gat_pytorch_tpu.train.tasks import PATTERN_PROP_POS
    sd = LI.load_state_dict(os.path.join(CKPT_DIR, "PATTERN-100epochs.ckpt"))
    pos_weight = float(sd["loss_fn.pos_weight"][0])
    np.testing.assert_allclose(pos_weight, 4.65, rtol=1e-6)
    np.testing.assert_allclose(1.0 / PATTERN_PROP_POS, 5.6657, rtol=1e-4)


@needs_ckpts
def test_import_roundtrip_shapes():
    run_cfg = get_config("PATTERN")
    cfg = run_cfg.gat_config()
    params = LI.import_params(
        os.path.join(CKPT_DIR, "PATTERN-100epochs.ckpt"),
        cfg.num_layers, run_cfg.add_skip_connection)
    init = gat.init_gat_model(jax.random.key(0), cfg)
    got = jax.tree_util.tree_map(lambda a: a.shape, params)
    want = jax.tree_util.tree_map(lambda a: a.shape, init)
    assert got == want
