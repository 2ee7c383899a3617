"""Visualisation subsystem: attention stats + headless plot rendering."""

import os

import matplotlib
matplotlib.use("Agg")

import numpy as np
import jax
import pytest

from gat_pytorch_tpu.graph import transforms as T
from gat_pytorch_tpu.models import gat
from gat_pytorch_tpu.vis import attention as A
from gat_pytorch_tpu.vis import plots as P


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n = 60
    senders = np.repeat(np.arange(n), 4)
    receivers = rng.integers(0, n, n * 4)
    x = rng.normal(size=(n, 10)).astype(np.float32)
    y = rng.integers(0, 3, n).astype(np.int32)
    graph = T.canonicalize(x, senders, receivers, y=y)
    cfg = gat.GATConfig(
        num_input_node_features=10, num_layers=2,
        num_heads_per_layer=[2, 1], heads_concat_per_layer=[True, False],
        head_output_features_per_layer=[10, 8, 3], num_classes=3,
        add_skip_connection=[False, False], dropout=0.0)
    params = gat.init_gat_model(jax.random.key(0), cfg)
    _, att = A.extract_attention(params, cfg, graph)
    return graph, cfg, params, att


def test_neighbourhood_slices_cover_all_real_edges(setup):
    graph, *_ = setup
    nbrs = A.neighbourhood_slices(graph)
    total = sum(v.size for v in nbrs.values())
    assert total == int(np.asarray(graph.edge_mask).sum())
    recv = np.asarray(graph.receivers)
    for n, idx in nbrs.items():
        assert (recv[idx] == n).all()


def test_attention_rows_are_distributions(setup):
    graph, cfg, params, att = setup
    nbrs = A.neighbourhood_slices(graph)
    for alpha in att:
        for n, idx in nbrs.items():
            s = alpha[idx].sum(axis=0)
            np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_entropies_bounded_by_uniform(setup):
    graph, cfg, params, att = setup
    ents, unis = A.attention_entropies(att[0], graph)
    assert ents.shape == unis.shape
    assert (ents <= unis + 1e-5).all()      # uniform maximises entropy
    assert (ents >= -1e-7).all()


def test_degree_scaled_weights_mean_one_under_const(setup):
    """ConstGAT (uniform attention) -> alpha*deg == 1 exactly."""
    graph, cfg, params, _ = setup
    ccfg = gat.GATConfig(**{**cfg.__dict__, "const_attention": True})
    cparams = gat.init_gat_model(jax.random.key(1), ccfg)
    _, att = A.extract_attention(cparams, ccfg, graph)
    w, uni = A.degree_scaled_weights(att[0], graph)
    np.testing.assert_allclose(w, 1.0, rtol=1e-4)


def test_plots_render(tmp_path, setup):
    graph, cfg, params, att = setup
    f1 = P.draw_entropy_histogram(att, graph, "Test",
                                  out=str(tmp_path / "e.png"))
    f2 = P.draw_weights_histogram(att, graph, "Test",
                                  out=str(tmp_path / "w.png"))
    node = int(np.asarray(graph.receivers)[0])
    f3 = P.draw_neighbour_attention_distribution(
        att, graph, node, out=str(tmp_path / "n.png"))
    for f, name in [(f1, "e"), (f2, "w"), (f3, "n")]:
        assert os.path.getsize(tmp_path / f"{name}.png") > 1000
    import matplotlib.pyplot as plt
    plt.close("all")


def test_vis_cli_end_to_end(tmp_path):
    from gat_pytorch_tpu.cli.vis import main
    rc = main(["--dataset", "Cora", "--vis_type", "Entropy",
               "--out_dir", str(tmp_path), "--synthetic"])
    assert rc == 0
    assert os.path.exists(tmp_path / "Cora-Entropy.png")


def test_vis_cli_orbax_epoch_snapshot(tmp_path):
    """vis CLI loads our own Orbax epoch-N snapshots (the artifacts the
    reference's PPI weight-vis sweep consumes, produced here by
    checkpoint_every_n_epochs)."""
    from gat_pytorch_tpu.cli.train import run as train_run
    from gat_pytorch_tpu.cli.vis import main
    from gat_pytorch_tpu.utils.config import get_config
    cfg = get_config("Cora", synthetic=True)
    cfg.num_epochs = 1
    cfg.checkpoint_dir = str(tmp_path / "ck")
    cfg.checkpoint_every_n_epochs = 1
    cfg.log_every = 0
    train_run(cfg)
    snap = str(tmp_path / "ck" / "epoch-1")
    assert os.path.isdir(snap)
    rc = main(["--dataset", "Cora", "--vis_type", "Weight",
               "--checkpoint_path", snap, "--out_dir", str(tmp_path),
               "--synthetic"])
    assert rc == 0
    assert os.path.exists(tmp_path / "Cora-Weight.png")


def test_vis_cli_reference_checkpoint(tmp_path):
    ckpt = "/root/reference/checkpoints/Cora-100epochs.ckpt"
    if not os.path.exists(ckpt):
        pytest.skip("reference checkpoints not mounted")
    from gat_pytorch_tpu.cli.vis import main
    rc = main(["--dataset", "Cora", "--vis_type", "Weight",
               "--checkpoint_path", ckpt, "--out_dir", str(tmp_path),
               "--synthetic"])
    assert rc == 0
    assert os.path.exists(tmp_path / "Cora-Weight.png")
