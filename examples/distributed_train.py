"""Multi-chip training example: (data, edge) mesh with shard_map steps.

Runs anywhere: on a TPU slice it uses the real chips; on CPU it
simulates an 8-device mesh (the same SPMD program the driver's
dryrun_multichip validates). On a multi-host pod, initialize with
parallel.multihost first — the step functions are unchanged.

    python examples/distributed_train.py --devices 8 --platform cpu
    python examples/distributed_train.py                 # real devices
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=None,
                   help="simulate N CPU devices (default: real devices)")
    p.add_argument("--platform", default=None)
    p.add_argument("--data_axis", type=int, default=2)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--layout", default="cut", choices=["cut", "dst_owned"],
                   help="dst_owned = boundary-free partition (one "
                        "all_gather/layer; parallel/partition.py)")
    args = p.parse_args(argv)

    if args.devices:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)

    import numpy as np

    from gat_pytorch_tpu import GATConfig, Trainer, parallel
    from gat_pytorch_tpu.data import synthetic
    from gat_pytorch_tpu.data.loader import InductiveBatcher
    from gat_pytorch_tpu.train.tasks import make_task

    n_dev = len(jax.devices())
    data = min(args.data_axis, n_dev)
    while n_dev % data:
        data -= 1
    mesh = parallel.make_mesh(data=data, edge=n_dev // data)
    print(f"mesh: data={mesh.shape['data']} x edge={mesh.shape['edge']} "
          f"on {jax.devices()[0].platform}")

    graphs = synthetic.make_ppi_like("train", seed=0, num_graphs=8)
    val = synthetic.make_ppi_like("val", seed=1, num_graphs=4)
    batcher = InductiveBatcher(graphs, batch_size=1, seed=0)
    val_batches = InductiveBatcher(val, 1, shuffle=False).epoch()

    cfg = GATConfig(
        num_input_node_features=50, num_layers=3,
        num_heads_per_layer=[4, 4, 6],
        heads_concat_per_layer=[True, True, False],
        head_output_features_per_layer=[50, 64, 64, 121],
        num_classes=121, add_skip_connection=[False, True, False],
        dropout=0.0)
    trainer = Trainer(cfg=cfg, task=make_task("PPI"), learning_rate=5e-3,
                      max_epochs=args.epochs, log_every=1)
    result = trainer.fit_sharded(mesh, batcher.epoch(0), val_batches,
                                 reshuffle=batcher.epoch,
                                 dst_owned=args.layout == "dst_owned")
    print(f"best val loss {result.best_val_loss:.4f} "
          f"@ epoch {result.best_epoch}, "
          f"{result.wall_time_s:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
