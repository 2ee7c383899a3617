"""Train/eval CLI — the reference's `python train.py` surface
(reference: train.py:50-71), plus TPU-specific flags.

Usage:
    python -m gat_pytorch_tpu.cli.train --dataset Cora
    python -m gat_pytorch_tpu.cli.train --dataset PPI --num_epochs 200
    python -m gat_pytorch_tpu.cli.train --dataset Cora --exec_type load
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train a TPU-native GAT on one of the five datasets")
    # reference flags (train.py:52-58)
    p.add_argument("--dataset", default="Cora",
                   choices=["Cora", "Citeseer", "Pubmed", "PPI", "PATTERN"])
    p.add_argument("--num_epochs", type=int)
    p.add_argument("--l2_reg", type=float)
    p.add_argument("--learning_rate", type=float)
    p.add_argument("--patience", type=int)
    p.add_argument("--exec_type", default="train", choices=["train", "load"])
    # extras
    p.add_argument("--attention_reward", type=float)
    p.add_argument("--attention_penalty", type=float)
    p.add_argument("--const_attention", action="store_true", default=None)
    p.add_argument("--paper_faithful", action="store_true", default=None)
    p.add_argument("--batch_size", type=int)
    p.add_argument("--seed", type=int)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--checkpoint_every_n_epochs", type=int, default=None,
                   help="also save <checkpoint_dir>/epoch-N snapshots "
                        "(the reference's PPI-{1,5,20,50,100}epochs "
                        "weight-vis sweep artifacts)")
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu for local debugging)")
    p.add_argument("--synthetic", action="store_true", default=None,
                   help="force synthetic data even if real files exist")
    p.add_argument("--metrics_file", default=None,
                   help="JSONL stream of per-epoch metrics")
    p.add_argument("--tensorboard_dir", default=None)
    p.add_argument("--track_grads", action="store_true", default=None,
                   help="gradient histograms to TensorBoard")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--backend", default=None,
                   choices=["auto", "xla", "pallas"],
                   help="segment-attention compute backend")
    p.add_argument("--layer_type", default=None,
                   choices=["custom", "naive"],
                   help="layer implementation: 'naive' is the runtime "
                        "oracle (the reference's PyG-GATConv layer_type "
                        "switch, run_config.py:4-6)")
    p.add_argument("--sampling_fanouts", default=None,
                   help="neighbor-sampled minibatch training, e.g. '10,10'"
                        " (transductive datasets)")
    p.add_argument("--sampling_batch_size", type=int, default=None)
    p.add_argument("--reorder", default=None, choices=["rcm", "cluster"],
                   help="relabel nodes and emit the windowed-kernel "
                        "block layout: 'rcm' (reverse Cuthill-McKee, "
                        "banded fast path) or 'cluster' (capped label "
                        "propagation + hybrid split-locality layout for "
                        "community-structured graphs); labels/masks/"
                        "outputs stay consistent")
    return p


def run(config) -> dict:
    """Programmatic entry (reference: train.run, train.py:12-47).
    Returns the final test metrics."""
    from ..data import datasets, loader
    from ..train import optim as O
    from ..train.tasks import make_task
    from ..train.trainer import Trainer

    name = config.dataset
    task = make_task(name, attention_reward=config.attention_reward,
                     attention_penalty=config.attention_penalty)
    synth = config.synthetic
    if config.layer_type == "naive":
        os.environ["GAT_TPU_BACKEND"] = "naive"
    elif config.backend and config.backend != "auto":
        # _resolve_backend consults this env override (models/gat.py)
        os.environ["GAT_TPU_BACKEND"] = config.backend

    sampled = None
    if name in ("Cora", "Citeseer", "Pubmed"):
        raw = datasets.load_planetoid(name, synthetic_override=synth,
                                      seed=config.seed)
        _ro = getattr(config, "reorder", None)
        g = loader.transductive_graph(
            raw, reorder=_ro, src_windows=_ro is not None,
            hybrid=_ro == "cluster")
        train_data, val_data, test_data = [g], [g], [g]
        reshuffle = None
        if config.sampling_fanouts:
            from ..data.sampling import NeighborSampledBatcher
            import numpy as np
            fanouts = [int(v) for v in config.sampling_fanouts.split(",")]
            seeds = np.nonzero(raw.train_mask)[0]
            sampled = NeighborSampledBatcher(
                raw.x, raw.senders, raw.receivers, raw.y, seeds,
                config.sampling_batch_size, fanouts, seed=config.seed)
            train_data = sampled.epoch(0)
            reshuffle = sampled.epoch
    elif name == "PPI":
        train = datasets.load_ppi("train", synth, config.seed)
        val = datasets.load_ppi("val", synth, config.seed)
        test = datasets.load_ppi("test", synth, config.seed)
        batcher = loader.InductiveBatcher(train, config.batch_size,
                                          seed=config.seed)
        train_data = batcher.epoch(0)
        reshuffle = batcher.epoch
        val_data = loader.InductiveBatcher(
            val, config.batch_size, shuffle=False).epoch()
        test_data = loader.InductiveBatcher(test, 1, shuffle=False).epoch()
    else:  # PATTERN
        train = datasets.load_pattern("train", synth, config.seed)
        val = datasets.load_pattern("val", synth, config.seed)
        test = datasets.load_pattern("test", synth, config.seed)
        batcher = loader.InductiveBatcher(train, config.batch_size,
                                          seed=config.seed)
        train_data = batcher.epoch(0)
        reshuffle = batcher.epoch
        val_data = loader.InductiveBatcher(
            val, config.batch_size, shuffle=False).epoch()
        test_data = loader.InductiveBatcher(test, 1, shuffle=False).epoch()

    plateau = (O.ReduceLROnPlateau(factor=0.5, patience=5, min_lr=1e-6)
               if name == "PATTERN" else None)  # reference: pattern_gat:63-70
    ckpt_dir = config.checkpoint_dir
    trainer = Trainer(cfg=config.gat_config(), task=task,
                      learning_rate=config.learning_rate,
                      weight_decay=config.l2_reg,
                      max_epochs=config.num_epochs,
                      patience=config.patience, plateau=plateau,
                      checkpoint_dir=ckpt_dir, seed=config.seed,
                      log_every=config.log_every,
                      metrics_file=config.metrics_file,
                      tensorboard_dir=config.tensorboard_dir,
                      track_grads=config.track_grads,
                      checkpoint_every_n_epochs=(
                          config.checkpoint_every_n_epochs))

    if config.exec_type == "load":
        if not ckpt_dir or not os.path.exists(os.path.join(ckpt_dir, "best")):
            print("There is no saved checkpoint for this dataset!")
            return {}
        import jax
        from ..models.gat import init_gat_model
        like = init_gat_model(jax.random.key(0), config.gat_config())
        params = Trainer.load_checkpoint(ckpt_dir, like)["params"]
        metrics = trainer.evaluate(params, test_data)
    else:
        if name in ("Cora", "Citeseer", "Pubmed") and sampled is None:
            # transductive full-graph: one graph/epoch -> scan whole epoch
            # blocks on-device (one dispatch per 50 epochs)
            result = trainer.fit_compiled(train_data[0])
        else:
            # inductive / sampled: scan each epoch's minibatches on-device
            result = trainer.fit_scanned_epochs(train_data, val_data,
                                                reshuffle=reshuffle)
        metrics = trainer.evaluate(result.params, test_data)
        metrics["best_val_loss"] = result.best_val_loss
        metrics["best_epoch"] = result.best_epoch
        metrics["epochs_run"] = len(result.history)
        metrics["wall_time_s"] = round(result.wall_time_s, 2)
    print(json.dumps(metrics))
    return metrics


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from ..utils.config import get_config
    overrides = {k: v for k, v in vars(args).items()
                 if v is not None and k not in ("dataset", "platform",
                                                "log_every", "metrics_file")}
    config = get_config(args.dataset, **overrides)
    if datasets_synthetic_banner(args.dataset):
        print(f"[data] real {args.dataset} files not found -> synthetic "
              f"stand-in (set GAT_TPU_DATA to use real data)",
              file=sys.stderr)
    config.log_every = args.log_every
    config.metrics_file = args.metrics_file
    run(config)
    return 0


def datasets_synthetic_banner(name: str) -> bool:
    from ..data import datasets
    try:
        return datasets.is_synthetic(name)
    except Exception:
        return False


if __name__ == "__main__":
    sys.exit(main())
