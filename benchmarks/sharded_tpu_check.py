"""Compiled shard_map + Pallas on the real chip (VERDICT r1 weak #2).

Builds a 1-device (data=1, edge=1) Mesh on the TPU and runs the FULL
sharded train step — fused partial kernel forward, fused partial
backward, psum completion, Adam update — COMPILED (no interpret mode),
with backend=pallas. This is the exact SPMD program a multi-chip mesh
runs, proving the sharded+fused path compiles and executes on hardware;
CPU tests can only cover it in interpret mode.

    python benchmarks/sharded_tpu_check.py            # on the TPU
    python benchmarks/sharded_tpu_check.py --steps 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--nodes", type=int, default=4096)
    ap.add_argument("--deg", type=int, default=8)
    ap.add_argument("--dst_owned", action="store_true",
                    help="boundary-free dst-owner layout (with "
                         "GAT_TPU_V5=1 this compiles the sharded v5 "
                         "whole-fusion branch)")
    ap.add_argument("--banded", type=int, default=0,
                    help="senders within BAND of their receiver (the "
                         "bench.py banded workload class); 0 = random")
    ap.add_argument("--clustered", action="store_true",
                    help="community SBM (bench.py clustered workload "
                         "class) with reorder='cluster'; combine with "
                         "--dst_owned --hybrid for the round-5 sharded "
                         "split-locality path")
    ap.add_argument("--hybrid", action="store_true",
                    help="partition with hybrid=True (per-shard "
                         "split-locality layouts: v7 windows + v5 "
                         "remainder)")
    ap.add_argument("--windowed", action="store_true",
                    help="partition with src_windows=True so the "
                         "dst-owner layer runs the v7/v10/v11 windowed "
                         "single-sweep kernels (round-4 sharded path)")
    ap.add_argument("--inner", type=int, default=0,
                    help="scan INNER steps per dispatch (honest per-step "
                         "timing through the ~1 ms/dispatch tunnel; 0 = "
                         "one dispatch per step)")
    ap.add_argument("--bench_model", action="store_true",
                    help="use bench.py's banded/scale model shape "
                         "(heads [8,8], dropout 0) so ms/step compares "
                         "directly to the unsharded official line")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu import parallel
    from gat_pytorch_tpu.graph import transforms as T
    from gat_pytorch_tpu.models import gat
    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.tasks import make_task
    from gat_pytorch_tpu.train.trainer import TrainState
    from gat_pytorch_tpu.utils.platform import is_tpu_backend

    print("backend:", jax.default_backend(), flush=True)
    if not is_tpu_backend():
        print("NOT on TPU — this check only proves anything on hardware",
              file=sys.stderr)

    os.environ["GAT_TPU_BACKEND"] = "pallas"
    mesh = parallel.make_mesh(data=1, edge=len(jax.devices()))

    rng = np.random.default_rng(0)
    n = args.nodes
    if args.clustered:
        communities, homophily = 64, 0.9
        e = n * args.deg
        labels = rng.integers(0, communities, n)
        members = [np.where(labels == c)[0] for c in range(communities)]
        senders = rng.integers(0, n, e)
        receivers = np.empty(e, dtype=np.int64)
        same = rng.random(e) < homophily
        receivers[~same] = rng.integers(0, n, int((~same).sum()))
        for c in range(communities):
            pick = same & (labels[senders] == c)
            receivers[pick] = members[c][rng.integers(
                0, len(members[c]), int(pick.sum()))]
    elif args.banded:
        receivers = rng.integers(0, n, n * args.deg)
        senders = np.clip(
            receivers + rng.integers(-args.banded // 2, args.banded // 2,
                                     n * args.deg),
            0, n - 1)
    else:
        senders = np.repeat(np.arange(n), args.deg)
        receivers = rng.integers(0, n, n * args.deg)
    x = rng.normal(size=(n, 64)).astype(np.float32)
    y = (rng.random((n, 8)) > 0.5).astype(np.float32)
    g = T.canonicalize(x, senders, receivers, y=y,
                       reorder="cluster" if args.clustered else None)
    e_real = int(np.asarray(g.edge_mask).sum())
    if os.environ.get("GAT_TPU_GEMM_DTYPE") == "bfloat16":
        import dataclasses
        g = dataclasses.replace(g, x=g.x.astype(jnp.bfloat16))
    if args.dst_owned:
        from gat_pytorch_tpu.parallel.partition import partition_edges_by_dst
        g, _ = partition_edges_by_dst(g, len(jax.devices()),
                                      pad_multiple=64,
                                      src_windows=(args.windowed
                                                   or args.hybrid),
                                      hybrid=args.hybrid)
        if args.hybrid:
            bl = g.block_layout
            print("hybrid layout:", {
                "slots": int(bl.send.shape[0]), "wb": bl.wb,
                "window": bl.window, "eb": bl.eb, "nb": bl.nb,
                "dmax": bl.dmax,
                "rem_bucket": (0 if bl.rem_send is None
                               else int(bl.rem_send.shape[0])),
                "rem_counts": (None if bl.rem_count is None else
                               np.asarray(bl.rem_count).tolist())},
                flush=True)
        if args.windowed:
            bl = g.block_layout
            print("shard layout:", {"slots": int(bl.send.shape[0]),
                                    "wb": bl.wb, "window": bl.window,
                                    "eb": bl.eb, "nb": bl.nb,
                                    "dmax": bl.dmax}, flush=True)
    batch = parallel.stack_graphs([g])
    if args.windowed or args.hybrid:
        assert batch.block_layout is not None

    if args.bench_model:
        cfg = gat.GATConfig(
            num_input_node_features=64, num_layers=2,
            num_heads_per_layer=[8, 8],
            heads_concat_per_layer=[True, False],
            head_output_features_per_layer=[64, 16, 8], num_classes=8,
            add_skip_connection=[False, False], dropout=0.0)
    else:
        cfg = gat.GATConfig(
            num_input_node_features=64, num_layers=2,
            num_heads_per_layer=[8, 1],
            heads_concat_per_layer=[True, False],
            head_output_features_per_layer=[64, 16, 8], num_classes=8,
            add_skip_connection=[False, False], dropout=0.2)
    task = make_task("PPI", attention_penalty=0.0)
    tx = O.adam_l2(1e-3)
    params = gat.init_gat_model(jax.random.key(0), cfg)
    state = parallel.replicated(
        TrainState(params=params, opt_state=tx.init(params),
                   rng=jax.random.key(1), step=jnp.int32(0)), mesh)
    sb = parallel.put_batch(batch, mesh)

    step = parallel.make_sharded_train_step(cfg, task, tx, mesh,
                                            dst_owned=args.dst_owned,
                                            jit=args.inner == 0)
    if args.inner:
        @jax.jit
        def block(state, sb):
            def body(s, _):
                s, mets = step(s, sb)
                return s, mets["train_loss"]
            return jax.lax.scan(body, state, None, length=args.inner)

        t0 = time.perf_counter()
        state, losses = block(state, sb)
        loss0 = float(np.asarray(losses)[0])
        compile_s = time.perf_counter() - t0
        assert np.isfinite(loss0), loss0
        best = float("inf")
        for _ in range(max(args.steps // args.inner, 1)):
            t0 = time.perf_counter()
            state, losses = block(state, sb)
            lossN = float(np.asarray(losses)[-1])  # forces completion
            best = min(best, (time.perf_counter() - t0) / args.inner)
        dt = best
    else:
        t0 = time.perf_counter()
        state, mets = step(state, sb)
        jax.block_until_ready(mets)
        compile_s = time.perf_counter() - t0
        loss0 = float(mets["train_loss"])
        assert np.isfinite(loss0), mets

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, mets = step(state, sb)
        lossN = float(np.asarray(mets["train_loss"]))  # host sync
        dt = (time.perf_counter() - t0) / args.steps
    print(json.dumps({
        "check": "sharded_pallas_compiled_train_step",
        "layout": "dst_owned" if args.dst_owned else "cut_neighbourhood",
        "windowed": args.windowed,
        "hybrid": args.hybrid,
        "clustered": args.clustered,
        "banded": args.banded,
        "v5": os.environ.get("GAT_TPU_V5", "auto"),
        "mesh": dict(mesh.shape),
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(dt * 1e3, 3),
        # real (unpadded) edges x layers, same convention as bench.py.
        # NB convention changed in round 4: round-3 logs of this probe
        # (docs/PERF.md) reported padded-edges/step (no num_layers
        # factor), so cross-round comparisons of this field need the
        # marker below (ADVICE r4).
        "edges_convention": "num_layers*real_edges/step (round-4+)",
        "edges_per_s": round(cfg.num_layers * e_real / dt),
        "loss_first": round(loss0, 4),
        "loss_last": round(lossN, 4),
        "loss_decreased": lossN < loss0,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
