"""On-chip op-level profile of the Cora train step / grad.

Traces a scanned block with jax.profiler, then parses the emitted
trace.json.gz and prints per-op total device time (TPU pid), aggregated
over the scan, sorted descending — locating the small-op tail that
bench.py's step-level timing can't attribute (probe_tail round-3: the
Cora backward is ~28x the forward; this names the ops responsible).

    python benchmarks/profile_step.py [--stage grad|step|fwd] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="grad",
                    choices=["grad", "step", "fwd"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--scan", type=int, default=20)
    ap.add_argument("--logdir", default="/tmp/profile_step")
    ap.add_argument("--scale", action="store_true",
                    help="profile the 5M-edge scale workload instead")
    ap.add_argument("--banded", action="store_true",
                    help="profile the 5M-edge banded (v6) workload")
    args = ap.parse_args()

    import jax
    if os.environ.get("GAT_TPU_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["GAT_TPU_PLATFORM"])
    import jax.numpy as jnp

    from gat_pytorch_tpu.models import gat
    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.trainer import TrainState, make_train_step

    if args.scale:
        import bench
        cfg, graph, task, lr, l2 = bench.scale_workload()
    elif args.banded:
        import bench
        cfg, graph, task, lr, l2 = bench.banded_workload()
    else:
        import bench
        cfg, graph, task, lr, l2 = bench.cora_workload()
    tx = O.adam_l2(lr, l2)
    params = gat.init_gat_model(jax.random.key(0), cfg)
    state = TrainState(params=params, opt_state=tx.init(params),
                       rng=jax.random.key(1), step=jnp.int32(0))
    step_fn = make_train_step(cfg, task, tx, jit=False)

    def loss_fn(p):
        logits = gat.gat_model_apply(p, cfg, graph, training=False)
        return task.loss(logits, graph, "train")

    if args.stage == "step":
        def body(c, _):
            s, mets = step_fn(c, graph)
            return s, mets["train_loss"]
        carry0 = state
    elif args.stage == "grad":
        def body(c, _):
            p, acc = c
            l, g = jax.value_and_grad(loss_fn)(p)
            p = jax.tree_util.tree_map(lambda a, b: a + 0.0 * b * l, p, g)
            return (p, acc + l), l
        carry0 = (params, jnp.float32(0))
    else:
        def body(c, _):
            p, acc = c
            return (p, acc + loss_fn(p)), acc
        carry0 = (params, jnp.float32(0))

    @jax.jit
    def block(c):
        c, losses = jax.lax.scan(body, c, None, length=args.scan)
        return c, losses

    c, losses = block(carry0)
    jax.block_until_ready(c)
    float(np.asarray(losses)[-1])

    with jax.profiler.trace(args.logdir):
        c, losses = block(carry0)
        float(np.asarray(losses)[-1])

    paths = sorted(glob.glob(
        os.path.join(args.logdir, "plugins/profile/*/*.trace.json.gz")))
    tr_path = paths[-1]
    with gzip.open(tr_path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"]["name"]}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in tpu_pids:
            name = e["name"]
            agg[name] += e.get("dur", 0.0)
            cnt[name] += 1
            total += e.get("dur", 0.0)
    print(json.dumps({"trace": tr_path, "device_total_us": round(total, 1),
                      "us_per_step": round(total / args.scan, 1)}))
    for name, us in agg.most_common(args.top):
        print(json.dumps({"op": name[:110], "total_us": round(us, 1),
                          "us_per_step": round(us / args.scan, 2),
                          "count": cnt[name]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
