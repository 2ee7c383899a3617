"""On-chip parity check: v7 block-local-window path (auto) vs the v5
whole-fusion path on the banded workload — 3 compiled train steps from
identical init, losses compared per step. CPU tests pin v7 against the
dense oracle in interpret mode (tests/test_window_kernel.py); this
proves the Mosaic compile + execution on hardware agrees with the
hardware-proven v5 path (expected ~1e-7 rel: bf16 gather rounding only).

    python benchmarks/check_v7_parity.py            # on the TPU
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def losses_for(v6_mode: str, n_steps: int = 3):
    import jax

    from gat_pytorch_tpu.train import optim as O
    from gat_pytorch_tpu.train.trainer import TrainState, make_train_step
    from gat_pytorch_tpu.models.gat import init_gat_model

    os.environ["GAT_TPU_V6"] = v6_mode
    cfg, graph, task, lr, l2 = bench.banded_workload(
        num_nodes=100_000, avg_degree=10, features=64, band=1024)
    tx = O.adam_l2(lr, l2)
    rng = jax.random.key(0)
    params_rng, rng = jax.random.split(rng)
    params = init_gat_model(params_rng, cfg)
    state = TrainState(params=params, opt_state=tx.init(params), rng=rng,
                       step=jax.numpy.int32(0))
    step = make_train_step(cfg, task, tx, jit=False)

    @jax.jit
    def block(state, graph):
        def body(s, _):
            s, mets = step(s, graph)
            return s, mets["train_loss"]
        return jax.lax.scan(body, state, None, length=n_steps)

    _, losses = block(state, graph)
    return np.asarray(losses, np.float64)


def main() -> None:
    l_v5 = losses_for("0")
    l_v7 = losses_for("auto")
    rel = np.abs(l_v7 - l_v5) / np.maximum(np.abs(l_v5), 1e-30)
    print(json.dumps({
        "v5_losses": [round(float(x), 8) for x in l_v5],
        "v7_losses": [round(float(x), 8) for x in l_v7],
        "max_rel": float(rel.max()),
        "ok": bool(rel.max() < 1e-4),
    }), flush=True)


if __name__ == "__main__":
    main()
