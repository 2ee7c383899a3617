"""On-chip parity check: merged 2-phase autocap forward vs the split
cap-kernel + forward path (GAT_TPU_V5_MERGED 1 vs 0), compiled on the
real TPU (no interpret mode). CPU tests cover both modes in interpret
mode against a jnp.max oracle (tests/test_pallas_kernel.py::
test_v5_autocap_matches_jnp_max_oracle); this proves the Mosaic
compile + execution of the merged kernel on hardware and that its
outputs/gradients match the already-hardware-proven split path.

    python benchmarks/check_v5_merged.py            # on the TPU
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(merged: str, inputs, meta):
    import jax
    import jax.numpy as jnp

    from gat_pytorch_tpu.ops.pallas import segment_attention as fsa

    os.environ["GAT_TPU_V5_MERGED"] = merged
    h, a_src, s_dst, drop, sd, rc, od, er = inputs
    n, nh, f, slope, with_dropout = meta

    def loss(hh, aa, ss, dd):
        o = fsa.fused_gat_table_autocap(
            hh, aa, ss, dd, sd, rc, od, er, None, n, nh, f, 1e-8, slope,
            256, 128, False)
        return jnp.sum(jnp.sin(o)), o

    an = (0, 1, 2) + ((3,) if with_dropout else ())
    fn = jax.jit(jax.value_and_grad(loss, argnums=an, has_aux=True))
    (lv, out), grads = fn(h, a_src, s_dst, drop)
    jax.block_until_ready(grads)
    return float(lv), np.asarray(out), [np.asarray(g) for g in grads]


def main() -> int:
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    results = []
    for nh, f, with_dropout in [(8, 8, False), (8, 8, True), (1, 7, False)]:
        n, e_real, pad = 2816, 13264, 48
        e = e_real + pad
        recv = np.concatenate([np.sort(rng.integers(0, n, e_real)),
                               np.full(pad, n - 1)]).astype(np.int32)
        send = np.concatenate([rng.integers(0, n, e_real),
                               np.full(pad, n - 1)]).astype(np.int32)
        order = np.argsort(send, kind="stable").astype(np.int32)
        h = jnp.asarray(rng.normal(size=(n, nh * f)).astype(np.float32))
        a_src = jnp.asarray((rng.normal(size=(nh * f, nh))
                             / np.sqrt(nh * f)).astype(np.float32))
        s_dst = jnp.asarray(rng.normal(size=(n, nh)).astype(np.float32))
        drop = (jnp.asarray((rng.random((e, nh)) > 0.4).astype(np.float32)
                            / 0.6) if with_dropout else None)
        inputs = (h, a_src, s_dst, drop, jnp.asarray(send),
                  jnp.asarray(recv), jnp.asarray(order), jnp.int32(e_real))
        meta = (n, nh, f, 0.01, with_dropout)

        l0, o0, g0 = run_mode("0", inputs, meta)
        l1, o1, g1 = run_mode("1", inputs, meta)
        np.testing.assert_allclose(o0, o1, rtol=1e-5, atol=1e-5)
        for a, b in zip(g0, g1):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
        results.append({"nh": nh, "f": f, "dropout": with_dropout,
                        "loss_split": l0, "loss_merged": l1, "ok": True})
        print(json.dumps(results[-1]), flush=True)
    print("MERGED PARITY OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
