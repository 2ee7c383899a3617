"""Does Mosaic accept int8 one-hot MXU dots on this chip? (VERDICT r3
item 7: the banded one-hot construction is 33% of the step; an int8
one-hot path was the named-but-untried lever. bf16 is the current
contraction dtype.)

Tries, in separate jit programs so one failure doesn't mask another:
  s8 x s8   -> s32   (one-hot int8, values quantised int8)
  s8 x bf16 -> f32   (mixed-dtype: one-hot int8, values bf16)
Prints ok/exception per case — a compile REJECTION is the documented
dead end, a pass means the lever is real.

    python benchmarks/probe_int8_onehot.py
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make_kernel(oh_dt, val_dt, acc_dt):
        def kernel(ids_ref, vals_ref, out_ref):
            rows = jax.lax.broadcasted_iota(jnp.int32, (256, 512), 0)
            oh = (ids_ref[0:1, :] == rows.astype(jnp.float32)
                  ).astype(oh_dt)                       # (256, 512)
            out_ref[:] = jax.lax.dot_general(
                vals_ref[:].astype(val_dt), oh,
                (((0,), (0,)), ((), ())),
                preferred_element_type=acc_dt)          # (128, 512)
        return kernel

    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, 512)[None, :]
        .astype(np.float32))
    vals = jnp.asarray(
        np.random.default_rng(1).normal(size=(256, 128))
        .astype(np.float32))

    cases = [
        ("s8 x s8 -> s32", jnp.int8, jnp.int8, jnp.int32),
        ("s8(one-hot) x bf16(vals) -> f32", jnp.int8, jnp.bfloat16,
         jnp.float32),
        ("bf16 x bf16 -> f32 (control)", jnp.bfloat16, jnp.bfloat16,
         jnp.float32),
    ]
    for name, oh_dt, val_dt, acc_dt in cases:
        try:
            out = pl.pallas_call(
                make_kernel(oh_dt, val_dt, acc_dt),
                out_shape=jax.ShapeDtypeStruct((128, 512), acc_dt),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(ids, vals)
            s = float(jnp.sum(out.astype(jnp.float32)))
            print(f"[{name}] OK sum={s:.3f}", flush=True)
        except Exception as ex:
            print(f"[{name}] REJECTED: {type(ex).__name__}: "
                  f"{str(ex)[:300]}", flush=True)
            if os.environ.get("GAT_TPU_PROBE_TRACE"):
                traceback.print_exc()


if __name__ == "__main__":
    main()
