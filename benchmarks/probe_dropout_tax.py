"""Attribute the attention-dropout cost of the v5 train step.

probe_v6_insitu measured dropout 0.6 costing +0.22 ms/step on the Cora
v5 path (0.542 -> 0.766 ms). Candidates, timed here as isolated scanned
jits at Cora scale (E=13.8k padded, nh=8, N=2816, F=64, 2 layers'
worth where applicable):

  maskT   bernoulli (E, nh) -> .T -> pad   (what _pack_meta_v5 does)
  maskN   bernoulli (nh, E) -> pad         (orientation fix, no transpose)
  feat    feature-dropout masks x2 layers  (N, F) node-space
  bern    bare bernoulli (E, nh)           (threefry cost alone)

Each loop iteration folds the key so nothing hoists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

E, NH, N, F = 13824, 8, 2816, 64
INNER, ITERS = 200, 3


def timed(name, fn):
    x = jnp.float32(0.0)
    fn_j = jax.jit(fn)
    r = fn_j(x)
    float(np.asarray(r))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn_j(r)
    float(np.asarray(r))
    dt = (time.perf_counter() - t0) / (ITERS * INNER)
    print(json.dumps({"probe": name, "us": round(dt * 1e6, 2)}),
          flush=True)


def scan2(body):
    def outer(x):
        def step(c, _):
            return body(c), ()
        c, _ = jax.lax.scan(step, x, None, length=INNER)
        return c
    return outer


def main() -> None:
    keep = 0.4

    def mask_t(c):
        k = jax.random.key(0)
        k = jax.random.fold_in(k, c.astype(jnp.int32))
        m = jax.random.bernoulli(k, keep, (E, NH)).astype(jnp.float32)
        mt = m.T / keep                                   # (NH, E)
        packed = jnp.pad(mt, ((0, 0), (0, 512)))
        return c + packed[0, 0]

    def mask_n(c):
        k = jax.random.key(0)
        k = jax.random.fold_in(k, c.astype(jnp.int32))
        m = jax.random.bernoulli(k, keep, (NH, E)).astype(jnp.float32)
        packed = jnp.pad(m / keep, ((0, 0), (0, 512)))
        return c + packed[0, 0]

    def feat(c):
        k = jax.random.key(0)
        k = jax.random.fold_in(k, c.astype(jnp.int32))
        k1, k2 = jax.random.split(k)
        x1 = jnp.ones((N, 1433), jnp.float32) * c
        m1 = jax.random.bernoulli(k1, keep, x1.shape).astype(jnp.float32)
        x2 = jnp.ones((N, F), jnp.float32) * c
        m2 = jax.random.bernoulli(k2, keep, x2.shape).astype(jnp.float32)
        return c + (x1 * m1)[0, 0] + (x2 * m2)[0, 0]

    def bern(c):
        k = jax.random.key(0)
        k = jax.random.fold_in(k, c.astype(jnp.int32))
        m = jax.random.bernoulli(k, keep, (E, NH)).astype(jnp.float32)
        return c + m[0, 0]

    def rbg(k):
        kd = jax.random.key_data(k)
        return jax.random.wrap_key_data(jnp.tile(kd, 2), impl="rbg")

    def mask_t_rbg(c):
        k = jax.random.key(0)
        k = rbg(jax.random.fold_in(k, c.astype(jnp.int32)))
        m = jax.random.bernoulli(k, keep, (E, NH)).astype(jnp.float32)
        mt = m.T / keep
        packed = jnp.pad(mt, ((0, 0), (0, 512)))
        return c + packed[0, 0]

    def feat_rbg(c):
        k = jax.random.key(0)
        k = rbg(jax.random.fold_in(k, c.astype(jnp.int32)))
        k1, k2 = jax.random.split(k)
        x1 = jnp.ones((N, 1433), jnp.float32) * c
        m1 = jax.random.bernoulli(k1, keep, x1.shape).astype(jnp.float32)
        x2 = jnp.ones((N, F), jnp.float32) * c
        m2 = jax.random.bernoulli(k2, keep, x2.shape).astype(jnp.float32)
        return c + (x1 * m1)[0, 0] + (x2 * m2)[0, 0]

    for name, body in [("maskT", mask_t), ("maskN", mask_n),
                       ("feat", feat), ("bern", bern),
                       ("maskT_rbg", mask_t_rbg), ("feat_rbg", feat_rbg)]:
        timed(name, scan2(body))


if __name__ == "__main__":
    main()
