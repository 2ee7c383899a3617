"""XLA prep-variant timings: which gather formulation feeds the fused
kernel cheapest? (docs/PERF.md bisection: prep dominates the composite.)

Variants over (N=100k, E=1M, NHF=128):
  rowmajor:  h_src = take(h8, senders, axis=0)          (E, NHF8)
  edgemajor: h_src_t = take(h_t8, senders, axis=1)      (NHF8, E) direct
  rm_t:      take axis=0 then transpose                 (current shape)
  ht_cost:   h8.T alone (the N-sized transpose edgemajor needs)

    python benchmarks/probe_xla_prep.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    n, e, nhf8 = 100_000, 1_000_000, 128
    e_pad = e + 2048
    rng = np.random.default_rng(0)
    h8 = jnp.asarray(rng.normal(size=(n, nhf8)).astype(np.float32))
    senders = jnp.asarray(
        np.concatenate([rng.integers(0, n, e),
                        np.full(e_pad - e, n - 1)]).astype(np.int32))

    def bench(name, fn, *args, iters=30):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        # small host transfer forces real completion through the tunnel
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        return dt

    print("backend:", jax.default_backend(), flush=True)
    bench("rowmajor take(h,s,0)            ",
          lambda h, s: jnp.sum(jnp.take(h, s, axis=0), axis=1), h8, senders)
    bench("rm+T    take(h,s,0).T           ",
          lambda h, s: jnp.sum(jnp.take(h, s, axis=0).T, axis=0),
          h8, senders)
    h_t8 = jnp.asarray(np.asarray(h8).T.copy())
    bench("edgemaj take(hT,s,1)            ",
          lambda ht, s: jnp.sum(jnp.take(ht, s, axis=1), axis=0),
          h_t8, senders)
    bench("ht_cost h.T alone               ",
          lambda h: jnp.sum(h.T, axis=0), h8)
    bench("edgemaj+ht  take(h.T,s,1) fused ",
          lambda h, s: jnp.sum(jnp.take(h.T, s, axis=1), axis=0),
          h8, senders)
    # the sum() above may let XLA avoid materialising; re-run returning
    # the full array but summing on device right after (forces material)
    bench("rowmajor materialised           ",
          lambda h, s: jnp.take(h, s, axis=0) * 1.0, h8, senders)
    bench("edgemaj materialised            ",
          lambda ht, s: jnp.take(ht, s, axis=1) * 1.0, h_t8, senders)


if __name__ == "__main__":
    main()
