#!/usr/bin/env python
"""Microbench: union-feature gradient scatter-add alternatives (the
~0.75 ms/iter XLA op in the fused mapping iteration).

Candidates, all mathematically identical accumulations of duf (n, u*Cw)
rows into a (U, Cw) table keyed by phase-constant uids (n, u):
  A. scatter-add          zeros(U).at[ids].add(rows)      (current)
  B. sorted segment_sum   rows[order] -> segment_sum(indices_are_sorted)
     (order/segment ids are phase constants, computed ONCE per phase)
  C. sorted scatter-add   rows[order] .at[sorted_ids].add (locality only)
Run on the real TPU.  Each candidate is timed inside a 30-iteration scan
with iteration-dependent inputs so loop-invariant hoisting can't fake it.
"""
import os
import time

import numpy as np


def main():
    import jax
    cache_dir = os.environ.get("HPSLAM_JAX_CACHE",
                               os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    _ = float(jnp.sum(jnp.ones((4,))))
    print("platform:", jax.devices()[0])

    n, u, Cw, U = 10_000, 8, 64, 32_768
    N_IT = 30
    rng = np.random.default_rng(0)
    uids = rng.integers(0, U, (n, u), dtype=np.int32)
    flat = uids.reshape(-1)
    order = np.argsort(flat, kind="stable").astype(np.int32)
    sid = flat[order]
    duf = rng.normal(0, 1, (n, u * Cw)).astype(np.float32)

    uids_j = jnp.asarray(flat)
    order_j = jnp.asarray(order)
    sid_j = jnp.asarray(sid)
    duf_j = jnp.asarray(duf)

    def bench(tag, body):
        def step(acc, i):
            d = duf_j * (1.0 + 1e-6 * i)   # iteration-dependent
            out = body(d.reshape(n * u, Cw))
            return acc + out[0, 0], None

        @jax.jit
        def run():
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(N_IT, dtype=jnp.float32))
            return acc

        jax.block_until_ready(run())
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{tag:32s} {dt / N_IT:7.3f} ms/iter")

    bench("A scatter-add (current)",
          lambda rows: jnp.zeros((U, Cw), jnp.float32)
          .at[uids_j].add(rows))
    bench("B sorted segment_sum",
          lambda rows: jax.ops.segment_sum(rows[order_j], sid_j, U,
                                           indices_are_sorted=True))
    bench("C sorted scatter-add",
          lambda rows: jnp.zeros((U, Cw), jnp.float32)
          .at[sid_j].add(rows[order_j], indices_are_sorted=True,
                         unique_indices=False))


if __name__ == "__main__":
    main()
