#!/usr/bin/env python
"""knn_tiles batching comparison at the tracking operating point, measured
IN-PROGRAM (one jit per variant, one device sync per measurement) so the
~27 ms tunnel dispatch RTT does not pollute the per-search attribution the
way standalone calls do (see build_tiles docstring).

Variants: 4 chained 25k searches (per-sub-stage behaviour) vs ONE 100k
search (the removed batched_substage_search knob) at q_chunk 4096/8192, on the 300k-point
fine cloud (cap 2^19, tile=128, T=4096, probe=12, k=8)."""
import os
import sys
import time

import numpy as np

N_FINE, CAP_FINE = 300_000, 1 << 19


def main():
    import jax
    cache_dir = os.environ.get("HPSLAM_JAX_CACHE",
                               os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    _ = float(jnp.sum(jnp.ones((4,))))
    from hpslam_tpu.ops import knn as K

    rng = np.random.default_rng(0)
    pos = np.zeros((CAP_FINE, 3), np.float32)
    pts = rng.uniform(-3, 3, (N_FINE, 3)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, -1, N_FINE)
    pos[:N_FINE] = pts
    count = jnp.int32(N_FINE)
    pos_j = jnp.asarray(pos)
    idx = jax.block_until_ready(K.build_tiles(pos_j, count))
    print("platform:", jax.devices()[0], " T:", idx[2].shape[1],
          " tile:", idx[0].shape[1] // 4, flush=True)

    def t(tag, fn, reps=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{tag:52s} {dt:8.2f} ms", flush=True)
        return dt

    q100 = jnp.asarray(np.concatenate([
        rng.uniform(-3, 3, (100_000, 1)),
        rng.uniform(-3, 3, (100_000, 1)),
        rng.uniform(-3, -1, (100_000, 1))], 1).astype(np.float32))

    def four_searches(q, qc):
        outs = []
        for s in range(4):
            D, I = K.knn_tiles(q[s * 25_000:(s + 1) * 25_000], *idx,
                               k=8, probe=12, q_chunk=qc)
            outs.append((D, I))
        return outs

    def one_search(q, qc):
        return K.knn_tiles(q, *idx, k=8, probe=12, q_chunk=qc)

    for qc in (4096, 8192):
        f4 = jax.jit(lambda q, qc=qc: four_searches(q, qc))
        f1 = jax.jit(lambda q, qc=qc: one_search(q, qc))
        t(f"4x25k chained  q_chunk={qc}",
          lambda f=f4: jax.block_until_ready(f(q100)))
        t(f"1x100k batched q_chunk={qc}",
          lambda f=f1: jax.block_until_ready(f(q100)))

    # RTT floor for reference
    g = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,))
    jax.block_until_ready(g(x))
    t("RTT floor (tiny dispatch, synced)",
      lambda: jax.block_until_ready(g(x)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
