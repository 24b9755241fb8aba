#!/usr/bin/env python
"""Isolated op timings for the mapping iteration's suspected hot spots."""
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.environ.get("HPSLAM_JAX_CACHE",
                               os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    _ = float(jnp.sum(jnp.ones((4,))))
    rng = np.random.default_rng(0)

    U, C = 131072, 32
    n, u, S = 10000, 16, 5
    idx = jnp.asarray(rng.integers(0, U, n * u).astype(np.int32))
    upd = jnp.asarray(rng.normal(0, 1, (n * u, C)).astype(np.float32))
    feats = jnp.asarray(rng.normal(0, 1, (U, C)).astype(np.float32))
    uids = idx.reshape(n, u)
    Wm = jnp.asarray(rng.normal(0, 1, (n, S, u)).astype(np.float32))

    def t(tag, fn, *a):
        f = jax.jit(fn)
        r = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(20):
            r = jax.block_until_ready(f(*a))
        print(f"{tag:46s} {(time.perf_counter()-t0)/20*1e3:8.3f} ms")
        return r

    # 1. plain scatter-add
    t("scatter-add 160k rows -> (131072, 32)",
      lambda i, v: jnp.zeros((U, C), v.dtype).at[i].add(v), idx, upd)

    # 2. sort + segment_sum
    def sort_seg(i, v):
        order = jnp.argsort(i)
        return jax.ops.segment_sum(v[order], i[order], num_segments=U)
    t("argsort+gather+segment_sum same shapes", sort_seg, idx, upd)

    # 3. union gather forward
    t("union_gather fwd einsum (10000,5,16)x(.,16,32)",
      lambda f, ui, w: jnp.einsum("nsu,nuc->nsc", w, f[ui]), feats, uids, Wm)

    # 4. union gather bwd dRows einsum + scatter
    dC = jnp.asarray(rng.normal(0, 1, (n, S, C)).astype(np.float32))
    def bwd(f, ui, w, d):
        dRows = jnp.einsum("nsu,nsc->nuc", w, d)
        return jnp.zeros((U, C)).at[ui.reshape(-1)].add(
            dRows.reshape(-1, C))
    t("union bwd einsum+scatter", bwd, feats, uids, Wm, dC)

    # 5. dense Adam over 2x(131072, 32)
    m = jnp.zeros((U, C)); v = jnp.zeros((U, C)); g = upd[:U]
    def adam(p, m, v, g):
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return p - 0.01 * m / (jnp.sqrt(v) + 1e-8), m, v
    t("dense Adam one (131072,32) param", adam, feats, m, v, g)

    # 6. color MLP fwd 50000 pts (width 128, 5 layers)
    x = jnp.asarray(rng.normal(0, 1, (50000, 40)).astype(np.float32))
    Ws = [jnp.asarray(rng.normal(0, 0.1, (40 if i == 0 else 128, 128)
                                 ).astype(np.float32)) for i in range(5)]
    def mlp(x, *Ws):
        h = x
        for W in Ws:
            h = jax.nn.softplus(h @ W)
        return h
    t("5-layer width-128 MLP fwd 50k pts f32", mlp, x, *Ws)

    def mlp16(x, *Ws):
        h = x.astype(jnp.bfloat16)
        for W in Ws:
            h = jax.nn.softplus(h @ W.astype(jnp.bfloat16)
                                ).astype(jnp.bfloat16)
        return h
    t("5-layer width-128 MLP fwd 50k pts bf16", mlp16, x, *Ws)

    # 7. MLP value_and_grad wrt weights
    def loss(Ws, x):
        h = x
        for W in Ws:
            h = jax.nn.softplus(h @ W)
        return jnp.sum(h)
    t("MLP fwd+bwd (dW) 50k pts", lambda x, *Ws:
      jax.grad(lambda W: loss(W, x))(list(Ws)), x, *Ws)

    # 8. random row gather (160k rows of 32)
    t("row gather 160k x (., 32)", lambda f, i: f[i], feats, idx)

    # 9. scatter into smaller table
    idx2 = jnp.asarray(rng.integers(0, 32768, n * u).astype(np.int32))
    t("scatter-add 160k rows -> (32768, 32)",
      lambda i, v: jnp.zeros((32768, C), v.dtype).at[i].add(v), idx2, upd)

    # 10. 160k scalar scatter (indices only)
    t("scatter-add 160k scalars -> (131072,)",
      lambda i: jnp.zeros((U,)).at[i].add(1.0), idx)


if __name__ == "__main__":
    main()
