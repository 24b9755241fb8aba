"""Microbench of knn_tiles internals on the real TPU.

The tunnelled runtime's block_until_ready can no-op; every timed call is
forced with a scalar device->host fetch, and the bare fetch round-trip is
reported for mental subtraction.
"""
import os, time
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from hpslam_tpu.ops import knn as K
    rng = np.random.default_rng(0)
    CAP = 1 << 19; N = 300_000
    pts = np.full((CAP, 3), 777.0, np.float32)
    w = rng.integers(0, 3, N)
    u = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    u[np.arange(N), w] = np.sign(u[np.arange(N), w]) * 2.0
    pts[:N] = u
    idx = K.build_tiles(jnp.asarray(pts), jnp.int32(N))

    def force(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32) * 0 + 1))

    def bench(tag, f, *a, **kw):
        r = f(*a, **kw); force(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = f(*a, **kw)
            force(r)
        print(f"{tag:46s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
        return r

    x = jnp.ones((8, 8))
    bench("bare fetch round-trip", lambda: x)

    for Q in (25_000, 5_000):
        q = jnp.asarray(pts[rng.integers(0, N, Q)] + rng.normal(0, 0.05, (Q, 3)).astype(np.float32))
        bench(f"knn_tiles Q={Q} probe=16 tile=128 k=8", K.knn_tiles, q, *idx, k=8)
        bench(f"knn_tiles Q={Q} probe=8", K.knn_tiles, q, *idx, k=8, probe=8)
        bench(f"knn_tiles Q={Q} k=24", K.knn_tiles, q, *idx, k=24)
        bench(f"knn_tiles Q={Q} qchunk=Q", K.knn_tiles, q, *idx, k=8, q_chunk=Q)

    q = jnp.asarray(pts[rng.integers(0, N, 25_000)] + rng.normal(0, 0.05, (25_000, 3)).astype(np.float32))
    packed, tlo, thi = idx  # packed tile rows (see knn.build_tiles)
    tile = packed.shape[1] // 4
    @jax.jit
    def lb_only(q):
        lb2 = 0.0
        for c in range(3):
            d = jnp.maximum(jnp.maximum(tlo[c][None] - q[:, c:c+1], q[:, c:c+1] - thi[c][None]), 0.0)
            lb2 = lb2 + d * d
        _, tsel = jax.lax.approx_min_k(lb2, 16, recall_target=0.99)
        return tsel
    tsel = bench("  lb2+approx_min_k (25k x 4096)", lb_only, q)
    @jax.jit
    def gather_only(tsel):
        crow = packed[tsel]  # one packed row gather per probed tile
        return [crow[:, :, c * tile:(c + 1) * tile].reshape(
            tsel.shape[0], -1) for c in range(3)]
    cpos = bench("  tile gather (25k x 16 x 128 packed)", gather_only, tsel)
    @jax.jit
    def d2_sel(q, cpos):
        d2 = 0.0
        for c in range(3):
            d2 = d2 + jnp.square(q[:, c:c+1] - cpos[c])
        return jax.lax.approx_min_k(d2, 8, recall_target=0.99, aggregate_to_topk=True)
    bench("  d2 + approx_min_k (25k x 2048)", d2_sel, q, cpos)

main()

def ray_bench():
    import jax
    import jax.numpy as jnp
    from hpslam_tpu.ops import knn as K
    import numpy as np, time
    rng = np.random.default_rng(0)
    CAP = 1 << 19; N = 300_000
    pts = np.full((CAP, 3), 777.0, np.float32)
    w = rng.integers(0, 3, N)
    u = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    u[np.arange(N), w] = np.sign(u[np.arange(N), w]) * 2.0
    pts[:N] = u
    idx = K.build_tiles(jnp.asarray(pts), jnp.int32(N))
    R, S = 5000, 5
    tgt = pts[rng.integers(0, N, R)]
    o = np.zeros((R, 3), np.float32)
    d = tgt.astype(np.float32)
    z = np.linspace(0.96, 1.04, S, dtype=np.float32)[None, :].repeat(R, 0)
    oj, dj, zj = jnp.asarray(o), jnp.asarray(d), jnp.asarray(z)
    p = jnp.asarray((o[:,None,:] + d[:,None,:]*z[...,None]).reshape(-1,3))
    def force(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)*0+1))
    def bench(tag, f, *a, **kw):
        r = f(*a, **kw); force(r)
        t0 = time.perf_counter()
        for _ in range(10):
            force(f(*a, **kw))
        print(f"{tag:46s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
    bench("per-sample knn_tiles 25k", K.knn_tiles, p, *idx, k=8)
    # knn_ray rows removed with the op (round-5 prune; measured 89 vs 63
    # ms at recall-parity probe=32 — see ops/knn.py note)
    # mid level too
    CAPm = 1 << 17; Nm = 60_000
    ptsm = np.full((CAPm, 3), 777.0, np.float32); ptsm[:Nm] = u[:Nm]
    idxm = K.build_tiles(jnp.asarray(ptsm), jnp.int32(Nm))
    bench("per-sample knn_tiles 25k (mid)", K.knn_tiles, p, *idxm, k=8)

ray_bench()

def selection_ab():
    import jax, time
    import jax.numpy as jnp
    from hpslam_tpu.ops import knn as K
    import numpy as np
    rng = np.random.default_rng(1)
    lb2 = jnp.asarray(rng.uniform(0, 4, (4096, 4096)).astype(np.float32))
    d2 = jnp.asarray(rng.uniform(0, 4, (4096, 2048)).astype(np.float32))
    def force(r):
        leaf = jax.tree.leaves(r)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)*0+1))
    def bench(tag, f, *a):
        force(f(*a))
        t0 = time.perf_counter()
        for _ in range(20):
            force(f(*a))
        print(f"{tag:46s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms")
    bench("approx_min_k probe=12 (4096x4096)",
          jax.jit(lambda x: jax.lax.approx_min_k(x, 12, recall_target=0.99)), lb2)
    bench("topk_extract 12 (4096x4096)",
          jax.jit(lambda x: K.topk_extract(x, 12)), lb2)
    bench("approx_min_k agg k=8 (4096x2048)",
          jax.jit(lambda x: jax.lax.approx_min_k(x, 8, recall_target=0.99, aggregate_to_topk=True)), d2)
    bench("topk_extract 8 (4096x2048)",
          jax.jit(lambda x: K.topk_extract(x, 8)), d2)
    bench("bare fetch", jax.jit(lambda x: x[:8, :8]), d2)

selection_ab()
