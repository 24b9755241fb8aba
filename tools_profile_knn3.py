#!/usr/bin/env python
"""Stage attribution of knn_tiles at the tracking operating point,
measured IN-PROGRAM (jitted partial pipelines, RTT floor subtracted —
see tools_profile_knn2).  Where do the ~19 ms device time of a 25k-query
search on the 300k fine cloud go: bound pass / tile select / candidate
gather / exact distances / top-k?"""
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
    idx = jax.block_until_ready(K.build_tiles(jnp.asarray(pos), count))
    packed, tile_lo, tile_hi = idx
    tile = packed.shape[1] // 4
    T = tile_lo.shape[1]
    print("platform:", jax.devices()[0], " T:", T, " tile:", tile,
          flush=True)

    q25 = jnp.asarray(np.concatenate([
        rng.uniform(-3, 3, (25_000, 1)),
        rng.uniform(-3, 3, (25_000, 1)),
        rng.uniform(-3, -1, (25_000, 1))], 1).astype(np.float32))

    PROBE, QC, KK = 12, 4096, 8

    def chunks(q):
        Q = q.shape[0]
        return [q[i * QC:(i + 1) * QC] for i in range(-(-Q // QC))]

    def bound(qch):
        lb2 = 0.0
        for c in range(3):
            d = jnp.maximum(jnp.maximum(tile_lo[c][None] - qch[:, c:c + 1],
                                        qch[:, c:c + 1] - tile_hi[c][None]),
                            0.0)
            lb2 = lb2 + d * d
        return lb2

    def upto_bound(q):
        return [jnp.sum(bound(c)) for c in chunks(q)]

    def upto_select(q):
        from hpslam_tpu.ops.knn import _select_tiles
        return [jnp.sum(_select_tiles(bound(c), PROBE)) for c in chunks(q)]

    def upto_gather(q):
        from hpslam_tpu.ops.knn import _select_tiles
        outs = []
        for c in chunks(q):
            tsel = _select_tiles(bound(c), PROBE)
            crow = packed[tsel]
            outs.append(jnp.sum(crow))
        return outs

    def upto_d2(q):
        from hpslam_tpu.ops.knn import _select_tiles
        outs = []
        for ch in chunks(q):
            tsel = _select_tiles(bound(ch), PROBE)
            crow = packed[tsel]
            qc = ch.shape[0]
            d2 = 0.0
            for c in range(3):
                cpos = crow[:, :, c * tile:(c + 1) * tile].reshape(
                    qc, PROBE * tile)
                d2 = d2 + jnp.square(ch[:, c:c + 1] - cpos)
            outs.append(jnp.sum(d2))
        return outs

    def full(q):
        return K.knn_tiles(q, *idx, k=KK, probe=PROBE, q_chunk=QC)

    def full_with(q, topk_fn):
        outs = []
        from hpslam_tpu.ops.knn import _select_tiles
        for ch in chunks(q):
            tsel = _select_tiles(bound(ch), PROBE)
            crow = packed[tsel]
            qc = ch.shape[0]
            d2 = 0.0
            for c in range(3):
                cpos = crow[:, :, c * tile:(c + 1) * tile].reshape(
                    qc, PROBE * tile)
                d2 = d2 + jnp.square(ch[:, c:c + 1] - cpos)
            cidx = jax.lax.bitcast_convert_type(
                crow[:, :, 3 * tile:], jnp.int32).reshape(qc, PROBE * tile)
            Dk, sel = topk_fn(d2, KK)
            outs.append((Dk, jnp.take_along_axis(cidx, sel, axis=1)))
        return outs

    def t(tag, fn, reps=5):
        f = jax.jit(fn)
        jax.block_until_ready(f(q25))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f(q25))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{tag:40s} {dt:8.2f} ms", flush=True)
        return dt

    g = jax.jit(lambda a: a + 1)
    x = jnp.ones((8,))
    jax.block_until_ready(g(x))
    t0 = time.perf_counter()
    for _ in range(10):
        jax.block_until_ready(g(x))
    rtt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{'RTT floor':40s} {rtt:8.2f} ms", flush=True)

    t("bound pass only", upto_bound)
    t("+ tile select", upto_select)
    t("+ candidate gather", upto_gather)
    t("+ exact d2", upto_d2)
    t("full knn_tiles (+ topk)", full)
    # chunk-loop strategy A/B: knn_tiles' lax.map vs unrolled Python loop
    # (full_with unrolls) vs lax.scan with partial unroll, at the
    # single-sub-stage (25k) and batched (100k) operating points
    q100 = jnp.asarray(np.concatenate([
        rng.uniform(-3, 3, (100_000, 1)),
        rng.uniform(-3, 3, (100_000, 1)),
        rng.uniform(-3, -1, (100_000, 1))], 1).astype(np.float32))

    def scan_chunks(q, unroll):
        Q = q.shape[0]
        num_q = -(-Q // QC)
        qs_ = q.reshape(num_q, QC, 3)

        def body(carry, qch):
            D, I = one_full(qch)
            return carry, (D, I)

        def one_full(ch):
            from hpslam_tpu.ops.knn import _select_tiles
            tsel = _select_tiles(bound(ch), PROBE)
            crow = packed[tsel]
            qc = ch.shape[0]
            d2 = 0.0
            for c in range(3):
                cpos = crow[:, :, c * tile:(c + 1) * tile].reshape(
                    qc, PROBE * tile)
                d2 = d2 + jnp.square(ch[:, c:c + 1] - cpos)
            cidx = jax.lax.bitcast_convert_type(
                crow[:, :, 3 * tile:], jnp.int32).reshape(qc, PROBE * tile)
            Dk, sel = K.topk_extract(d2, KK)
            return Dk, jnp.take_along_axis(cidx, sel, axis=1)

        _, out = jax.lax.scan(body, 0, qs_, unroll=unroll)
        return out

    for _ in range(2):
        t("25k  lax.map (knn_tiles today)", full)
        t("25k  unrolled python loop",
          lambda q: full_with(q, K.topk_extract))
        t("25k  lax.scan unroll=4", lambda q: scan_chunks(q, 4))

    def t100(tag, fn, reps=3):
        f = jax.jit(fn)
        jax.block_until_ready(f(q100))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f(q100))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{tag:40s} {dt:8.2f} ms", flush=True)

    t100("100k lax.map (knn_tiles today)", full)
    t100("100k unrolled python loop",
         lambda q: full_with(q, K.topk_extract))
    t100("100k lax.scan unroll=4", lambda q: scan_chunks(q, 4))

    # ---- TPU-side recall vs a KDTree oracle (the CPU lowering of
    # approx_min_k differs, so test_knn.py's CPU recall does not prove
    # the TPU PartialReduce path)
    from scipy.spatial import cKDTree
    qs = np.asarray(q25[:2000])
    D, I = jax.block_until_ready(full(q25))
    Dn = np.sqrt(np.asarray(D[:2000]))
    d_ref, i_ref = cKDTree(pts).query(qs, k=KK)
    recall = np.mean(np.isclose(Dn, d_ref, atol=1e-4))
    recall1 = np.mean(np.isclose(Dn[:, 0], d_ref[:, 0], atol=1e-4))
    print(f"recall@k={KK} probe={PROBE}: {recall:.4f}  1-NN: {recall1:.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
