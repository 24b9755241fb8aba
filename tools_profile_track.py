#!/usr/bin/env python
"""Attribution microbench for the tracking frame (track_frame cost).

Times track_frame variants + the standalone kNN searches to attribute the
~350 ms tracking frame at the ScanNet operating point.
"""
import os
import sys
import time

import numpy as np

H, W = 460, 620
FX, FY, CX, CY = 577.59, 578.73, 308.9, 232.68
N_FINE, N_MID = 300_000, 60_000
CAP_FINE, CAP_MID = 1 << 19, 1 << 17


def main():
    import jax
    cache_dir = os.environ.get("HPSLAM_JAX_CACHE",
                               os.path.expanduser("~/.hpslam_jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    _ = float(jnp.sum(jnp.ones((4,))))

    from hpslam_tpu.models import decoder as Dec
    from hpslam_tpu.ops import knn as K
    from hpslam_tpu.renderer import RenderConfig
    from hpslam_tpu.tracker import track_frame

    rng = np.random.default_rng(1219)
    mcfg = Dec.ModelConfig(encode_exposure=True, encode_rel_pos_in_col=False)
    rcfg = RenderConfig(near_end_surface=0.96, far_end_surface=1.04,
                        sample_near_pcl=False)
    params = Dec.init_nicer(jax.random.PRNGKey(0), mcfg)

    def level(n, cap):
        pos = np.zeros((cap, 3), np.float32)
        pts = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(-3, -1, n)
        pos[:n] = pts
        geo = rng.normal(0, 0.1, (cap, mcfg.c_dim)).astype(np.float32)
        col = rng.normal(0, 0.1, (cap, mcfg.c_dim)).astype(np.float32)
        return (jnp.asarray(pos), jnp.int32(n), jnp.asarray(geo),
                jnp.asarray(col))

    mid, fine = level(N_MID, CAP_MID), level(N_FINE, CAP_FINE)
    idx_mid = jax.block_until_ready(K.build_tiles(mid[0], mid[1]))
    idx_fine = jax.block_until_ready(K.build_tiles(fine[0], fine[1]))

    depth = rng.uniform(0.5, 4.0, (H, W)).astype(np.float32)
    color = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    pool = np.arange(H * W, dtype=np.int32)
    cam = np.array([1, 0, 0, 0, 0.1, 0.05, 0.2], np.float32)
    expo = np.zeros((8,), np.float32)

    color_j, depth_j = jnp.asarray(color), jnp.asarray(depth)
    rqm_j = jnp.asarray(np.full((H, W), 0.5, np.float32))
    rqf_j = jnp.asarray(np.full((H, W), 0.1, np.float32))
    pool_j = jnp.asarray(pool)

    def run(tag, pixels=5000, iters=100, resample=2, use_exposure=True,
            use_color=True, bf16=False, fused=False,
            dense=False, probe=16):
        mc = Dec.ModelConfig(encode_exposure=True,
                             encode_rel_pos_in_col=False, mm_bf16=bf16,
                             fused_mlp=fused)

        def go(key):
            out = track_frame(
                params, mc, rcfg, jnp.asarray(cam), key,
                color_j, depth_j, rqm_j, rqf_j,
                pool_j, jnp.int32(pool.size),
                mid[0], mid[1], mid[2], mid[3], idx_mid,
                fine[0], fine[1], fine[2], fine[3], idx_fine,
                jnp.asarray(expo),
                pixels=pixels, iters_mid=iters // 2,
                iters_fine=iters - iters // 2, W=W,
                fx=FX, fy=FY, cx=CX, cy=CY, cam_lr=5e-4, separate_lr=False,
                use_exposure=use_exposure, w_color=0.5, use_color=use_color,
                handle_dynamic=True, resample_stages=resample,
                dense_cache=dense,
                knn_probe=probe)
            jax.block_until_ready(out)

        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        go(keys[0])
        t0 = time.perf_counter()
        for r in range(3):
            go(keys[1 + r])
        dt = (time.perf_counter() - t0) / 3 * 1e3
        print(f"{tag:44s} {dt:8.2f} ms/frame")
        return dt

    def time_knn(tag, Q, index):
        q = jnp.asarray(rng.uniform(-3, 3, (Q, 3)).astype(np.float32))
        D, I = jax.block_until_ready(K.knn_tiles(q, *index, k=8))
        t0 = time.perf_counter()
        for _ in range(5):
            D, I = jax.block_until_ready(K.knn_tiles(q, *index, k=8))
        print(f"{tag:44s} {(time.perf_counter()-t0)/5*1e3:8.2f} ms")

    print("platform:", jax.devices()[0])
    variants = [
        ("prod (resample=2, 100it, 5000px)", {}),
        ("prod bf16", dict(bf16=True)),
        ("resample=1 bf16", dict(resample=1, bf16=True)),
        ("iters=50 bf16", dict(iters=50, bf16=True)),
        ("iters=2 resample=1 bf16 (fixed costs)", dict(iters=2, resample=1, bf16=True)),
        ("iters=2 resample=1 px=1000 bf16", dict(iters=2, resample=1, pixels=1000, bf16=True)),
        ("iters=2 resample=1 nocolor bf16", dict(iters=2, resample=1, use_color=False, bf16=True)),
        ("iters=102 r1 bf16", dict(iters=102, resample=1, bf16=True)),
        ("iters=102 r1 bf16 nocolor", dict(iters=102, resample=1, bf16=True, use_color=False)),
        ("iters=102 r1 bf16 noexpo", dict(iters=102, resample=1, bf16=True, use_exposure=False)),
        ("iters=102 r1 bf16 px=2500", dict(iters=102, resample=1, bf16=True, pixels=2500)),
        ("iters=2 r1 bf16 nocolor px=2500", dict(iters=2, resample=1, bf16=True, use_color=False, pixels=2500)),
        ("iters=2 r1 bf16 noexpo", dict(iters=2, resample=1, bf16=True, use_exposure=False)),
        ("prod fused (resample=2)", dict(fused=True)),
        ("iters=102 r1 fused", dict(iters=102, resample=1, fused=True)),
        ("iters=2 r1 fused", dict(iters=2, resample=1, fused=True)),
        ("i2r1 fused noexpo", dict(iters=2, resample=1, fused=True, use_exposure=False)),
        ("i2r1 fused px1000", dict(iters=2, resample=1, fused=True, pixels=1000)),
        ("i2r1 fused nocolor", dict(iters=2, resample=1, fused=True, use_color=False)),
        # (pool_factor rows removed with the knob, round-5 prune)
        ("pool1 r4", dict(resample=4)),
        # dense pre-gathered neighbour cache (tracking.dense_cache)
        ("dense i102r1", dict(iters=102, resample=1, dense=True)),
        ("dense i2r1 (fixed)", dict(iters=2, resample=1, dense=True)),
        ("dense r4 (prod default)", dict(resample=4, dense=True)),
        ("dense bf16 i102r1", dict(iters=102, resample=1, dense=True,
                                   bf16=True)),
        ("xdense pool1 r4", dict(resample=4)),
        ("dense+fused i102r1", dict(iters=102, resample=1, dense=True,
                                    fused=True)),
        ("dense nocolor i102r1", dict(iters=102, resample=1, dense=True,
                                      use_color=False)),
        ("dense px2500 i102r1", dict(iters=102, resample=1, dense=True,
                                     pixels=2500)),
        ("dense noexpo i102r1", dict(iters=102, resample=1, dense=True,
                                     use_exposure=False)),
        # bench-parity rows (probe=12 like configs/point_slam.yaml)
        ("bp dense r4 p12", dict(resample=4, dense=True, probe=12)),
        ("bp dense r4 p12 i8", dict(resample=4, dense=True, probe=12,
                                    iters=8)),
        ("bp old r4 p12", dict(resample=4, probe=12)),
        ("bp dense r1 p12", dict(resample=1, dense=True, probe=12)),
    ]
    only = sys.argv[1:] if len(sys.argv) > 1 else None
    for tag, kw in variants:
        if only and not any(o in tag for o in only):
            continue
        try:
            run(tag, **kw)
        except Exception as e:
            print(f"{tag:44s} FAILED: {type(e).__name__}: {str(e)[:100]}")
    time_knn("knn_tiles fine 25k queries", 25_000, idx_fine)
    time_knn("knn_tiles mid 25k queries", 25_000, idx_mid)


if __name__ == "__main__":
    main()
